"""SpecAugment on device (train-only augmentation).

Replaces SpeechBrain's ``lobes.augment.SpecAugment`` with the reference
configuration (``transformer_multitask.yaml:283-293``, applied TRAIN-only at
``train_multitask.py:64-66``): time-warp (window 5, bicubic), 2 frequency
masks of width <=30, 2 time masks of width <=40, masked regions replaced
with the batch mean (``replace_with_zero: False``).

TPU-native notes:
* fully functional — takes an explicit PRNG key and compiles to static
  shapes (warp target and mask bounds are data, not shapes);
* time-warp matches the reference semantics: ONE (center, target) pair is
  sampled per batch, the left/right segments are resampled with
  ``align_corners=True`` interpolation in the requested ``time_warp_mode``
  (``bicubic`` reproduces torch's 4-tap Keys cubic kernel, A=-0.75, with
  per-segment border clamping — parity-tested against
  ``torch.nn.functional.interpolate``); implemented as a static-shape
  piecewise gather so the data-dependent warp point never changes shapes;
* masks are sampled per utterance (a strict superset of the reference's
  per-item masks); the fill value for ``replace_with_zero=False`` is the
  batch mean, as in the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["SpecAugment", "spec_augment"]

_CUBIC_A = -0.75  # torch's bicubic convolution constant


def _cubic_weights(frac):
    """Keys cubic-convolution weights for taps at offsets (-1, 0, 1, 2).

    Matches torch's ``get_cubic_upsample_coefficients`` (A = -0.75), so a
    gather with these weights reproduces ``F.interpolate(mode='bicubic')``
    along one axis exactly.
    """
    a = _CUBIC_A

    def cc1(x):  # |x| <= 1
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

    def cc2(x):  # 1 < |x| < 2
        return ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a

    x1 = frac
    x2 = 1.0 - frac
    return jnp.stack([cc2(x1 + 1.0), cc1(x1), cc1(x2), cc2(x2 + 1.0)], axis=-1)


def _linear_weights(frac):
    """2-tap linear weights padded to the 4-tap layout (taps -1..2)."""
    zero = jnp.zeros_like(frac)
    return jnp.stack([zero, 1.0 - frac, frac, zero], axis=-1)


def _time_warp(feats, key, window: int, mode: str):
    """Reference-semantics time warp over a whole batch. feats: (B, T, D).

    Mirrors SpeechBrain's ``SpecAugment.time_warp``: sample center
    ``c ~ U[window, T-window)`` and target ``w ~ U[c-window, c+window) + 1``,
    then resize ``feats[:, :c]`` to length ``w`` and ``feats[:, c:]`` to
    ``T - w`` with align_corners=True interpolation. Here both segments are
    produced by one static-shape piecewise gather: every output frame t
    resolves to a source position inside its own segment, taps clamped to
    the segment borders (torch clamps per resized tensor).
    """
    T = feats.shape[1]
    if T - window <= window:
        return feats
    kc, ks = jax.random.split(key)
    c = jax.random.randint(kc, (), window, T - window)
    # w = randint(c - window, c + window) + 1  ==  c + s, s in [-window+1, window]
    s = jax.random.randint(ks, (), -window, window) + 1
    return _warp_to(feats, c, c + s, mode)


def _warp_to(feats, c, w, mode: str):
    """Deterministic core of the warp: resize [:c]->w and [c:]->T-w."""
    T = feats.shape[1]
    c_f = c.astype(jnp.float32)
    w_f = w.astype(jnp.float32)
    t = jnp.arange(T, dtype=jnp.float32)
    in_left = t < w_f

    # align_corners=True source mapping per segment; out_len==1 -> src 0
    def seg_src(coord, out_len, in_len):
        scale = jnp.where(out_len > 1.0,
                          (in_len - 1.0) / jnp.maximum(out_len - 1.0, 1.0),
                          0.0)
        return coord * scale

    src_l = seg_src(t, w_f, c_f)
    src_r = seg_src(t - w_f, T - w_f, T - c_f)
    src = jnp.where(in_left, src_l, src_r)

    base = jnp.floor(src)
    frac = src - base
    taps = base[:, None] + jnp.arange(-1.0, 3.0)  # (T, 4)
    # clamp taps to the borders of their own segment, then shift the right
    # segment into absolute coordinates
    lo = jnp.where(in_left, 0.0, 0.0)[:, None]
    hi = jnp.where(in_left, c_f - 1.0, T - c_f - 1.0)[:, None]
    off = jnp.where(in_left, 0.0, c_f)[:, None]
    idx = (jnp.clip(taps, lo, hi) + off).astype(jnp.int32)  # (T, 4)

    if mode == "bicubic":
        wts = _cubic_weights(frac)  # (T, 4)
    else:  # 'bilinear' / 'linear' / 'nearest' fall back to linear taps
        wts = _linear_weights(frac)

    gathered = jnp.take(feats.astype(jnp.float32), idx, axis=1)  # (B,T,4,D)
    out = jnp.einsum("btkd,tk->btd", gathered, wts)
    return out.astype(feats.dtype)


def _axis_mask(feats, key, n_masks: int, max_width: int, axis: int,
               replace_value):
    """Apply n_masks random masks along `axis` (0=time, 1=freq) of (T, D)."""
    size = feats.shape[axis]
    idx = jnp.arange(size)
    for i in range(n_masks):
        key, kw, ks = jax.random.split(key, 3)
        width = jax.random.randint(kw, (), 0, max_width)
        start = jax.random.randint(ks, (), 0, jnp.maximum(size - width, 1))
        mask = (idx >= start) & (idx < start + width)
        shape = [1, 1]
        shape[axis] = size
        feats = jnp.where(mask.reshape(shape), replace_value, feats)
    return feats


@functools.partial(
    jax.jit,
    static_argnames=(
        "time_warp", "time_warp_window", "time_warp_mode", "freq_mask",
        "n_freq_mask", "freq_mask_width", "time_mask", "n_time_mask",
        "time_mask_width", "replace_with_zero",
    ),
)
def spec_augment(
    feats,
    key,
    time_warp: bool = True,
    time_warp_window: int = 5,
    time_warp_mode: str = "bicubic",
    freq_mask: bool = True,
    n_freq_mask: int = 2,
    freq_mask_width: int = 30,
    time_mask: bool = True,
    n_time_mask: int = 2,
    time_mask_width: int = 40,
    replace_with_zero: bool = False,
):
    """feats: (B, T, D); key: PRNG key. Returns augmented (B, T, D)."""
    k_warp, k_mask = jax.random.split(key)
    if time_warp:
        feats = _time_warp(feats, k_warp, time_warp_window, time_warp_mode)
    # reference fill: the mean over the whole (already warped) batch
    fill = jnp.zeros(()) if replace_with_zero else jnp.mean(feats)

    def one(feat, k):
        k2, k3 = jax.random.split(k)
        if freq_mask:
            feat = _axis_mask(feat, k2, n_freq_mask, freq_mask_width, 1, fill)
        if time_mask:
            feat = _axis_mask(feat, k3, n_time_mask, time_mask_width, 0, fill)
        return feat

    keys = jax.random.split(k_mask, feats.shape[0])
    return jax.vmap(one)(feats, keys)


class SpecAugment:
    """YAML-facing wrapper holding the reference's option surface."""

    def __init__(
        self,
        time_warp: bool = True,
        time_warp_window: int = 5,
        time_warp_mode: str = "bicubic",
        freq_mask: bool = True,
        n_freq_mask: int = 2,
        time_mask: bool = True,
        n_time_mask: int = 2,
        replace_with_zero: bool = False,
        freq_mask_width: int = 30,
        time_mask_width: int = 40,
        **unused,
    ):
        self.opts = dict(
            time_warp=bool(time_warp),
            time_warp_window=int(time_warp_window),
            time_warp_mode=str(time_warp_mode),
            freq_mask=bool(freq_mask),
            n_freq_mask=int(n_freq_mask),
            freq_mask_width=int(freq_mask_width),
            time_mask=bool(time_mask),
            n_time_mask=int(n_time_mask),
            time_mask_width=int(time_mask_width),
            replace_with_zero=bool(replace_with_zero),
        )

    def __call__(self, feats, key=None):
        if key is None:  # stateless fallback for ad-hoc use
            from stac_st_tpu.utils.seeding import root_key

            key = root_key()
        return spec_augment(feats, key, **self.opts)
