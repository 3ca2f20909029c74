"""SpecAugment on device (train-only augmentation).

Replaces SpeechBrain's ``lobes.augment.SpecAugment`` with the reference
configuration (``transformer_multitask.yaml:283-293``, applied TRAIN-only at
``train_multitask.py:64-66``): time-warp (window 5), 2 frequency masks of
width ≤30, 2 time masks of width ≤40, masked regions replaced with the
utterance mean (``replace_with_zero: False``).

TPU-native notes:
* fully functional — takes an explicit PRNG key, vmapped over the batch, and
  compiles to static shapes (mask bounds are data, not shapes);
* time-warp is a piecewise-linear time re-index with linear interpolation
  (a gather — XLA-friendly) rather than the reference's bicubic
  ``torch.interpolate``; the warp distortion distribution is the same
  (center c ∈ [window, T-window), shift w ∈ [-window, window]). Augmentation
  equivalence, not bitwise parity — documented deviation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["SpecAugment", "spec_augment"]


def _time_warp(feats, key, window: int):
    """Piecewise-linear warp along time. feats: (T, D)."""
    T = feats.shape[0]
    if T <= 2 * window + 1:
        return feats
    kc, kw = jax.random.split(key)
    c = jax.random.randint(kc, (), window, T - window)  # warp center
    w = jax.random.randint(kw, (), -window, window + 1)  # shift
    c_f = c.astype(jnp.float32)
    w_f = w.astype(jnp.float32)
    t = jnp.arange(T, dtype=jnp.float32)
    # map output position t to source position: [0, c+w] <- [0, c],
    # [c+w, T-1] <- [c, T-1]
    left = t * c_f / jnp.maximum(c_f + w_f, 1.0)
    right = c_f + (t - (c_f + w_f)) * (T - 1 - c_f) / jnp.maximum(
        T - 1 - (c_f + w_f), 1.0
    )
    src = jnp.where(t <= c_f + w_f, left, right)
    src = jnp.clip(src, 0.0, T - 1.0)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    frac = (src - lo.astype(jnp.float32))[:, None]
    return feats[lo] * (1.0 - frac) + feats[hi] * frac


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
        "time_warp", "time_warp_window", "freq_mask", "n_freq_mask",
        "freq_mask_width", "time_mask", "n_time_mask", "time_mask_width",
        "replace_with_zero",
    ),
)
def spec_augment(
    feats,
    key,
    time_warp: bool = True,
    time_warp_window: int = 5,
    freq_mask: bool = True,
    n_freq_mask: int = 2,
    freq_mask_width: int = 30,
    time_mask: bool = True,
    n_time_mask: int = 2,
    time_mask_width: int = 40,
    replace_with_zero: bool = False,
):
    """feats: (B, T, D); key: PRNG key. Returns augmented (B, T, D)."""

    def one(feat, k):
        k1, k2, k3 = jax.random.split(k, 3)
        if time_warp:
            feat = _time_warp(feat, k1, time_warp_window)
        fill = jnp.zeros(()) if replace_with_zero else jnp.mean(feat)
        if freq_mask:
            feat = _axis_mask(feat, k2, n_freq_mask, freq_mask_width, 1, fill)
        if time_mask:
            feat = _axis_mask(feat, k3, n_time_mask, time_mask_width, 0, fill)
        return feat

    keys = jax.random.split(key, feats.shape[0])
    return jax.vmap(one)(feats, keys)


class SpecAugment:
    """YAML-facing wrapper holding the reference's option surface."""

    def __init__(
        self,
        time_warp: bool = True,
        time_warp_window: int = 5,
        time_warp_mode: str = "bicubic",  # accepted; interpolation is linear
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
