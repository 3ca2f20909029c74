"""Pallas TPU kernel: flash attention for TRAINING (custom VJP + dropout).

Round-3 train-step bisect (docs/PERF.md): at the reference's 480 audio-s
batch the small preset runs ~22% MFU; the forward alone is 16 ms against a
~3.3 ms matmul ideal, and the dominant residual is attention-score traffic
— the XLA path materializes fp32 (B, H, T, T) logits + bf16 softmax
weights in HBM every layer, forward AND backward (the backward additionally
reads the saved weights). This module removes that traffic end-to-end:

* forward: online-softmax tiles entirely in VMEM (as
  :mod:`.attention.flash_attention`), additionally emitting the per-row
  logsumexp ``L`` so the backward can regenerate probabilities;
* backward: two kernels (dQ over q-tiles; dK/dV over k-tiles) that
  RECOMPUTE score tiles from Q/K + ``L`` instead of reading saved weights
  — HBM traffic is O(T·Dh) instead of O(T²);
* dropout on the attention weights (the reference's
  ``attn_drop``) happens INSIDE the kernels: the mask for tile (qt, kt)
  is regenerated bit-identically in forward and backward by reseeding the
  per-core PRNG with (seed, bh, qt, kt), so nothing is stored. Masks are
  i.i.d. Bernoulli(1-p) with 1/(1-p) scaling — the same distribution as
  the XLA path (different random stream; training-equivalent, and
  bit-equality is asserted OFF the dropout path in tests/test_pallas.py).

Semantics (reference ``TransformerMultiTask.py`` attention, SpeechBrain
MultiheadAttention): softmax(scale·QKᵀ + bias) with additive key-padding
bias, dropout(p) on the weights, then ·V. Exactness vs the XLA einsum
formulation is tested at fp32 tolerance with dropout off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu is unavailable when only interpret mode will run
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = ["flash_attention_train"]

Q_TILE = 128
K_TILE = 128
NEG_INF = -1e9


def _dropout_mask(seed_ref, bh, qt, kt, p_drop: float, shape,
                  use_hw_prng: bool = False):
    """(q_tile, k_tile) keep-mask / (1-p), regenerated identically in
    forward and backward.

    Two equivalent sources of bits, both deterministic in
    (seed, bh, qt, kt) so forward and backward see the same mask:

    * hardware path (TPU): ``pltpu.prng_seed`` on the tile coordinates +
      ``prng_random_bits`` — near-free bits from the core PRNG;
    * counter path (interpret mode; also the spec the tests pin): a
      murmur3-finalizer hash of (seed, bh, qt, kt, row, col) in pure
      uint32 VPU arithmetic (``pltpu.prng_seed`` has no CPU lowering).
      Statistical quality is asserted in tests/test_pallas.py (rate,
      cross-tile decorrelation).
    """
    thresh_u = np.uint32(min(int(p_drop * 2.0 ** 32), 2 ** 32 - 1))
    u32 = jnp.uint32
    h = (seed_ref[0].astype(u32) * u32(0x9E3779B1)
         ^ (bh + 1).astype(u32) * u32(0x85EBCA6B)
         ^ (qt + 1).astype(u32) * u32(0xC2B2AE35)
         ^ (kt + 1).astype(u32) * u32(0x27D4EB2F))
    if use_hw_prng:
        # this toolchain's Mosaic rejects prng_seed with >2 operands, so
        # the tile coordinates are folded into ONE 32-bit seed first (the
        # same golden-ratio mix as the counter path) — still deterministic
        # in (seed, bh, qt, kt), which is all fwd/bwd equality needs
        pltpu.prng_seed(h.astype(jnp.int32))
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        keep = bits >= thresh_u
        return keep.astype(jnp.float32) / (1.0 - p_drop)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(u32)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(u32)
    x = h + row * u32(0x01000193) + col * u32(0x0000F1A7)
    # murmur3 fmix32 avalanche
    x = x ^ (x >> 16)
    x = x * u32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * u32(0xC2B2AE35)
    x = x ^ (x >> 16)
    keep = x >= thresh_u
    return keep.astype(jnp.float32) / (1.0 - p_drop)


def _lane_slice(ref, t, tile):
    """Lane-dim (last-axis) slice of a (1, 1, T) ref. Mosaic requires
    dynamic lane indices to be 128-aligned, so single-tile mode (tile ==
    whole axis, possibly only 8-aligned) must use a static full slice."""
    if tile == ref.shape[2]:
        return ref[0, 0, :]
    return ref[0, 0, pl.ds(t * tile, tile)]


# ---------------------------------------------------------------------------
# forward: online softmax, emits O and the per-row logsumexp L
# ---------------------------------------------------------------------------


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, l_ref, *,
                scale: float, p_drop: float, n_k_tiles: int,
                q_tile: int, k_tile: int, hw_prng: bool):
    # l_ref: (1, 1, Tq_p) whole-row block (TPU block-shape rule: the last
    # two dims must divide (8, 128) or equal the array dims); each q-tile
    # iteration writes its own lane slice.
    bh = pl.program_id(0)
    qt = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale

    def body(kt, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(kt * k_tile, k_tile), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kt * k_tile, k_tile), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s + _lane_slice(bias_ref, kt, k_tile)[None, :]

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=1, keepdims=True)
        if p_drop > 0.0:
            p = p * _dropout_mask(seed_ref, bh, qt, kt, p_drop, p.shape, hw_prng)
        acc = acc * corr + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((q_tile, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((q_tile, 1), jnp.float32)
    acc0 = jnp.zeros(q.shape, jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_k_tiles, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    # logsumexp per row; fully-masked rows get NEG_INF (exp underflows to 0
    # in backward, so their recomputed P is exactly 0)
    lse = jnp.where(
        l[:, 0] > 0.0, m[:, 0] + jnp.log(jnp.maximum(l[:, 0], 1e-30)),
        NEG_INF,
    )
    if q_tile == l_ref.shape[2]:
        l_ref[0, 0, :] = lse
    else:
        l_ref[0, 0, pl.ds(qt * q_tile, q_tile)] = lse


# ---------------------------------------------------------------------------
# backward kernel 1: dQ — grid (BH, q-tiles), loops K tiles
# ---------------------------------------------------------------------------


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, l_ref,
               delta_ref, dq_ref, *, scale: float, p_drop: float,
               n_k_tiles: int, q_tile: int, k_tile: int, hw_prng: bool):
    bh = pl.program_id(0)
    qt = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lrow = _lane_slice(l_ref, qt, q_tile)[:, None]       # logsumexp
    delta = _lane_slice(delta_ref, qt, q_tile)[:, None]  # rowsum(dO*O)

    def body(kt, dq_acc):
        k = k_ref[0, pl.ds(kt * k_tile, k_tile), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kt * k_tile, k_tile), :].astype(jnp.float32)
        s = scale * jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s + _lane_slice(bias_ref, kt, k_tile)[None, :]
        p = jnp.exp(s - lrow)                          # normalized probs
        dpd = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        if p_drop > 0.0:
            dpd = dpd * _dropout_mask(seed_ref, bh, qt, kt, p_drop, p.shape, hw_prng)
        ds = p * (dpd - delta)
        return dq_acc + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    dq0 = jnp.zeros(q.shape, jnp.float32)
    dq = jax.lax.fori_loop(0, n_k_tiles, body, dq0)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernel 2: dK/dV — grid (BH, k-tiles), loops Q tiles
# ---------------------------------------------------------------------------


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, l_ref,
                delta_ref, dk_ref, dv_ref, *, scale: float, p_drop: float,
                n_q_tiles: int, q_tile: int, k_tile: int, hw_prng: bool):
    bh = pl.program_id(0)
    kt = pl.program_id(1)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bias = bias_ref[0, 0][None, :]    # (1, K_TILE)

    def body(qt, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(qt * q_tile, q_tile), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qt * q_tile, q_tile), :].astype(jnp.float32)
        lrow = _lane_slice(l_ref, qt, q_tile)[:, None]
        delta = _lane_slice(delta_ref, qt, q_tile)[:, None]
        s = scale * jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s + bias
        p = jnp.exp(s - lrow)                          # (Q_TILE, K_TILE)
        dpd = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        if p_drop > 0.0:
            mask = _dropout_mask(seed_ref, bh, qt, kt, p_drop, p.shape, hw_prng)
            dv_acc = dv_acc + jnp.dot(
                (p * mask).T, do, preferred_element_type=jnp.float32)
            dpd = dpd * mask
        else:
            dv_acc = dv_acc + jnp.dot(
                p.T, do, preferred_element_type=jnp.float32)
        ds = p * (dpd - delta)
        dk_acc = dk_acc + jnp.dot(ds.T, q,
                                  preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_q_tiles, body, (dk0, dv0))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# host-side plumbing
# ---------------------------------------------------------------------------


#: single-tile cap: below this (padded) length the whole row is one tile —
#: one grid cell per (batch, head) with no inner dynamic-slice loop. The
#: 128-cell grids measured ~30% slower than XLA at S=374 from per-cell
#: overhead; whole-row cells amortize it.
TILE_CAP = 512


def _tiles(T):
    """(T_padded, tile): one whole-row tile when it fits, else 128-chunks."""
    t8 = -(-T // 8) * 8
    if t8 <= TILE_CAP:
        return t8, t8
    t128 = -(-T // 128) * 128
    return t128, 128


def _to_bh(x, B, H, T, Dh, pad_t):
    """(B, T, H, Dh) -> (B*H, T_pad, Dh_pad)."""
    x = jnp.swapaxes(x, 1, 2).reshape(B * H, T, Dh)
    return jnp.pad(x, ((0, 0), (0, pad_t), (0, (-Dh) % 128)))


def _from_bh(x, B, H, Tq, Dh):
    x = x[:, :Tq, :Dh].reshape(B, H, Tq, Dh)
    return jnp.swapaxes(x, 1, 2)


def _prep_bias(bias, B, H, Tk, Tk_p):
    """(B, Tk) additive or None -> (B*H, 1, Tk_p) with NEG_INF padding
    (padded key columns contribute exactly 0 after exp)."""
    if bias is None:
        bias_b = jnp.zeros((B, 1, Tk), jnp.float32)
    else:
        bias_b = bias.reshape(B, 1, Tk).astype(jnp.float32)
    bias_bh = jnp.repeat(bias_b, H, axis=0)
    return jnp.pad(bias_bh, ((0, 0), (0, 0), (0, Tk_p - Tk)),
                   constant_values=NEG_INF)


def _seed_spec():
    # scalar int32 seed in SMEM, shared by every grid cell
    if pltpu is None:
        return pl.BlockSpec((1,), lambda b, i: (0,))
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _fwd_impl(q, k, v, bias, seed, p_drop: float, interpret: bool):
    B, Tq, H, Dh = q.shape
    Tk = k.shape[1]
    scale = 1.0 / (Dh ** 0.5)
    Tq_p, q_tile = _tiles(Tq)
    Tk_p, k_tile = _tiles(Tk)

    qb = _to_bh(q, B, H, Tq, Dh, Tq_p - Tq)
    kb = _to_bh(k, B, H, Tk, Dh, Tk_p - Tk)
    vb = _to_bh(v, B, H, Tk, Dh, Tk_p - Tk)
    bias_bh = _prep_bias(bias, B, H, Tk, Tk_p)
    Dh_p = qb.shape[2]
    grid = (B * H, Tq_p // q_tile)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, p_drop=p_drop,
                          n_k_tiles=Tk_p // k_tile,
                          q_tile=q_tile, k_tile=k_tile,
                          hw_prng=not interpret),
        grid=grid,
        in_specs=[
            _seed_spec(),
            pl.BlockSpec((1, q_tile, Dh_p), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Tk_p, Dh_p), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Tk_p, Dh_p), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, Tk_p), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, q_tile, Dh_p), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, Tq_p), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Tq_p, Dh_p), q.dtype),
            jax.ShapeDtypeStruct((B * H, 1, Tq_p), jnp.float32),
        ],
        interpret=interpret,
    )(seed_arr, qb, kb, vb, bias_bh)
    return out, lse, (qb, kb, vb, bias_bh, seed_arr)


def _bwd_impl(res, g, p_drop: float, interpret: bool):
    (qb, kb, vb, bias_bh, seed_arr, out_b, lse) = res
    B, Tq, H, Dh = g.shape
    scale = 1.0 / (Dh ** 0.5)
    Tq_p, Dh_p = qb.shape[1], qb.shape[2]
    Tk_p = kb.shape[1]

    q_tile = Tq_p if Tq_p <= TILE_CAP else 128
    k_tile = Tk_p if Tk_p <= TILE_CAP else 128
    do_b = _to_bh(g.astype(jnp.float32), B, H, Tq, Dh, Tq_p - Tq)
    # delta = rowsum(dO * O): cheap O(T·Dh) XLA reduction
    delta = jnp.sum(do_b * out_b.astype(jnp.float32),
                    axis=-1)[:, None, :]  # (BH, 1, Tq_p)

    common_in = [
        _seed_spec(),
        pl.BlockSpec((1, q_tile, Dh_p), lambda b, i: (b, i, 0)),   # q tile
        pl.BlockSpec((1, Tk_p, Dh_p), lambda b, i: (b, 0, 0)),     # k whole
        pl.BlockSpec((1, Tk_p, Dh_p), lambda b, i: (b, 0, 0)),     # v whole
        pl.BlockSpec((1, 1, Tk_p), lambda b, i: (b, 0, 0)),        # bias
        pl.BlockSpec((1, q_tile, Dh_p), lambda b, i: (b, i, 0)),   # dO tile
        pl.BlockSpec((1, 1, Tq_p), lambda b, i: (b, 0, 0)),        # lse
        pl.BlockSpec((1, 1, Tq_p), lambda b, i: (b, 0, 0)),        # delta
    ]
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, p_drop=p_drop,
                          n_k_tiles=Tk_p // k_tile,
                          q_tile=q_tile, k_tile=k_tile,
                          hw_prng=not interpret),
        grid=(B * H, Tq_p // q_tile),
        in_specs=common_in,
        out_specs=pl.BlockSpec((1, q_tile, Dh_p), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tq_p, Dh_p), jnp.float32),
        interpret=interpret,
    )(seed_arr, qb, kb, vb, bias_bh, do_b, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, p_drop=p_drop,
                          n_q_tiles=Tq_p // q_tile,
                          q_tile=q_tile, k_tile=k_tile,
                          hw_prng=not interpret),
        grid=(B * H, Tk_p // k_tile),
        in_specs=[
            _seed_spec(),
            pl.BlockSpec((1, Tq_p, Dh_p), lambda b, i: (b, 0, 0)),  # q whole
            pl.BlockSpec((1, k_tile, Dh_p), lambda b, i: (b, i, 0)),  # k tile
            pl.BlockSpec((1, k_tile, Dh_p), lambda b, i: (b, i, 0)),  # v tile
            pl.BlockSpec((1, 1, k_tile), lambda b, i: (b, 0, i)),   # bias t
            pl.BlockSpec((1, Tq_p, Dh_p), lambda b, i: (b, 0, 0)),  # dO whole
            pl.BlockSpec((1, 1, Tq_p), lambda b, i: (b, 0, 0)),     # lse
            pl.BlockSpec((1, 1, Tq_p), lambda b, i: (b, 0, 0)),     # delta
        ],
        out_specs=[
            pl.BlockSpec((1, k_tile, Dh_p), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, k_tile, Dh_p), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Tk_p, Dh_p), jnp.float32),
            jax.ShapeDtypeStruct((B * H, Tk_p, Dh_p), jnp.float32),
        ],
        interpret=interpret,
    )(seed_arr, qb, kb, vb, bias_bh, do_b, lse, delta)

    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_attention_train(q, k, v, bias, seed, p_drop: float = 0.0,
                          interpret: bool = False):
    """Flash attention with in-kernel dropout, differentiable.

    Args:
      q/k/v: (B, Tq|Tk, H, Dh); bias: (B, Tk) additive key-padding bias or
        None; seed: int32 scalar (ignored when p_drop == 0);
      p_drop: static attention-dropout rate; interpret: Pallas interpret
        mode (CPU tests).
    Returns (B, Tq, H, Dh) in q.dtype.
    """
    out, _, _ = _fwd_impl(q, k, v, bias, seed, p_drop, interpret)
    B, Tq, H, Dh = q.shape
    return _from_bh(out, B, H, Tq, Dh)


def _fat_fwd(q, k, v, bias, seed, p_drop, interpret):
    out_b, lse, (qb, kb, vb, bias_bh, seed_arr) = _fwd_impl(
        q, k, v, bias, seed, p_drop, interpret)
    B, Tq, H, Dh = q.shape
    # residuals must be a pytree of arrays: the true Tk travels as the
    # shape of a zero-size marker; kv dtype as a zero-size cast of k
    tk_marker = jnp.zeros((k.shape[1], 0), k.dtype)
    res = (qb, kb, vb, bias_bh, seed_arr, out_b, lse, tk_marker, bias)
    return _from_bh(out_b, B, H, Tq, Dh), res


def _fat_bwd(p_drop, interpret, res, g):
    tk_marker, bias = res[7], res[8]
    Tk, kv_dtype = tk_marker.shape[0], tk_marker.dtype
    B, Tq, H, Dh = g.shape
    dqb, dkb, dvb = _bwd_impl(res[:7], g, p_drop, interpret)
    dq = _from_bh(dqb, B, H, Tq, Dh).astype(g.dtype)
    dk = _from_bh(dkb, B, H, Tk, Dh).astype(kv_dtype)
    dv = _from_bh(dvb, B, H, Tk, Dh).astype(kv_dtype)
    # the key-padding bias derives from lengths — no gradient flows to it
    dbias = None if bias is None else jnp.zeros_like(bias)
    dseed = np.zeros((), dtype=jax.dtypes.float0)  # int arg: zero tangent
    return dq, dk, dv, dbias, dseed


flash_attention_train.defvjp(_fat_fwd, _fat_bwd)
