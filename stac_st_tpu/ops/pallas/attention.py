"""Pallas TPU kernel: fused (flash-style) attention for the encoder.

The encoder self-attention is the model's hottest non-matmul-bound op at
long multi-turn lengths (30–90 s windows ⇒ 750–2250 encoder frames,
SURVEY.md §5.7): the naive path materializes (B, H, T, T) score tensors in
HBM. This kernel runs the online-softmax formulation entirely in VMEM —
one (batch·head, q-tile) grid cell streams K/V tiles, keeping running max /
sum / accumulator in registers — so HBM traffic is O(T·D) instead of O(T²).

Supports an additive key-padding bias (B, T_k). Forward-only: training uses
the XLA einsum path (whose fused backward XLA already generates); inference
(`deterministic=True`) can opt in via ``stac_st_tpu.ops.pallas.enable()``.

Tiling: q tiles of 128 rows (MXU/VPU aligned), full K/V per step in the
lane dimension; head_dim padded to 128 lanes by the caller contract
(d_model/nhead ∈ {64, 128} for all reference presets — zero-padding lanes
is exact for softmax(QKᵀ)V).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["flash_attention"]

Q_TILE = 128
K_TILE = 128
NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, k_len: int):
    """One (bh, q_tile) cell: online softmax over K tiles.

    Block shapes: q_ref/o_ref (1, Q_TILE, Dh); k_ref/v_ref (1, T_k, Dh);
    bias_ref (1, 1, T_k).
    """
    q = q_ref[0].astype(jnp.float32)
    n_k_tiles = pl.cdiv(k_len, K_TILE)

    def body(kt, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(kt * K_TILE, K_TILE), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kt * K_TILE, K_TILE), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s + bias_ref[0, 0, pl.ds(kt * K_TILE, K_TILE)][None, :]
        # mask K rows beyond the true length (the tail tile is padded)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col + kt * K_TILE < k_len, s, NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        scale = jnp.exp(m_prev - m_new)
        l_new = l_prev * scale + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * scale + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((q.shape[0], 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc0 = jnp.zeros(q.shape, jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_k_tiles, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(q, k, v, bias=None, interpret: bool = False):
    """Fused attention. q/k/v: (B, T, H, Dh); bias: (B, T_k) additive or
    None. Returns (B, T_q, H, Dh). Scores are scaled by 1/sqrt(Dh) here.
    """
    B, Tq, H, Dh = q.shape
    Tk = k.shape[1]
    scale = 1.0 / (Dh ** 0.5)

    # (B*H, T, Dh) layout; pad T to tile multiples and Dh to 128 lanes
    def to_bh(x, T):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, T, Dh)
        pad_t = (-T) % Q_TILE
        pad_d = (-Dh) % 128
        return jnp.pad(x, ((0, 0), (0, pad_t), (0, pad_d)))

    qb = to_bh(q * scale, Tq)
    kb = to_bh(k, Tk)
    vb = to_bh(v, Tk)
    if bias is None:
        bias_b = jnp.zeros((B, 1, Tk), jnp.float32)
    else:
        bias_b = bias.reshape(B, 1, Tk).astype(jnp.float32)
    bias_bh = jnp.repeat(bias_b, H, axis=0).reshape(B * H, 1, Tk)
    bias_bh = jnp.pad(bias_bh, ((0, 0), (0, 0), (0, (-Tk) % K_TILE)))

    Tq_p = qb.shape[1]
    Tk_p = kb.shape[1]
    Dh_p = qb.shape[2]
    grid = (B * H, Tq_p // Q_TILE)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, k_len=Tk),
        out_shape=jax.ShapeDtypeStruct((B * H, Tq_p, Dh_p), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Q_TILE, Dh_p), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Tk_p, Dh_p), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Tk_p, Dh_p), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, Tk_p), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Q_TILE, Dh_p), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(qb, kb, vb, bias_bh)

    out = out[:, :Tq, :Dh].reshape(B, H, Tq, Dh)
    return jnp.swapaxes(out, 1, 2)
