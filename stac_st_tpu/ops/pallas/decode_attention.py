"""Pallas TPU kernels for single-step decode attention.

Why: during KV-cached decoding the per-layer attention is a batch of
1-row matvecs — (B·beam, H) × [(1, Dh) · (Dh, S)] — which XLA lowers poorly
on TPU (measured 0.65 ms/layer/step at 160 rows, ~35 GB/s effective;
docs/PERF.md). These kernels stream each row's K/V through VMEM once and do
the contraction on the VPU, with the cross-attention variant reading the
beam-invariant encoder K/V once per utterance (beam rides as matmul rows).

Forward-only (decoding needs no gradients). Parity with the XLA path is
enforced in tests/test_pallas.py (interpret mode); the model falls back to
XLA whenever kernels are disabled (`stac_st_tpu.ops.pallas.enable()`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_self_attention", "decode_cross_attention",
           "decode_self_attention_anc"]

NEG_INF = -1e9


def _self_kernel(idx_ref, q_ref, kT_ref, v_ref, o_ref):
    """One row: q (1,H,Dh) · Kᵀ (1,H,Dh,S) → softmax(≤idx) → · V (1,H,S,Dh).

    All intermediate arrays stay ≥2D (TPU Pallas constraint)."""
    idx = idx_ref[0, 0]
    H = q_ref.shape[1]
    S = kT_ref.shape[3]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    mask = jnp.where(pos > idx, NEG_INF, 0.0)  # (1, S)
    for h in range(H):
        q_h = q_ref[0, h : h + 1, :].astype(jnp.float32)     # (1, Dh)
        kT_h = kT_ref[0, h, :, :].astype(jnp.float32)        # (Dh, S)
        s = jnp.dot(q_h, kT_h, preferred_element_type=jnp.float32)  # (1, S)
        s = s + mask
        s = s - jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        v_h = v_ref[0, h, :, :].astype(jnp.float32)          # (S, Dh)
        out = jnp.dot(p, v_h, preferred_element_type=jnp.float32)  # (1, Dh)
        o_ref[0, h : h + 1, :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_self_attention(q, kT, v, idx, interpret: bool = False):
    """q (BB, H, Dh) pre-scaled; kT (BB, H, Dh, S); v (BB, H, S, Dh);
    idx () int32 — attend positions 0..idx. Returns (BB, H, Dh)."""
    BB, H, Dh = q.shape
    S = kT.shape[3]
    # Mosaic wants lane-aligned trailing dims: pad S to a 128 multiple.
    # Padded key positions always satisfy pos > idx, so the mask drops them.
    pad = (-S) % 128
    if pad:
        kT = jnp.pad(kT, ((0, 0), (0, 0), (0, 0), (0, pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        S = S + pad
    idx_arr = jnp.reshape(idx, (1, 1)).astype(jnp.int32)
    return pl.pallas_call(
        _self_kernel,
        grid=(BB,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, Dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, H, Dh, S), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, S, Dh), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, Dh), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BB, H, Dh), q.dtype),
        interpret=interpret,
    )(idx_arr, q, kT, v)


def _anc_kernel(idx_ref, q_ref, k_ref, v_ref, anc_ref, o_ref, *, beam: int):
    """Gather-free beam self-attention for one utterance.

    The K/V caches are NEVER physically reordered by beam-search parent
    selection (each full-cache gather costs a complete HBM copy per decode
    step — the dominant decode cost, docs/PERF.md). Instead rows stay where
    they were written and ``anc[r, s]`` names the cache row holding beam
    ``r``'s key/value for position ``s``. Inside the kernel the selection
    is a VPU mask over the flattened (row, position) axis — all-pairs
    scores are computed on the MXU from VMEM-resident blocks, so ancestry
    resolution costs no extra HBM traffic at all.

    Blocks: q (beam, H, Dh); k/v (beam, H, S, Dh); anc (1, beam, S).
    """
    idx = idx_ref[0, 0]
    H = q_ref.shape[1]
    S = k_ref.shape[2]
    Dh = k_ref.shape[3]
    anc = anc_ref[0]                                       # (beam, S)
    # flat (p·S) masks: col c ↔ (p = c // S, s = c % S)
    p_of = jax.lax.broadcasted_iota(jnp.int32, (beam, beam * S), 1) // S
    s_of = jax.lax.broadcasted_iota(jnp.int32, (beam, beam * S), 1) % S
    anc_t = jnp.tile(anc, (1, beam))                       # anc[r, c % S]
    mask = jnp.logical_and(p_of == anc_t, s_of <= idx)
    for h in range(H):
        q_h = q_ref[:, h, :].astype(jnp.float32)           # (beam, Dh)
        k_h = k_ref[:, h, :, :].astype(jnp.float32).reshape(beam * S, Dh)
        s_all = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (beam, beam·S)
        s_all = jnp.where(mask, s_all, NEG_INF)
        s_all = s_all - jnp.max(s_all, axis=1, keepdims=True)
        p = jnp.exp(s_all)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        v_h = v_ref[:, h, :, :].astype(jnp.float32).reshape(beam * S, Dh)
        out = jnp.dot(p, v_h, preferred_element_type=jnp.float32)
        # fp32 store; caller casts (bf16 stores into the strided middle-h
        # slot hit a Mosaic relayout rejection — see _cross_kernel)
        o_ref[:, h, :] = out


@functools.partial(jax.jit, static_argnames=("beam", "interpret"))
def decode_self_attention_anc(q, k, v, anc, idx, beam: int = 1,
                              interpret: bool = False):
    """q (B·beam, H, Dh) pre-scaled; k/v (B·beam, H, S, Dh) unpermuted
    caches; anc (B, beam, S) int32 ancestor rows (values in [0, beam));
    idx () int32 — attend positions 0..idx. Returns (B·beam, H, Dh) in the
    query dtype."""
    BB, H, Dh = q.shape
    S = k.shape[2]
    B = BB // beam
    assert anc.shape == (B, beam, S), (anc.shape, B, beam, S)
    pad = (-S) % 128
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        anc = jnp.pad(anc, ((0, 0), (0, 0), (0, pad)))
        S = S + pad
    idx_arr = jnp.reshape(idx, (1, 1)).astype(jnp.int32)
    out = pl.pallas_call(
        functools.partial(_anc_kernel, beam=beam),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((beam, H, Dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((beam, H, S, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((beam, H, S, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, beam, S), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((beam, H, Dh), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BB, H, Dh), jnp.float32),
        interpret=interpret,
    )(idx_arr, q, k, v, anc)
    return out.astype(q.dtype)


def _cross_kernel(q_ref, kT_ref, v_ref, bias_ref, o_ref):
    """One utterance: Q (beam,H,Dh) · Kᵀ (1,H,Dh,S) → softmax+bias → · V."""
    beam, H, Dh = q_ref.shape
    S = kT_ref.shape[3]
    bias = bias_ref[0, 0, :].astype(jnp.float32)[None, :]  # (1, S)
    for h in range(H):
        q_h = q_ref[:, h, :].astype(jnp.float32)          # (beam, Dh)
        kT_h = kT_ref[0, h, :, :].astype(jnp.float32)     # (Dh, S)
        s = jnp.dot(q_h, kT_h, preferred_element_type=jnp.float32)
        s = s + bias
        s = s - jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        v_h = v_ref[0, h, :, :].astype(jnp.float32)       # (S, Dh)
        out = jnp.dot(p, v_h, preferred_element_type=jnp.float32)
        # store stays fp32: a bf16 store of (beam, Dh) rows into the
        # strided middle-h slot needs a sublane relayout Mosaic rejects
        # ("infer-vector-layout: unsupported shape cast"); the caller
        # casts the whole output back to the query dtype instead.
        o_ref[:, h, :] = out


@functools.partial(jax.jit, static_argnames=("beam", "interpret"))
def decode_cross_attention(q, kT, v, bias=None, beam: int = 1,
                           interpret: bool = False):
    """q (B·beam, H, Dh) pre-scaled; kT (B, H, Dh, S); v (B, H, S, Dh);
    bias (B, S) additive or None. Returns (B·beam, H, Dh)."""
    BB, H, Dh = q.shape
    B = kT.shape[0]
    S = kT.shape[3]
    assert BB == B * beam, (BB, B, beam)
    if bias is None:
        bias3 = jnp.zeros((B, 1, S), jnp.float32)
    else:
        bias3 = bias.reshape(B, 1, S).astype(jnp.float32)
    # lane-align S; padded positions are masked off through the bias
    pad = (-S) % 128
    if pad:
        kT = jnp.pad(kT, ((0, 0), (0, 0), (0, 0), (0, pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        bias3 = jnp.pad(bias3, ((0, 0), (0, 0), (0, pad)),
                        constant_values=NEG_INF)
        S = S + pad
    out = pl.pallas_call(
        _cross_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((beam, H, Dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, H, Dh, S), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, S, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((beam, H, Dh), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BB, H, Dh), jnp.float32),
        interpret=interpret,
    )(q, kT, v, bias3)
    return out.astype(q.dtype)
