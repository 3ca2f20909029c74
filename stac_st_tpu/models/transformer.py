"""Pre-LN Transformer encoder/decoder with KV-cached decoding (flax).

TPU-native re-design of the reference's SpeechBrain TransformerInterface
stack (``TransformerMultiTask.py:111-128``; pre-LN ``normalize_before: True``,
GELU, regularMHA, fixed sinusoidal PE, NormalizedEmbedding — yaml:183-196):

* attention is one fused einsum pair per layer (MXU), with additive mask
  biases (no boolean select chains);
* the decoder has two execution modes sharing the same parameters:
  teacher-forced full-sequence (training) and single-step with an explicit
  functional KV cache (inference) — the cache is a pytree argument/return,
  so beam search can reorder it with a gather (see
  :mod:`stac_st_tpu.decoding.beam_search`). The reference instead re-decodes
  the full prefix each step (``mutitask_decoder.py:119-128``, O(L²) per
  utterance) — replacing that is the headline inference-perf lever;
* dropout is an explicit ``deterministic`` flag + rng, everything is pure.

Weight init mirrors the reference's ``_init_params`` (xavier_normal on all
>1-dim params, ``TransformerMultiTask.py:311-314``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn


__all__ = [
    "dq_dense_params",
    "NormalizedEmbedding",
    "MultiHeadAttention",
    "FeedForward",
    "EncoderLayer",
    "DecoderLayer",
    "TransformerEncoder",
    "TransformerDecoder",
]

_glorot = nn.initializers.glorot_normal()


def _dense(features: int, name: str | None = None) -> nn.Dense:
    return nn.Dense(features, kernel_init=_glorot, name=name)


def dq_dense_params(p: Dict[str, Any], x):
    """Apply a Dense's params to ``x``, honoring weight-only int8 kernels.

    ``p`` is a Dense param dict: float ``kernel`` → plain matmul; int8
    ``kernel`` (+ per-output-column fp32 ``kernel_scale``) → the
    int8→bf16 convert fuses into the matmul's operand LOAD on TPU, so
    the weight stream costs half the HBM bytes with no materialized
    bf16 copy (measured 639 → 163 µs/step for a decoder-sized weight
    stream at 10 query rows — tools/exp_weight_int8.py). The scale
    rides the f32 accumulator after the matmul.
    """
    k = p["kernel"]
    if k.dtype == jnp.int8:
        y = jnp.matmul(
            x, k.astype(x.dtype), preferred_element_type=jnp.float32
        ) * p["kernel_scale"]
    else:
        y = jnp.matmul(x, k.astype(x.dtype)).astype(jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _apply_dense(dense: "nn.Dense", x):
    """Call ``dense`` normally for float kernels; dequant-on-read for
    weight-only int8 kernels (decode hot path — see dq_dense_params).

    The float path delegates to the module so training/init numerics
    are byte-identical to plain ``dense(x)``; the int8 branch only ever
    triggers on params rewritten by utils/quantize.py (serving).
    """
    p = dense.variables.get("params") if dense.scope is not None else None
    k = None if p is None else p.get("kernel")
    if k is None or k.dtype != jnp.int8:
        return dense(x)
    return dq_dense_params(p, x)


class NormalizedEmbedding(nn.Module):
    """Embedding scaled by sqrt(d_model) (SB NormalizedEmbedding)."""

    d_model: int
    vocab: int

    @nn.compact
    def __call__(self, tokens):
        emb = nn.Embed(
            self.vocab, self.d_model, embedding_init=_glorot, name="embed"
        )(tokens)
        return emb * jnp.sqrt(jnp.asarray(self.d_model, emb.dtype))


class MultiHeadAttention(nn.Module):
    """Dot-product MHA with optional functional KV cache.

    Cache layout (per call site): {"k": (B, S, H, Dh), "v": (B, S, H, Dh),
    "index": ()} — appended in-place via dynamic_update_slice.
    """

    d_model: int
    nhead: int
    dropout: float = 0.0

    def setup(self):
        assert self.d_model % self.nhead == 0
        self.head_dim = self.d_model // self.nhead
        self.q_proj = _dense(self.d_model, name="q_proj")
        self.k_proj = _dense(self.d_model, name="k_proj")
        self.v_proj = _dense(self.d_model, name="v_proj")
        self.out_proj = _dense(self.d_model, name="out_proj")
        self.attn_drop = nn.Dropout(rate=self.dropout)

    def _split(self, x):
        B, T, _ = x.shape
        return x.reshape(B, T, self.nhead, self.head_dim)

    def _flash_trainable(self, q, k, v, bias, deterministic):
        """Fused-attention fast path (opt-in via stac_st_tpu.ops.pallas).

        Applies when the bias is key-padding-only — (B, 1, 1, Tk) or None —
        which covers encoder self-attention and decoder cross-attention in
        training. Dropout (and its backward) runs inside the kernel with a
        counter-based mask; weights are not materialized, so the returned
        attention map is None.
        """
        from ..ops import pallas as pallas_mod

        if not pallas_mod.train_enabled():
            return None
        key_pad_only = bias is None or (
            bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1
        )
        # VMEM guard: the kernel streams whole K/V per (batch, head)
        if not key_pad_only or k.shape[1] > 8192:
            return None
        from ..ops.pallas.train_attention import flash_attention_train

        p = self.dropout if (self.dropout > 0.0 and not deterministic) else 0.0
        if p > 0.0:
            seed = jax.random.bits(
                self.make_rng("dropout"), dtype=jnp.uint32
            ).astype(jnp.int32)
        else:
            seed = jnp.int32(0)
        bias2 = None if bias is None else bias.reshape(bias.shape[0], -1)
        out = flash_attention_train(
            q, k, v, bias2, seed, p, pallas_mod.interpret_mode()
        )
        B, Tq = out.shape[:2]
        return self.out_proj(out.reshape(B, Tq, self.d_model)), None

    def _attend(self, q, k, v, bias, deterministic):
        # q: (B, Tq, H, Dh); k/v: (B, Tk, H, Dh); bias: broadcastable to
        # (B, H, Tq, Tk) additive.
        fused = self._flash_trainable(q, k, v, bias, deterministic)
        if fused is not None:
            return fused
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.head_dim, jnp.float32))
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        if bias is not None:
            logits = logits + bias
        weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        if self.dropout > 0.0 and not deterministic:
            weights = self.attn_drop(weights, deterministic=False)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", weights, v, preferred_element_type=jnp.float32
        ).astype(q.dtype)
        B, Tq = out.shape[:2]
        return self.out_proj(out.reshape(B, Tq, self.d_model)), weights

    def __call__(self, query, key, value, bias=None, deterministic=True):
        q = self._split(self.q_proj(query))
        k = self._split(self.k_proj(key))
        v = self._split(self.v_proj(value))
        return self._attend(q, k, v, bias, deterministic)

    # ---- decode mode: attention-native cache layouts -------------------
    # Per-step attention with (B, S, H, Dh) caches forces XLA to transpose
    # the full K/V each step (bhqk einsums) — measured as the dominant cost
    # of the decode loop. Caches therefore live in the layouts the batched
    # matmuls consume directly: Kᵀ as (B, H, Dh, S) and V as (B, H, S, Dh);
    # each step is then two plain jnp.matmul's with zero data movement.

    def _q_heads(self, query):
        B = query.shape[0]
        q = _apply_dense(self.q_proj, query).reshape(
            B, 1, self.nhead, self.head_dim)
        return jnp.swapaxes(q, 1, 2)  # (B, H, 1, Dh)

    def project_kv_decode(self, key_value):
        """Precompute cross-attention K/V in decode layouts:
        (Kᵀ (B, H, Dh, S), V (B, H, S, Dh))."""
        B, S, _ = key_value.shape
        k = self.k_proj(key_value).reshape(B, S, self.nhead, self.head_dim)
        v = self.v_proj(key_value).reshape(B, S, self.nhead, self.head_dim)
        kT = jnp.transpose(k, (0, 2, 3, 1))
        return kT, jnp.swapaxes(v, 1, 2)

    def _decode_attend(self, q, kT, v, bias):
        """q (B,H,1,Dh) · Kᵀ (B,H,Dh,S) → softmax → · V (B,H,S,Dh)."""
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.head_dim, jnp.float32))
        logits = jnp.matmul(
            q, kT, preferred_element_type=jnp.float32
        ) * scale  # (B, H, 1, S)
        if bias is not None:
            logits = logits + bias
        weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.matmul(
            weights, v, preferred_element_type=jnp.float32
        ).astype(q.dtype)  # (B, H, 1, Dh)
        B = out.shape[0]
        out = jnp.swapaxes(out, 1, 2).reshape(B, 1, self.d_model)
        return _apply_dense(self.out_proj, out)

    def step(self, query, cache: Dict[str, Any], bias=None,
             fused_update: bool = False):
        """Single decode step: query (B, 1, d); appends K/V to the cache.

        fused_update=True appends via a broadcasted ``where(pos == idx)``
        select instead of ``dynamic_update_slice``. Inside the beam-search
        loop the cache arrives as the output of the parent gather; XLA fuses
        the elementwise select into the gather's output write, so the append
        costs zero extra HBM passes (a dus after a gather was measured as a
        second full-cache copy — ~1.6 ms/step at bench shapes). Keep False
        for greedy decoding, where there is no gather and an in-place dus is
        cheaper than a full select write.
        """
        B = query.shape[0]
        H, Dh = self.nhead, self.head_dim
        q_r, k_r, v_r = self._fused_qkv(query[:, 0, :])
        q = q_r[:, :, None, :]       # (B, H, 1, Dh)
        k_new = k_r[:, :, None, :]
        v_new = v_r[:, :, None, :]
        if cache["k"].dtype == jnp.int8:
            return self._step_int8(q, k_new, v_new, cache, bias,
                                   fused_update)
        idx = cache["index"]
        S_cache = cache["k"].shape[-1]
        if fused_update:
            kT = jnp.where(
                jnp.arange(S_cache)[None, None, None, :] == idx,
                jnp.swapaxes(k_new, 2, 3).astype(cache["k"].dtype),
                cache["k"],
            )
            v = jnp.where(
                jnp.arange(S_cache)[None, None, :, None] == idx,
                v_new.astype(cache["v"].dtype),
                cache["v"],
            )
        else:
            kT = jax.lax.dynamic_update_slice(
                cache["k"],
                jnp.swapaxes(k_new, 2, 3).astype(cache["k"].dtype),
                (0, 0, 0, idx),
            )
            v = jax.lax.dynamic_update_slice(
                cache["v"], v_new.astype(cache["v"].dtype), (0, 0, idx, 0)
            )
        S = kT.shape[-1]
        from ..ops import pallas as pallas_mod

        # ragged (per-row-index) caches — continuous batching — carry the
        # write index as (B, 1, 1, 1); the Pallas kernel takes a scalar,
        # so route those through the broadcast path below (ndim is static)
        if pallas_mod.is_enabled() and bias is None and jnp.ndim(idx) == 0:
            from ..ops.pallas.decode_attention import decode_self_attention

            scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32))
            q_rows = (q.astype(jnp.float32) * scale).astype(q.dtype)[:, :, 0]
            attn = decode_self_attention(
                q_rows, kT, v, idx, interpret=pallas_mod.interpret_mode()
            )  # (B, H, Dh)
            out = _apply_dense(
                self.out_proj, attn.reshape(B, 1, self.d_model))
            return out, {"k": kT, "v": v, "index": idx + 1}

        pos_bias = jnp.where(
            jnp.arange(S)[None, None, None, :] > idx, -1e9, 0.0
        )
        if bias is not None:
            pos_bias = pos_bias + bias
        out = self._decode_attend(q, kT, v, pos_bias)
        return out, {"k": kT, "v": v, "index": idx + 1}

    def _step_int8(self, q, k_new, v_new, cache, bias, fused_update):
        """Decode step against an int8-quantized self-attention cache.

        Opt-in via ``kv_cache_dtype='int8'`` (searcher/engine). K/V rows
        are quantized at APPEND time with one fp32 scale per
        (row, head, position): K's scale multiplies its logits column
        after the QKᵀ matmul, V's folds into the softmax weights before
        the weightsᵀV matmul, so both matmuls stream int8 bytes from HBM
        (the int8→bf16 convert fuses into the operand load — measured
        357 → 223 µs/step for the cache read at bench shapes,
        ``tools/exp_int8_cache.py``). Unwritten positions carry scale 0
        and are masked by the position bias.
        """
        idx = cache["index"]
        kT_c, v_c = cache["k"], cache["v"]
        k_sc, v_sc = cache["k_scale"], cache["v_scale"]  # (B, H, 1, S) f32
        S = kT_c.shape[-1]

        def quant(x):  # x (B, H, 1, Dh) -> int8 values + (B, H, 1, 1) scale
            s = jnp.maximum(
                jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                        keepdims=True), 1e-6,
            ) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                          -127, 127).astype(jnp.int8)
            return xq, s

        k_q, s_k = quant(k_new)
        v_q, s_v = quant(v_new)
        on_step = jnp.arange(S)[None, None, None, :] == idx  # (1,1,1,S)
        if fused_update:
            kT = jnp.where(on_step, jnp.swapaxes(k_q, 2, 3), kT_c)
            v = jnp.where(
                jnp.arange(S)[None, None, :, None] == idx, v_q, v_c
            )
        else:
            kT = jax.lax.dynamic_update_slice(
                kT_c, jnp.swapaxes(k_q, 2, 3), (0, 0, 0, idx))
            v = jax.lax.dynamic_update_slice(v_c, v_q, (0, 0, idx, 0))
        k_sc = jnp.where(on_step, s_k, k_sc)
        v_sc = jnp.where(on_step, s_v, v_sc)

        scale = 1.0 / jnp.sqrt(jnp.asarray(self.head_dim, jnp.float32))
        logits = jnp.matmul(
            q, kT.astype(q.dtype), preferred_element_type=jnp.float32
        ) * (k_sc * scale)  # per-position dequant rides the logits column
        pos_bias = jnp.where(jnp.arange(S)[None, None, None, :] > idx,
                             -1e9, 0.0)
        if bias is not None:
            pos_bias = pos_bias + bias
        logits = logits + pos_bias
        weights = jax.nn.softmax(logits, axis=-1)
        w_eff = (weights * v_sc).astype(q.dtype)  # fold V's dequant scale
        out = jnp.matmul(
            w_eff, v.astype(q.dtype), preferred_element_type=jnp.float32
        ).astype(q.dtype)  # (B, H, 1, Dh)
        B = out.shape[0]
        out = _apply_dense(
            self.out_proj,
            jnp.swapaxes(out, 1, 2).reshape(B, 1, self.d_model))
        return out, {"k": kT, "v": v, "k_scale": k_sc, "v_scale": v_sc,
                     "index": idx + 1}

    def step_window(self, query, cache: Dict[str, Any], bias=None):
        """Windowed decode step: query (B, w, d) at positions idx..idx+w-1.

        The verification path for speculative decoding: w provisional
        K/V rows are appended at the cache write index in one
        dynamic_update_slice, and the window attends causally — key j is
        visible to window row r iff j <= idx + r — over the cached
        prefix plus the window itself. Equivalent to w sequential
        ``step`` calls but with one attention matmul of query length w
        (the MXU sees a (w, S) logits tile instead of w (1, S) rows).
        Supports both float and int8 cache layouts. Returns
        ((B, w, d), cache') with the write index advanced by w; the
        caller rewinds the index to the accepted length afterwards
        (stale rows past the index are masked by the causal bias and
        are overwritten before they ever become visible, because the
        next window always starts at the rewound index).
        """
        B, w, _ = query.shape
        H, Dh = self.nhead, self.head_dim
        q_r, k_r, v_r = self._fused_qkv(query.reshape(B * w, -1))
        q = jnp.swapaxes(q_r.reshape(B, w, H, Dh), 1, 2)       # (B,H,w,Dh)
        k_new = jnp.swapaxes(k_r.reshape(B, w, H, Dh), 1, 2)   # (B,H,w,Dh)
        v_new = jnp.swapaxes(v_r.reshape(B, w, H, Dh), 1, 2)   # (B,H,w,Dh)
        idx = cache["index"]
        S = cache["k"].shape[-1]
        # causal visibility inside the window
        pos_bias = jnp.where(
            jnp.arange(S)[None, None, None, :]
            > idx + jnp.arange(w)[None, None, :, None],
            -1e9, 0.0,
        )
        if bias is not None:
            pos_bias = pos_bias + bias
        scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32))
        if cache["k"].dtype == jnp.int8:
            def quant(x, axis):  # per-(B, H, position) scale over Dh
                s = jnp.maximum(
                    jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis,
                            keepdims=True), 1e-6,
                ) / 127.0
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                              -127, 127).astype(jnp.int8)
                return xq, s

            k_q, s_k = quant(jnp.swapaxes(k_new, 2, 3), 2)  # (B,H,Dh,w)
            v_q, s_v = quant(v_new, 3)                      # (B,H,w,Dh)
            kT = jax.lax.dynamic_update_slice(
                cache["k"], k_q, (0, 0, 0, idx))
            v = jax.lax.dynamic_update_slice(
                cache["v"], v_q, (0, 0, idx, 0))
            k_sc = jax.lax.dynamic_update_slice(
                cache["k_scale"], s_k, (0, 0, 0, idx))
            v_sc = jax.lax.dynamic_update_slice(
                cache["v_scale"], jnp.swapaxes(s_v, 2, 3), (0, 0, 0, idx))
            logits = jnp.matmul(
                q, kT.astype(q.dtype), preferred_element_type=jnp.float32
            ) * (k_sc * scale) + pos_bias  # (B, H, w, S)
            weights = jax.nn.softmax(logits, axis=-1)
            w_eff = (weights * v_sc).astype(q.dtype)
            out = jnp.matmul(
                w_eff, v.astype(q.dtype),
                preferred_element_type=jnp.float32,
            ).astype(q.dtype)  # (B, H, w, Dh)
            new_cache = {"k": kT, "v": v, "k_scale": k_sc, "v_scale": v_sc,
                         "index": idx + w}
        else:
            kT = jax.lax.dynamic_update_slice(
                cache["k"],
                jnp.swapaxes(k_new, 2, 3).astype(cache["k"].dtype),
                (0, 0, 0, idx),
            )
            v = jax.lax.dynamic_update_slice(
                cache["v"], v_new.astype(cache["v"].dtype), (0, 0, idx, 0)
            )
            logits = jnp.matmul(
                q, kT, preferred_element_type=jnp.float32
            ) * scale + pos_bias
            weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
            out = jnp.matmul(
                weights, v, preferred_element_type=jnp.float32
            ).astype(q.dtype)  # (B, H, w, Dh)
            new_cache = {"k": kT, "v": v, "index": idx + w}
        out = jnp.swapaxes(out, 1, 2).reshape(B, w, self.d_model)
        return _apply_dense(self.out_proj, out), new_cache

    def _fused_qkv(self, query):
        """One (d, 3d) matmul for the decode step (docs/PERF.md).

        Weight-only int8 kernels (utils/quantize.py) stream half the
        HBM bytes: the int8 concat feeds the matmul via a fused
        dequant-on-read, and the per-output-column scales ride the f32
        accumulator (tools/exp_weight_int8.py).
        """
        B = query.shape[0]
        H, Dh = self.nhead, self.head_dim
        pq = self.q_proj.variables["params"]
        pk = self.k_proj.variables["params"]
        pv = self.v_proj.variables["params"]
        w = jnp.concatenate(
            [pq["kernel"], pk["kernel"], pv["kernel"]], axis=1)
        b = jnp.concatenate([pq["bias"], pk["bias"], pv["bias"]])
        if w.dtype == jnp.int8:
            s = jnp.concatenate([
                pq["kernel_scale"], pk["kernel_scale"], pv["kernel_scale"]
            ])
            qkv = jnp.matmul(
                query, w.astype(query.dtype),
                preferred_element_type=jnp.float32,
            ) * s
            qkv = (qkv + b.astype(jnp.float32)).astype(query.dtype)
        else:
            qkv = jnp.matmul(query, w) + b.astype(query.dtype)
        q_r, k_r, v_r = jnp.split(qkv, 3, axis=-1)
        return (q_r.reshape(B, H, Dh), k_r.reshape(B, H, Dh),
                v_r.reshape(B, H, Dh))

    def step_anc(self, query, cache: Dict[str, Any], anc, beam: int):
        """Gather-free beam decode step (Pallas ancestor-select kernel).

        The cache rows are never reordered by beam-search parent selection;
        ``anc`` (B, beam, S) names the cache row holding each beam's
        key/value per position (maintained by the searcher). Cache layout
        here is (B·beam, H, S, Dh) for BOTH k and v, so the per-step append
        is a sublane-index dynamic_update_slice that XLA keeps in place —
        per-step HBM traffic is exactly one cache read (the attention
        itself), no gather copy, no append copy.
        """
        B = query.shape[0]
        q, k_new, v_new = self._fused_qkv(query[:, 0, :])
        idx = cache["index"]
        k = jax.lax.dynamic_update_slice(
            cache["k"], k_new[:, :, None, :].astype(cache["k"].dtype),
            (0, 0, idx, 0),
        )
        v = jax.lax.dynamic_update_slice(
            cache["v"], v_new[:, :, None, :].astype(cache["v"].dtype),
            (0, 0, idx, 0),
        )
        from ..ops import pallas as pallas_mod
        from ..ops.pallas.decode_attention import decode_self_attention_anc

        scale = 1.0 / jnp.sqrt(jnp.asarray(self.head_dim, jnp.float32))
        q_rows = (q.astype(jnp.float32) * scale).astype(q.dtype)
        attn = decode_self_attention_anc(
            q_rows, k, v, anc, idx, beam,
            interpret=pallas_mod.interpret_mode(),
        )
        out = _apply_dense(self.out_proj, attn.reshape(B, 1, self.d_model))
        return out, {"k": k, "v": v, "index": idx + 1}

    def _step_cross_int8(self, q, kT, v, bias, beam, scales):
        """Beam-grouped cross-attention against int8 K/V (opt-in; the
        cross cache is read EVERY decode step, so quantizing it halves a
        budget-independent HBM stream — docs/PERF.md round 3). Dequant:
        K's per-position scale multiplies its logits column, V's folds
        into the softmax weights (identical to ``_step_int8``)."""
        k_sc, v_sc = scales  # (B, H, 1, S) fp32 each
        BB = q.shape[0]
        B = BB // beam
        H, Dh = self.nhead, self.head_dim
        qg = jnp.swapaxes(q.reshape(B, beam, H, Dh), 1, 2)  # (B,H,beam,Dh)
        scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32))
        logits = jnp.matmul(
            qg, kT.astype(qg.dtype), preferred_element_type=jnp.float32
        ) * (k_sc * scale)  # (B, H, beam, S)
        if bias is not None:
            logits = logits + bias  # (B, 1, 1, S) broadcasts over beams
        weights = jax.nn.softmax(logits, axis=-1)
        w_eff = (weights * v_sc).astype(qg.dtype)
        out = jnp.matmul(
            w_eff, v.astype(qg.dtype), preferred_element_type=jnp.float32
        ).astype(qg.dtype)  # (B, H, beam, Dh)
        out = jnp.swapaxes(out, 1, 2).reshape(BB, 1, self.d_model)
        return _apply_dense(self.out_proj, out)

    def step_cross(self, query, kT, v, bias=None, beam: int = 1,
                   cross_scales=None):
        """Cross-attention step against precomputed decode-layout K/V.

        With beam > 1, K/V are stored once per utterance (B rows) while the
        query carries B·beam rows: the beam dimension rides as the query
        length of one batched matmul, so the beam-invariant encoder K/V is
        read once per utterance instead of once per beam — the largest
        share of decode HBM traffic (docs/PERF.md).
        """
        q = self._q_heads(query)  # (B*beam, H, 1, Dh)
        if kT.dtype == jnp.int8:
            return self._step_cross_int8(q, kT, v, bias, beam,
                                         cross_scales)
        from ..ops import pallas as pallas_mod

        if pallas_mod.is_enabled():
            from ..ops.pallas.decode_attention import decode_cross_attention

            BBp = q.shape[0]
            scale = 1.0 / jnp.sqrt(jnp.asarray(self.head_dim, jnp.float32))
            q_rows = (q.astype(jnp.float32) * scale).astype(q.dtype)[:, :, 0]
            bias2d = None
            if bias is not None:
                bias2d = bias.reshape(bias.shape[0], bias.shape[-1])
            attn = decode_cross_attention(
                q_rows, kT, v, bias2d, beam,
                interpret=pallas_mod.interpret_mode(),
            )
            return _apply_dense(
                self.out_proj, attn.reshape(BBp, 1, self.d_model))

        if beam == 1:
            return self._decode_attend(q, kT, v, bias)
        BB = q.shape[0]
        B = BB // beam
        H, Dh = self.nhead, self.head_dim
        qg = q.reshape(B, beam, H, Dh)
        qg = jnp.swapaxes(qg, 1, 2)  # (B, H, beam, Dh)
        scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32))
        logits = jnp.matmul(
            qg, kT, preferred_element_type=jnp.float32
        ) * scale  # (B, H, beam, S)
        if bias is not None:
            logits = logits + bias  # (B, 1, 1, S) broadcasts over beams
        weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.matmul(
            weights, v, preferred_element_type=jnp.float32
        ).astype(q.dtype)  # (B, H, beam, Dh)
        out = jnp.swapaxes(out, 1, 2).reshape(BB, 1, self.d_model)
        return _apply_dense(self.out_proj, out)


class FeedForward(nn.Module):
    d_model: int
    d_ffn: int
    dropout: float = 0.0
    activation: Callable = jax.nn.gelu

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = _dense(self.d_ffn, name="fc1")(x)
        h = self.activation(h)
        h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        return _dense(self.d_model, name="fc2")(h)

    def step(self, x):
        """Decode-path FFN honoring weight-only int8 kernels.

        fc1/fc2 are the two largest weight streams of a decode step
        (8·d² of the 16·d² per-layer bytes); with int8 kernels both
        matmuls dequantize on read (see dq_dense_params). Float kernels
        take the exact ``__call__`` path.
        """
        p = self.variables.get("params", {})
        if "fc1" not in p or p["fc1"]["kernel"].dtype != jnp.int8:
            return self(x, deterministic=True)
        h = self.activation(dq_dense_params(p["fc1"], x))
        return dq_dense_params(p["fc2"], h)


class EncoderLayer(nn.Module):
    d_model: int
    nhead: int
    d_ffn: int
    dropout: float = 0.1
    activation: Callable = jax.nn.gelu
    normalize_before: bool = True
    attention_type: str = "regularMHA"  # or "RelPosMHAXL"

    def setup(self):
        if self.attention_type == "RelPosMHAXL":
            from .relpos import RelPosMultiHeadAttention

            self.self_attn = RelPosMultiHeadAttention(
                self.d_model, self.nhead, self.dropout, name="self_attn"
            )
        else:
            self.self_attn = MultiHeadAttention(
                self.d_model, self.nhead, self.dropout, name="self_attn"
            )
        self.ffn = FeedForward(
            self.d_model, self.d_ffn, self.dropout, self.activation, name="ffn"
        )
        self.norm1 = nn.LayerNorm(name="norm1")
        self.norm2 = nn.LayerNorm(name="norm2")
        self.drop = nn.Dropout(rate=self.dropout)

    def _attend(self, h, bias, deterministic):
        if self.attention_type == "RelPosMHAXL":
            out, _ = self.self_attn(h, bias, deterministic)
        else:
            out, _ = self.self_attn(h, h, h, bias, deterministic)
        return out

    def __call__(self, x, bias=None, deterministic=True):
        if self.normalize_before:
            h = self._attend(self.norm1(x), bias, deterministic)
            x = x + self.drop(h, deterministic=deterministic)
            h = self.ffn(self.norm2(x), deterministic)
            x = x + self.drop(h, deterministic=deterministic)
        else:
            h = self._attend(x, bias, deterministic)
            x = self.norm1(x + self.drop(h, deterministic=deterministic))
            h = self.ffn(x, deterministic)
            x = self.norm2(x + self.drop(h, deterministic=deterministic))
        return x


class DecoderLayer(nn.Module):
    d_model: int
    nhead: int
    d_ffn: int
    dropout: float = 0.1
    activation: Callable = jax.nn.gelu
    normalize_before: bool = True

    def setup(self):
        self.self_attn = MultiHeadAttention(
            self.d_model, self.nhead, self.dropout, name="self_attn"
        )
        self.cross_attn = MultiHeadAttention(
            self.d_model, self.nhead, self.dropout, name="cross_attn"
        )
        self.ffn = FeedForward(
            self.d_model, self.d_ffn, self.dropout, self.activation, name="ffn"
        )
        self.norm1 = nn.LayerNorm(name="norm1")
        self.norm2 = nn.LayerNorm(name="norm2")
        self.norm3 = nn.LayerNorm(name="norm3")
        self.drop = nn.Dropout(rate=self.dropout)

    def __call__(self, x, memory, self_bias=None, cross_bias=None,
                 deterministic=True):
        if self.normalize_before:
            h = self.norm1(x)
            h, _ = self.self_attn(h, h, h, self_bias, deterministic)
            x = x + self.drop(h, deterministic=deterministic)
            h = self.norm2(x)
            h, attn = self.cross_attn(h, memory, memory, cross_bias,
                                      deterministic)
            x = x + self.drop(h, deterministic=deterministic)
            h = self.ffn(self.norm3(x), deterministic)
            x = x + self.drop(h, deterministic=deterministic)
        else:
            h, _ = self.self_attn(x, x, x, self_bias, deterministic)
            x = self.norm1(x + self.drop(h, deterministic=deterministic))
            h, attn = self.cross_attn(x, memory, memory, cross_bias,
                                      deterministic)
            x = self.norm2(x + self.drop(h, deterministic=deterministic))
            h = self.ffn(x, deterministic)
            x = self.norm3(x + self.drop(h, deterministic=deterministic))
        return x, attn

    # ---- KV-cached single-step mode ------------------------------------
    def init_cache(self, batch: int, max_len: int, memory, dtype=jnp.float32,
                   beam: int = 1, anc_mode: bool = False,
                   cache_dtype=None):
        """Decode-layout caches: self Kᵀ (B·beam, H, Dh, S) / V (·, H, S, Dh);
        cross K/V precomputed ONCE per utterance (memory is (B, S, d) —
        untiled) and shared across beams at attention time. ``anc_mode``
        (gather-free beam decode, Pallas) stores K like V — (·, H, S, Dh) —
        so the per-step append is a sublane-index in-place update.
        ``cache_dtype='int8'`` quantizes the self K/V cache with per-
        (row, head, position) fp32 scales (halved decode HBM traffic —
        docs/PERF.md round 3); unsupported combined with anc_mode."""
        head_dim = self.d_model // self.nhead
        k_cross, v_cross = self.cross_attn.project_kv_decode(memory)
        k_shape = (
            (batch, self.nhead, max_len, head_dim) if anc_mode
            else (batch, self.nhead, head_dim, max_len)
        )
        self_cache = {
            "k": jnp.zeros(k_shape, dtype),
            "v": jnp.zeros((batch, self.nhead, max_len, head_dim), dtype),
            "index": jnp.zeros((), jnp.int32),
        }
        cache = {
            "self": self_cache,
            "cross_k": k_cross,
            "cross_v": v_cross,
        }
        if cache_dtype == "int8" and not anc_mode:
            self_cache["k"] = jnp.zeros(k_shape, jnp.int8)
            self_cache["v"] = jnp.zeros(
                (batch, self.nhead, max_len, head_dim), jnp.int8)
            sc_shape = (batch, self.nhead, 1, max_len)
            self_cache["k_scale"] = jnp.zeros(sc_shape, jnp.float32)
            self_cache["v_scale"] = jnp.zeros(sc_shape, jnp.float32)
            # cross K/V are computed once per utterance but READ every
            # step — quantize them too (per (utt, head, enc-position)
            # scales, same dequant ride as the self cache)
            kf = k_cross.astype(jnp.float32)  # (B, H, Dh, S)
            s_k = jnp.maximum(jnp.max(jnp.abs(kf), axis=2, keepdims=True),
                              1e-6) / 127.0  # (B, H, 1, S)
            cache["cross_k"] = jnp.clip(
                jnp.round(kf / s_k), -127, 127).astype(jnp.int8)
            cache["cross_k_scale"] = s_k
            vf = v_cross.astype(jnp.float32)  # (B, H, S, Dh)
            s_v = jnp.maximum(jnp.max(jnp.abs(vf), axis=3, keepdims=True),
                              1e-6) / 127.0  # (B, H, S, 1)
            cache["cross_v"] = jnp.clip(
                jnp.round(vf / s_v), -127, 127).astype(jnp.int8)
            cache["cross_v_scale"] = jnp.swapaxes(s_v, 2, 3)  # (B, H, 1, S)
        return cache

    def step(self, x, cache, cross_bias=None, beam: int = 1, anc=None):
        h = self.norm1(x) if self.normalize_before else x
        if anc is not None:
            h, self_cache = self.self_attn.step_anc(
                h, cache["self"], anc, beam
            )
        else:
            # beam > 1 ⇒ the cache arrives through the parent gather each
            # step; the fused where-append rides the gather's output write
            # for free. Ragged caches (per-row index (B,1,1,1) — continuous
            # batching) MUST use the fused where-append: dynamic_update_slice
            # needs a scalar start index, the broadcast select does not.
            ragged = jnp.ndim(cache["self"]["index"]) > 0
            h, self_cache = self.self_attn.step(
                h, cache["self"], fused_update=(beam > 1) or ragged
            )
        cross_scales = None
        if "cross_k_scale" in cache:  # int8 cross cache
            cross_scales = (cache["cross_k_scale"], cache["cross_v_scale"])
        if self.normalize_before:
            x = x + h
            h = self.cross_attn.step_cross(
                self.norm2(x), cache["cross_k"], cache["cross_v"],
                cross_bias, beam, cross_scales,
            )
            x = x + h
            x = x + self.ffn.step(self.norm3(x))
        else:
            x = self.norm1(x + h)
            h = self.cross_attn.step_cross(
                x, cache["cross_k"], cache["cross_v"], cross_bias, beam,
                cross_scales,
            )
            x = self.norm2(x + h)
            x = self.norm3(x + self.ffn.step(x))
        return x, {**cache, "self": self_cache}

    def step_window(self, x, cache, cross_bias=None):
        """Windowed decode step (speculative verification): x (B, w, d).

        Same residual structure as ``step``; self-attention through
        ``MultiHeadAttention.step_window`` (one causal (w, S) tile),
        cross-attention through ``step_cross`` with the window riding as
        the query length (beam=w) so the per-utterance encoder K/V is
        read once for the whole window.
        """
        B, w, d = x.shape
        h = self.norm1(x) if self.normalize_before else x
        h, self_cache = self.self_attn.step_window(h, cache["self"])
        cross_scales = None
        if "cross_k_scale" in cache:  # int8 cross cache
            cross_scales = (cache["cross_k_scale"], cache["cross_v_scale"])
        if self.normalize_before:
            x = x + h
            q = self.norm2(x).reshape(B * w, 1, d)
            h = self.cross_attn.step_cross(
                q, cache["cross_k"], cache["cross_v"], cross_bias, w,
                cross_scales,
            ).reshape(B, w, d)
            x = x + h
            x = x + self.ffn.step(self.norm3(x))
        else:
            x = self.norm1(x + h)
            q = x.reshape(B * w, 1, d)
            h = self.cross_attn.step_cross(
                q, cache["cross_k"], cache["cross_v"], cross_bias, w,
                cross_scales,
            ).reshape(B, w, d)
            x = self.norm2(x + h)
            x = self.norm3(x + self.ffn.step(x))
        return x, {**cache, "self": self_cache}


class TransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    nhead: int
    d_ffn: int
    dropout: float = 0.1
    activation: Callable = jax.nn.gelu
    normalize_before: bool = True
    attention_type: str = "regularMHA"
    remat: bool = False  # per-layer rematerialization (large presets)

    def setup(self):
        layer_cls = (
            nn.remat(EncoderLayer, static_argnums=(3,))
            if self.remat else EncoderLayer
        )
        self.layers = [
            layer_cls(
                self.d_model, self.nhead, self.d_ffn, self.dropout,
                self.activation, self.normalize_before, self.attention_type,
                name=f"layer_{i}"
            )
            for i in range(self.num_layers)
        ]
        self.final_norm = nn.LayerNorm(name="final_norm")

    def __call__(self, x, bias=None, deterministic=True):
        for layer in self.layers:
            x = layer(x, bias, deterministic)
        return self.final_norm(x)


class TransformerDecoder(nn.Module):
    num_layers: int
    d_model: int
    nhead: int
    d_ffn: int
    dropout: float = 0.1
    activation: Callable = jax.nn.gelu
    normalize_before: bool = True

    def setup(self):
        self.layers = [
            DecoderLayer(
                self.d_model, self.nhead, self.d_ffn, self.dropout,
                self.activation, self.normalize_before, name=f"layer_{i}"
            )
            for i in range(self.num_layers)
        ]
        self.final_norm = nn.LayerNorm(name="final_norm")

    def __call__(self, x, memory, self_bias=None, cross_bias=None,
                 deterministic=True):
        attn = None
        for layer in self.layers:
            x, attn = layer(x, memory, self_bias, cross_bias, deterministic)
        return self.final_norm(x), attn

    def init_cache(self, batch: int, max_len: int, memory,
                   dtype=jnp.float32, beam: int = 1, anc_mode: bool = False,
                   cache_dtype=None):
        return [
            layer.init_cache(batch, max_len, memory, dtype, beam, anc_mode,
                             cache_dtype)
            for layer in self.layers
        ]

    def step(self, x, caches, cross_bias=None, beam: int = 1, anc=None):
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            x, cache = layer.step(x, cache, cross_bias, beam, anc)
            new_caches.append(cache)
        return self.final_norm(x), new_caches

    def step_window(self, x, caches, cross_bias=None):
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            x, cache = layer.step_window(x, cache, cross_bias)
            new_caches.append(cache)
        return self.final_norm(x), new_caches
