"""Weight-only int8 quantization for the decode hot path (serving).

Every beam-search decode step re-reads ALL decoder weights from HBM
(16·d_model²·n_layers bytes in bf16 — 201 MB/step for the large
preset). At full-budget row counts that stream is 1.4× over its int8
cost; at latency-serving row counts (a single utterance × beam 10) it
is 4× (measured: tools/exp_weight_int8.py — the int8→bf16 convert
fuses into the matmul operand load, 639 → 163 µs/step at 10 rows,
75% of HBM speed-of-light; the convert is NOT hoisted out of the
while_loop even though the weights are loop-invariant).

This module rewrites the param leaves the decode path reads per step:

* decoder self-attention q/k/v/out projections (``_fused_qkv`` and
  the out-proj of every step variant dequantize them on read);
* decoder cross-attention q/out projections — NOT k/v: those run once
  per utterance in ``project_kv_decode`` during the encode phase, on
  many rows (compute-bound), and stay float;
* decoder FFN fc1/fc2 (``FeedForward.step``);
* the seq_lin output head's (d_model, vocab) kernel (``LinearHead``).

Encoder, embedding, CNN, CTC head and CMVN are untouched — they run
once per utterance over many rows. Quantization is symmetric int8 with
one fp32 scale per OUTPUT column (max|W[:, j]|/127).

Quantized params drive ONLY the KV-cached decode path (``decode_step``
/ beam search / the serving engine); the teacher-forced ``__call__``
and the full-prefix ``decode`` oracle use plain ``nn.Dense`` and must
keep float params. Opt-in (quantization noise can reorder near-tied
beams): ``STEngine(weights_int8=True)`` / ``serve --weights-int8``.

Reference context: the reference has no quantized inference at all
(fp16 autocast at best, ``train_multitask.py:321-337``); this is a
TPU-serving addition, measured in docs/PERF.md round 3.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

__all__ = ["quantize_dense_params", "quantize_decode_weights"]


def quantize_dense_params(p: Dict[str, Any]) -> Dict[str, Any]:
    """{"kernel", "bias"?} → int8 kernel + per-output-column fp32 scale.

    The scale stays fp32 regardless of the engine's bf16 param cast
    (it multiplies the matmul's f32 accumulator — dq_dense_params).
    """
    k = jnp.asarray(p["kernel"], jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(k), axis=0), 1e-8) / 127.0
    kq = jnp.clip(jnp.round(k / s), -127, 127).astype(jnp.int8)
    out = {"kernel": kq, "kernel_scale": s}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def _quantize_decoder_layer(layer: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(layer)
    sa = dict(layer["self_attn"])
    for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
        sa[name] = quantize_dense_params(sa[name])
    out["self_attn"] = sa
    ca = dict(layer["cross_attn"])
    for name in ("q_proj", "out_proj"):  # k/v: encode-phase, stay float
        ca[name] = quantize_dense_params(ca[name])
    out["cross_attn"] = ca
    ffn = dict(layer["ffn"])
    for name in ("fc1", "fc2"):
        ffn[name] = quantize_dense_params(ffn[name])
    out["ffn"] = ffn
    return out


def quantize_decode_weights(
    transformer_params: Dict[str, Any],
    seq_lin_params: Optional[Dict[str, Any]] = None,
) -> Tuple[Dict[str, Any], Optional[Dict[str, Any]]]:
    """Quantize the decode-path weights of a TransformerMultiTask param
    tree (+ optionally the seq_lin head). Returns new trees; inputs are
    not mutated. Layers are matched by the ``decoder/layer_*`` naming.
    """
    root = dict(transformer_params)
    params = dict(root["params"])
    dec = dict(params["decoder"])
    for name, sub in dec.items():
        if name.startswith("layer_"):
            dec[name] = _quantize_decoder_layer(sub)
    params["decoder"] = dec
    root["params"] = params

    q_seq = None
    if seq_lin_params is not None:
        q_seq = dict(seq_lin_params)
        q_p = dict(q_seq["params"])
        q_p["linear"] = quantize_dense_params(q_p["linear"])
        q_seq["params"] = q_p
    return root, q_seq
