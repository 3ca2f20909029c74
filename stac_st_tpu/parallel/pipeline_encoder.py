"""Pipelined TransformerMultiTask.encode (GPipe over the encoder stack).

Wires :func:`stac_st_tpu.parallel.pipeline.pipeline_apply` into the model:
the encoder's L layers shard over the mesh's ``pipe`` axis (L/P per stage),
microbatches ride a ``ppermute`` ring, and the prelude (source projection,
positional encoding, padding masks) plus the final norm stay replicated.
Numerically identical to the sequential ``model.encode``
(tests/test_pipeline.py::test_pipelined_encode_matches_sequential).

Enable via the ``pipeline_stages`` hparam on the large presets
(``ablations/run_m_and_l_size.py``); the reference's scale grid
(``run_m_and_l_size.sh:72-99``) is single-node DDP — this is the TPU-native
scale-out past what data/tensor parallelism alone serves.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..models.multitask import TransformerMultiTask, _as_callable
from ..models.transformer import EncoderLayer
from ..ops import masks as M
from .pipeline import (
    pipeline_apply,
    pipeline_apply_sequential,
    stack_layer_params,
)

__all__ = ["pipelined_encode", "pipelined_encode_train"]


def _encoder_layer_def(model: TransformerMultiTask) -> EncoderLayer:
    if model.encoder_module != "transformer":
        raise NotImplementedError(
            "pipelined encode supports the transformer encoder"
        )
    return EncoderLayer(
        model.d_model, model.nhead, model.d_ffn, model.dropout,
        _as_callable(model.activation), model.normalize_before,
        model.attention_type,
    )


def pipelined_encode(
    model: TransformerMultiTask,
    params: Any,
    src: jax.Array,
    wav_len: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    data_axis: Optional[str] = None,
    num_microbatches: Optional[int] = None,
) -> jax.Array:
    """Inference encoder pass == ``model.encode`` (floor-based mask), with
    the layer stack pipelined over ``mesh[axis]``."""
    p = params["params"] if "params" in params else params
    enc_params = p["encoder"]
    n_layers = model.num_encoder_layers
    stacked = stack_layer_params(
        [enc_params[f"layer_{i}"] for i in range(n_layers)]
    )

    # prelude (replicated): flatten, project, positional encoding, mask
    if src.ndim == 4:
        b, t, c1, c2 = src.shape
        src = src.reshape(b, t, c1 * c2)
    S = src.shape[1]
    h = src @ p["src_proj"]["kernel"] + p["src_proj"]["bias"]
    if model.attention_type == "regularMHA":
        from ..models.positional import sinusoidal_table

        pe = jnp.asarray(
            sinusoidal_table(model.max_length, model.d_model)
        )
        h = h + pe[None, :S, :].astype(h.dtype)
    bias = None
    if wav_len is not None:
        pad = M.src_key_padding_mask_encode(wav_len, S)
        bias = M.additive_bias(pad[:, None, None, :])

    layer_def = _encoder_layer_def(model)

    if bias is not None:
        def layer_fn(layer_params, x_mb, bias_mb):
            return layer_def.apply({"params": layer_params}, x_mb, bias_mb,
                                   True)
    else:
        def layer_fn(layer_params, x_mb):
            return layer_def.apply({"params": layer_params}, x_mb, None,
                                   True)

    h = pipeline_apply(
        layer_fn, stacked, h,
        mesh=mesh, axis=axis, data_axis=data_axis,
        num_microbatches=num_microbatches,
        extra=bias,
    )

    fn = p["encoder"]["final_norm"]
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.var(h, axis=-1, keepdims=True)
    h = (h - mean) / jnp.sqrt(var + 1e-6)
    return h * fn["scale"] + fn["bias"]


def pipelined_encode_train(
    model: TransformerMultiTask,
    params: Any,
    src: jax.Array,
    wav_len: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    data_axis: Optional[str] = None,
    num_microbatches: Optional[int] = None,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    sequential_reference: bool = False,
) -> jax.Array:
    """Teacher-forced-forward encoder pass with the layer stack pipelined.

    Mirrors the encoder half of ``TransformerMultiTask.__call__`` (ROUND-
    based padding mask — reference ``TransformerMultiTask.py:223-232``), so
    the training step can swap it in; pair with
    ``model.forward_decoder`` for the decoder half.

    With ``deterministic=False`` dropout runs inside the pipelined
    layers. The key schedule is the SPEC: key(microbatch m, layer l,
    data-shard d) = fold_in(fold_in(split(rest, M)[m], l), d), with flax's
    module-path folding below each layer key. It is a function of the
    (m, l, d) coordinates only — NOT of which stage executes the layer or
    of the GPipe tick order — so pipelined execution equals the
    sequential executor of the same schedule *exactly*, dropout on
    (``sequential_reference=True`` runs that executor —
    :func:`stac_st_tpu.parallel.pipeline.pipeline_apply_sequential`;
    ``dryrun_multichip`` asserts the equality at flagship shape). The
    stream differs from the unpipelined flax path's folding — both are
    valid i.i.d. dropout; cross-path parity tests compare deterministic
    passes.
    """
    p = params["params"] if "params" in params else params
    train = not deterministic
    if train and dropout_rng is None:
        raise ValueError("dropout_rng is required when deterministic=False")
    enc_params = p["encoder"]
    n_layers = model.num_encoder_layers
    stacked = stack_layer_params(
        [enc_params[f"layer_{i}"] for i in range(n_layers)]
    )

    # prelude (replicated): flatten, project, dropout, PE, ROUND-based mask
    if src.ndim == 4:
        b, t, c1, c2 = src.shape
        src = src.reshape(b, t, c1 * c2)
    S = src.shape[1]
    h = src @ p["src_proj"]["kernel"] + p["src_proj"]["bias"]
    if train and model.dropout > 0.0:
        key_pre, dropout_rng = jax.random.split(dropout_rng)
        keep = 1.0 - model.dropout
        mask = jax.random.bernoulli(key_pre, keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0).astype(h.dtype)
    if model.attention_type == "regularMHA":
        from ..models.positional import sinusoidal_table

        pe = jnp.asarray(sinusoidal_table(model.max_length, model.d_model))
        h = h + pe[None, :S, :].astype(h.dtype)
    bias = None
    if wav_len is not None:
        pad = M.src_key_padding_mask(wav_len, S)  # round (training forward)
        bias = M.additive_bias(pad[:, None, None, :])

    layer_def = _encoder_layer_def(model)
    M_ = int(num_microbatches) if num_microbatches else mesh.shape[axis]
    apply_fn = (
        pipeline_apply_sequential if sequential_reference else pipeline_apply
    )

    if train and model.dropout > 0.0:
        # per-layer indices ride the scanned params; per-microbatch keys
        # ride mb_extra; the data-shard index decorrelates DP shards.
        stacked = {"p": stacked,
                   "idx": jnp.arange(n_layers, dtype=jnp.int32)}
        mb_keys = jax.random.split(dropout_rng, M_)

        if bias is not None:
            def layer_fn(pk, x_mb, bias_mb, key_mb):
                key = jax.random.fold_in(key_mb, pk["idx"])
                if data_axis is not None:
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index(data_axis))
                return layer_def.apply(
                    {"params": pk["p"]}, x_mb, bias_mb, False,
                    rngs={"dropout": key})
        else:
            def layer_fn(pk, x_mb, key_mb):
                key = jax.random.fold_in(key_mb, pk["idx"])
                if data_axis is not None:
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index(data_axis))
                return layer_def.apply(
                    {"params": pk["p"]}, x_mb, None, False,
                    rngs={"dropout": key})

        h = apply_fn(
            layer_fn, stacked, h,
            mesh=mesh, axis=axis, data_axis=data_axis,
            num_microbatches=num_microbatches,
            extra=bias, mb_extra=mb_keys,
        )
    else:
        if bias is not None:
            def layer_fn(layer_params, x_mb, bias_mb):
                return layer_def.apply(
                    {"params": layer_params}, x_mb, bias_mb, True)
        else:
            def layer_fn(layer_params, x_mb):
                return layer_def.apply(
                    {"params": layer_params}, x_mb, None, True)

        h = apply_fn(
            layer_fn, stacked, h,
            mesh=mesh, axis=axis, data_axis=data_axis,
            num_microbatches=num_microbatches,
            extra=bias,
        )

    fn = p["encoder"]["final_norm"]
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.var(h, axis=-1, keepdims=True)
    h = (h - mean) / jnp.sqrt(var + 1e-6)
    return h * fn["scale"] + fn["bias"]
