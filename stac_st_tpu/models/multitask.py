"""TransformerMultiTask: the joint ASR+ST encoder-decoder (flax).

TPU-native rebuild of the reference model
(``stac-st/modules/TransformerMultiTask.py:24-314``): Linear source
projection + dropout, NormalizedEmbedding targets, fixed sinusoidal
positional encodings, pre-LN Transformer encoder/decoder, with separate
``encode`` / ``decode`` / KV-cached ``decode_step`` paths. Mask semantics
follow the reference exactly (round-based padding in forward, floor-based in
encode — ``TransformerMultiTask.py:223-232`` vs ``:289-294``).

The YAML-facing classes here (``TransformerMultiTask``, ``LinearHead``,
``ModuleGroup``, ``EncoderWrapper``) are what the registry redirects the
reference hparams onto (``transformer_multitask.yaml:183-220``).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import masks as M
from .positional import sinusoidal_table
from .transformer import (
    NormalizedEmbedding,
    TransformerDecoder,
    TransformerEncoder,
    dq_dense_params,
)

__all__ = ["TransformerMultiTask", "LinearHead", "ModuleGroup",
           "EncoderWrapper"]

_glorot = nn.initializers.glorot_normal()


def _as_callable(activation: Any) -> Callable:
    if activation is None:
        return jax.nn.gelu
    act = activation() if isinstance(activation, type) else activation
    return act if callable(act) else jax.nn.gelu


class TransformerMultiTask(nn.Module):
    """Encoder-decoder over conv features; task selected by decoder prompt."""

    tgt_vocab: int
    input_size: int
    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    d_ffn: int = 2048
    dropout: float = 0.1
    activation: Any = None
    positional_encoding: str = "fixed_abs_sine"
    normalize_before: bool = False
    kernel_size: int = 31
    bias: bool = True
    encoder_module: str = "transformer"
    conformer_activation: Any = None
    attention_type: str = "regularMHA"
    max_length: int = 2500
    causal: bool = False
    remat: bool = False   # rematerialize encoder layers (large presets)

    def setup(self):
        if self.attention_type not in ("regularMHA", "RelPosMHAXL"):
            raise NotImplementedError(
                f"attention_type={self.attention_type!r}"
            )
        if self.encoder_module not in ("transformer", "conformer"):
            raise NotImplementedError(
                f"encoder_module={self.encoder_module!r}"
            )
        act = _as_callable(self.activation)
        self.src_proj = nn.Dense(
            self.d_model, kernel_init=_glorot, name="src_proj"
        )
        self.src_drop = nn.Dropout(rate=self.dropout)
        self.tgt_embed = NormalizedEmbedding(
            self.d_model, self.tgt_vocab, name="tgt_embed"
        )
        if self.encoder_module == "conformer":
            from .conformer import ConformerEncoder

            conf_act = _as_callable(self.conformer_activation) if (
                self.conformer_activation is not None
            ) else jax.nn.silu
            self.encoder = ConformerEncoder(
                self.num_encoder_layers, self.d_model, self.nhead,
                self.d_ffn, self.kernel_size, self.dropout, conf_act,
                self.attention_type, self.causal, name="encoder",
            )
        else:
            self.encoder = TransformerEncoder(
                self.num_encoder_layers, self.d_model, self.nhead,
                self.d_ffn, self.dropout, act, self.normalize_before,
                self.attention_type, self.remat, name="encoder",
            )
        # the decoder is always a Transformer (reference
        # TransformerMultiTask.py:62-63); with RelPosMHAXL the reference's
        # decode path adds plain sinusoidal PE (:253-256), so the decoder is
        # absolute-position in both modes.
        self.decoder = TransformerDecoder(
            self.num_decoder_layers, self.d_model, self.nhead, self.d_ffn,
            self.dropout, act, self.normalize_before, name="decoder",
        )
        self.pe = jnp.asarray(sinusoidal_table(self.max_length, self.d_model))
        # absolute PE is added to the encoder input only in the
        # fixed_abs_sine + transformer configuration (reference forward,
        # TransformerMultiTask.py:172-176)
        self._encoder_abs_pe = self.attention_type == "regularMHA"

    # ------------------------------------------------------------- helpers
    @staticmethod
    def _flatten_src(src):
        if src.ndim == 4:
            b, t, c1, c2 = src.shape
            src = src.reshape(b, t, c1 * c2)
        return src

    def _add_pe(self, x):
        return x + self.pe[None, : x.shape[1], :].astype(x.dtype)

    # ------------------------------------------------------------- forward
    def __call__(self, src, tgt, wav_len=None, pad_idx: int = 0,
                 deterministic: bool = True):
        """Teacher-forced training forward -> (encoder_out, decoder_out)."""
        src = self._flatten_src(src)
        S = src.shape[1]
        T = tgt.shape[1]

        src_bias = None
        if wav_len is not None:
            src_pad = M.src_key_padding_mask(wav_len, S)  # (B, S)
            src_bias = M.additive_bias(src_pad[:, None, None, :])

        h = self.src_drop(self.src_proj(src), deterministic=deterministic)
        if self._encoder_abs_pe:
            h = self._add_pe(h)
        if self.encoder_module == "conformer":
            pad = (
                M.src_key_padding_mask(wav_len, S)
                if wav_len is not None else None
            )
            enc_out = self.encoder(h, src_bias, pad, deterministic)
        else:
            enc_out = self.encoder(h, src_bias, deterministic)

        dec_out = self.forward_decoder(
            tgt, enc_out, wav_len, pad_idx, deterministic
        )
        return enc_out, dec_out

    def forward_decoder(self, tgt, encoder_out, wav_len=None,
                        pad_idx: int = 0, deterministic: bool = True):
        """Decoder half of the teacher-forced forward (training mask
        semantics: target padding + lookahead, round-based cross padding —
        reference ``TransformerMultiTask.forward``, :172-209). Split out so
        the pipeline-parallel training step can pair it with a pipelined
        encoder pass (parallel/pipeline_encoder.py)."""
        T = tgt.shape[1]
        S = encoder_out.shape[1]
        cross_bias = None
        if wav_len is not None:
            src_pad = M.src_key_padding_mask(wav_len, S)  # (B, S)
            cross_bias = M.additive_bias(src_pad[:, None, None, :])
        tgt_pad = M.tgt_key_padding_mask(tgt, pad_idx)  # (B, T)
        self_bias = M.additive_bias(
            M.lookahead_mask(T)[None, None, :, :]
            | tgt_pad[:, None, None, :]
        )
        d = self._add_pe(self.tgt_embed(tgt))
        dec_out, _ = self.decoder(
            d, encoder_out, self_bias, cross_bias, deterministic
        )
        return dec_out

    # -------------------------------------------------------------- encode
    def encode(self, src, wav_len=None, deterministic: bool = True):
        """Inference encoder pass (reference ``encode``, floor-based mask)."""
        src = self._flatten_src(src)
        S = src.shape[1]
        src_bias = None
        if wav_len is not None:
            src_pad = M.src_key_padding_mask_encode(wav_len, S)
            src_bias = M.additive_bias(src_pad[:, None, None, :])
        h = self.src_drop(self.src_proj(src), deterministic=deterministic)
        if self._encoder_abs_pe:
            h = self._add_pe(h)
        if self.encoder_module == "conformer":
            pad = (
                M.src_key_padding_mask_encode(wav_len, S)
                if wav_len is not None else None
            )
            return self.encoder(h, src_bias, pad, deterministic)
        return self.encoder(h, src_bias, deterministic)

    # ------------------------------------------------- full-prefix decode
    def decode(self, tgt, encoder_out, enc_len=None):
        """Oracle full-prefix decode (reference ``decode``; no KV cache).

        enc_len: absolute encoder lengths (reference passes None in the
        shipped beam search — ``mutitask_decoder.py:126``).
        """
        T = tgt.shape[1]
        self_bias = M.additive_bias(M.lookahead_mask(T)[None, None, :, :])
        cross_bias = None
        if enc_len is not None:
            S = encoder_out.shape[1]
            pad = jnp.arange(S)[None, :] >= enc_len[:, None]
            cross_bias = M.additive_bias(pad[:, None, None, :])
        d = self._add_pe(self.tgt_embed(tgt))
        out, attn = self.decoder(d, encoder_out, self_bias, cross_bias, True)
        return out, attn

    # --------------------------------------------------- KV-cached decode
    def init_decode_cache(self, encoder_out, max_len: int,
                          enc_mask_bias=None, beam: int = 1,
                          anc_mode: bool = False, cache_dtype=None):
        """Build the functional decode cache.

        encoder_out: (B, S, d) — per-utterance, UNTILED even for beam > 1:
        cross-attention K/V is beam-invariant, so it is stored once per
        utterance and shared at attention time (docs/PERF.md). Self caches
        are allocated at B·beam rows. enc_mask_bias: (B, 1, 1, S).

        anc_mode=True (gather-free beam decode, Pallas): the cache carries
        an ancestor table ``anc`` (B, beam, max_len) int32 instead of being
        physically reordered by the searcher each step; self-attention
        resolves ancestry inside the kernel (zero extra HBM traffic)."""
        B = encoder_out.shape[0]
        caches = self.decoder.init_cache(
            B * beam, max_len, encoder_out, dtype=encoder_out.dtype,
            beam=beam, anc_mode=anc_mode, cache_dtype=cache_dtype,
        )
        cache = {"layers": caches, "enc_bias": enc_mask_bias}
        if anc_mode:
            cache["anc"] = jnp.tile(
                jnp.arange(beam, dtype=jnp.int32)[None, :, None],
                (B, 1, max_len),
            )
        return cache

    @staticmethod
    def grow_decode_cache(cache, new_max_len: int):
        """Re-allocate the decode cache at a larger step budget.

        Pads every self-attention K/V buffer (and the ancestor table in
        anc mode) with zeros along the step axis, preserving contents and
        the write index — the basis for segmented cache growth in the
        searcher: per-step HBM cache reads scale with the ALLOCATED
        length, so decoding in growing segments makes total read traffic
        ~triangular instead of rectangular (docs/PERF.md round 3)."""
        anc_mode = cache.get("anc") is not None
        layers = []
        for layer in cache["layers"]:
            sc = layer["self"]
            k, v = sc["k"], sc["v"]
            if anc_mode:  # K stored like V: (BB, H, S, Dh)
                k = jnp.pad(
                    k, ((0, 0), (0, 0), (0, new_max_len - k.shape[2]),
                        (0, 0))
                )
            else:  # decode layout Kᵀ: (BB, H, Dh, S)
                k = jnp.pad(
                    k, ((0, 0), (0, 0), (0, 0),
                        (0, new_max_len - k.shape[3]))
                )
            v = jnp.pad(
                v, ((0, 0), (0, 0), (0, new_max_len - v.shape[2]), (0, 0))
            )
            new_self = {"k": k, "v": v, "index": sc["index"]}
            for sc_name in ("k_scale", "v_scale"):  # int8 cache mode
                if sc_name in sc:
                    s = sc[sc_name]
                    new_self[sc_name] = jnp.pad(
                        s, ((0, 0), (0, 0), (0, 0),
                            (0, new_max_len - s.shape[3]))
                    )
            layers.append({**layer, "self": new_self})
        out = {**cache, "layers": layers}
        if anc_mode:
            anc = cache["anc"]
            out["anc"] = jnp.pad(
                anc, ((0, 0), (0, 0), (0, new_max_len - anc.shape[2]))
            )
        return out

    @staticmethod
    def set_cache_index(cache, index):
        """Rewind (or set) the decode cache's write index.

        Speculative decoding appends a whole verification window
        provisionally and then keeps only the accepted prefix: the
        rewind is just the index — rows past it are masked by the causal
        bias and are overwritten by the next window before they can
        become visible (windows always restart at the rewound index).
        """
        layers = [
            {**layer, "self": {**layer["self"], "index": index}}
            for layer in cache["layers"]
        ]
        return {**cache, "layers": layers}

    def decode_window(self, tokens, position, cache):
        """Windowed decode (speculative verification).

        tokens: (B, w) int32 inputs for positions position..position+w-1
        (``position`` must equal the cache write index); returns
        ((B, w, d) hidden states, cache with the index advanced by w).
        Equivalent to w sequential ``decode_step`` calls; the caller
        rewinds the index to the accepted length via
        ``set_cache_index``.
        """
        B, w = tokens.shape
        emb = self.tgt_embed(tokens)  # (B, w, d)
        pos = jnp.reshape(jnp.asarray(position), ())
        pe = jax.lax.dynamic_slice_in_dim(self.pe, pos, w, axis=0)  # (w, d)
        emb = emb + pe[None, :, :].astype(emb.dtype)
        out, new_layers = self.decoder.step_window(
            emb, cache["layers"], cache["enc_bias"]
        )
        return out, {**cache, "layers": new_layers}

    def decode_step_rows(self, tokens, positions, cache):
        """One decode step with PER-ROW positions (continuous batching).

        tokens: (R,) int32 current input token per slot; positions: (R,)
        int32 per-slot cache write index (each slot is at a different
        decode depth); cache: as ``init_decode_cache`` but with every
        self-attention ``index`` reshaped to (R, 1, 1, 1) — the fused
        where-append and the causal bias broadcast over it, so ragged
        slots advance independently inside ONE batched step (the device
        never sees the raggedness: static shapes, one program). beam is
        1 by construction (one hypothesis per serving slot). Returns
        ((R, d) hidden, cache with every slot's index advanced by 1).
        """
        emb = self.tgt_embed(tokens[:, None])  # (R, 1, d)
        pos = jnp.clip(positions, 0, self.pe.shape[0] - 1)
        pe = jnp.take(self.pe, pos, axis=0)  # (R, d)
        emb = emb + pe[:, None, :].astype(emb.dtype)
        out, new_layers = self.decoder.step(
            emb, cache["layers"], cache["enc_bias"], 1
        )
        return out[:, 0, :], {**cache, "layers": new_layers}

    def decode_step(self, tokens, positions, cache):
        """One decode step.

        tokens: (B·beam,) int32 current input tokens;
        positions: () int32 position index (for the PE lookup);
        cache: from init_decode_cache. Returns ((B·beam, d) hidden, cache).
        """
        emb = self.tgt_embed(tokens[:, None])  # (BB, 1, d)
        pos = jnp.asarray(positions)
        pe = jax.lax.dynamic_slice_in_dim(
            self.pe, jnp.reshape(pos, ()), 1, axis=0
        )  # (1, d) — scalar position (shared across batch)
        emb = emb + pe[None, :, :].astype(emb.dtype)
        # beam is recovered from static shapes: self caches hold B·beam
        # rows while the shared cross K/V holds B rows.
        bb = emb.shape[0]
        b_cross = cache["layers"][0]["cross_k"].shape[0]
        beam = bb // b_cross
        out, new_layers = self.decoder.step(
            emb, cache["layers"], cache["enc_bias"], beam,
            anc=cache.get("anc"),
        )
        return out[:, 0, :], {**cache, "layers": new_layers}


class LinearHead(nn.Module):
    """Output projection head (reference ``speechbrain.nnet.linear.Linear``,
    yaml:199-206 — seq_lin / ctc_lin)."""

    input_size: int
    n_neurons: int
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.variables.get("params", {}).get("linear")
        if p is not None and p["kernel"].dtype == jnp.int8:
            # weight-only int8 head (utils/quantize.py): the (d, vocab)
            # kernel is read EVERY decode step; dequant-on-read halves it
            return dq_dense_params(p, x)
        return nn.Dense(
            self.n_neurons, use_bias=self.bias, kernel_init=_glorot,
            name="linear",
        )(x)


class ModuleGroup:
    """Stand-in for ``torch.nn.ModuleList`` groupings in YAML (yaml:219-220).

    Purely organizational: parameters live in the train state; this records
    which YAML-level modules form the checkpointed "model" recoverable.
    """

    def __init__(self, modules: Sequence[Any]):
        self.modules = list(modules)

    def __iter__(self):
        return iter(self.modules)

    def __len__(self):
        return len(self.modules)


class EncoderWrapper:
    """Reference ``EncoderWrapper``: forward == encode (TransformerMultiTask.py:317-349)."""

    def __init__(self, transformer: TransformerMultiTask, *a, **k):
        self.transformer = transformer

    def __call__(self, params, x, wav_lens=None):
        return self.transformer.apply(
            params, x, wav_lens, method=TransformerMultiTask.encode
        )
