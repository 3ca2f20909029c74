"""Pallas kernel parity tests (interpret mode — runs on the CPU mesh)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stac_st_tpu.ops.pallas.attention import flash_attention


def _reference_attention(q, k, v, bias=None):
    Dh = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (Dh ** 0.5)
    if bias is not None:
        logits = logits + bias[:, None, None, :]
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


class TestFlashAttention:
    @pytest.mark.parametrize("B,T,H,Dh", [(2, 64, 4, 64), (1, 200, 2, 64)])
    def test_matches_reference(self, rng, B, T, H, Dh):
        q = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        out = flash_attention(q, k, v, interpret=True)
        ref = _reference_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_padding_bias(self, rng):
        B, T, H, Dh = 2, 96, 2, 64
        q = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        bias = jnp.where(
            jnp.arange(T)[None, :] < 60, 0.0, -1e9
        ).astype(jnp.float32).repeat(B, axis=0).reshape(B, T)
        out = flash_attention(q, k, v, bias, interpret=True)
        ref = _reference_attention(q, k, v, bias)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )
