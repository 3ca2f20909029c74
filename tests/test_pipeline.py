"""Pipeline parallelism: GPipe schedule == sequential layer stack, forward
and backward, alone and composed with data parallelism."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stac_st_tpu.parallel.pipeline import (
    make_pipe_mesh,
    pipeline_apply,
    stack_layer_params,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _mlp_layer(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _make_params(n_layers, d, seed=0):
    r = np.random.default_rng(seed)
    return [
        {
            "w": jnp.asarray(r.standard_normal((d, d)).astype(np.float32) / np.sqrt(d)),
            "b": jnp.asarray(r.standard_normal((d,)).astype(np.float32) * 0.1),
        }
        for _ in range(n_layers)
    ]


def _sequential(per_layer, x):
    for p in per_layer:
        x = _mlp_layer(p, x)
    return x


class TestPipelineApply:
    def test_matches_sequential_one_layer_per_stage(self, rng):
        d = 16
        per_layer = _make_params(4, d)
        x = jnp.asarray(rng.standard_normal((8, d)).astype(np.float32))
        mesh = make_pipe_mesh(data=1, pipe=4)
        out = pipeline_apply(
            _mlp_layer, stack_layer_params(per_layer), x, mesh=mesh
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_sequential(per_layer, x)),
            rtol=1e-5, atol=1e-5,
        )

    def test_matches_sequential_two_layers_per_stage(self, rng):
        d = 8
        per_layer = _make_params(8, d, seed=3)
        x = jnp.asarray(rng.standard_normal((12, d)).astype(np.float32))
        mesh = make_pipe_mesh(data=1, pipe=4)
        out = pipeline_apply(
            _mlp_layer, stack_layer_params(per_layer), x, mesh=mesh,
            num_microbatches=6,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_sequential(per_layer, x)),
            rtol=1e-5, atol=1e-5,
        )

    def test_dp_pp_composition(self, rng):
        """(data=2, pipe=4): batch halves pipeline independently, results
        equal the unsharded sequential stack."""
        d = 8
        per_layer = _make_params(4, d, seed=5)
        x = jnp.asarray(rng.standard_normal((16, d)).astype(np.float32))
        mesh = make_pipe_mesh(data=2, pipe=4)
        out = pipeline_apply(
            _mlp_layer, stack_layer_params(per_layer), x, mesh=mesh,
            data_axis="data", num_microbatches=4,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_sequential(per_layer, x)),
            rtol=1e-5, atol=1e-5,
        )

    def test_gradients_match_sequential(self, rng):
        d = 8
        per_layer = _make_params(4, d, seed=7)
        stacked = stack_layer_params(per_layer)
        x = jnp.asarray(rng.standard_normal((8, d)).astype(np.float32))
        mesh = make_pipe_mesh(data=1, pipe=4)

        def loss_pipe(params):
            return jnp.sum(
                pipeline_apply(_mlp_layer, params, x, mesh=mesh) ** 2
            )

        def loss_seq(params):
            def body(h, p):
                return _mlp_layer(p, h), None

            h, _ = jax.lax.scan(body, x, params)
            return jnp.sum(h ** 2)

        g_pipe = jax.grad(loss_pipe)(stacked)
        g_seq = jax.grad(loss_seq)(stacked)
        for a, b in zip(jax.tree_util.tree_leaves(g_pipe),
                        jax.tree_util.tree_leaves(g_seq)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )

    def test_layer_count_mismatch_raises(self, rng):
        per_layer = _make_params(6, 8)
        mesh = make_pipe_mesh(data=1, pipe=4)
        with pytest.raises(ValueError, match="not divisible"):
            pipeline_apply(
                _mlp_layer, stack_layer_params(per_layer),
                jnp.zeros((8, 8)), mesh=mesh,
            )


class TestRealEncoderLayerPipeline:
    def test_transformer_encoder_layers_pipelined(self, rng):
        """The real EncoderLayer (self-attn + FFN) pipelined over 4 stages,
        with the per-example attention bias riding as `extra`, matches the
        sequential stack."""
        from stac_st_tpu.models.transformer import EncoderLayer

        d, h, ffn, B, T = 16, 4, 32, 8, 10
        layer = EncoderLayer(d, h, ffn, 0.0, jax.nn.gelu, True, "regularMHA")
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        x = jnp.asarray(rng.standard_normal((B, T, d)).astype(np.float32))
        # padding bias: last 3 frames of half the batch masked
        mask = np.zeros((B, 1, 1, T), np.float32)
        mask[B // 2:, ..., -3:] = -1e9
        bias = jnp.asarray(mask)
        per_layer = [layer.init(k, x, bias, True) for k in keys]

        def layer_fn(p, xx, b):
            return layer.apply(p, xx, b, True)

        seq = x
        for p in per_layer:
            seq = layer.apply(p, seq, bias, True)

        mesh = make_pipe_mesh(data=1, pipe=4)
        out = pipeline_apply(
            layer_fn, stack_layer_params(per_layer), x, mesh=mesh,
            num_microbatches=4, extra=bias,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(seq), rtol=2e-4, atol=2e-4
        )


class TestPipelinedEncode:
    def test_pipelined_encode_matches_sequential(self, rng):
        """model.encode == pipelined_encode on a (pipe=4) CPU mesh, with
        and without padding masks."""
        import numpy as np

        from stac_st_tpu.models import TransformerMultiTask
        from stac_st_tpu.parallel.pipeline import make_pipe_mesh
        from stac_st_tpu.parallel.pipeline_encoder import pipelined_encode

        model = TransformerMultiTask(
            tgt_vocab=30, input_size=16, d_model=32, nhead=4,
            num_encoder_layers=4, num_decoder_layers=1, d_ffn=64,
            dropout=0.0, normalize_before=True,
        )
        src = jnp.asarray(
            np.random.default_rng(0).standard_normal((4, 12, 16)),
            jnp.float32,
        )
        tgt = jnp.ones((4, 3), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), src, tgt)
        mesh = make_pipe_mesh(data=1, pipe=4)

        for wav_len in (None, jnp.asarray([1.0, 0.9, 0.6, 0.4])):
            want = model.apply(params, src, wav_len, method=model.encode)
            got = pipelined_encode(
                model, params, src, wav_len, mesh=mesh,
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-5
            )

    def test_pipelined_encode_dp_composition(self, rng):
        import numpy as np

        from stac_st_tpu.models import TransformerMultiTask
        from stac_st_tpu.parallel.pipeline import make_pipe_mesh
        from stac_st_tpu.parallel.pipeline_encoder import pipelined_encode

        model = TransformerMultiTask(
            tgt_vocab=30, input_size=16, d_model=32, nhead=4,
            num_encoder_layers=2, num_decoder_layers=1, d_ffn=64,
            dropout=0.0, normalize_before=True,
        )
        src = jnp.asarray(
            np.random.default_rng(1).standard_normal((8, 10, 16)),
            jnp.float32,
        )
        params = model.init(
            jax.random.PRNGKey(0), src, jnp.ones((8, 3), jnp.int32)
        )
        mesh = make_pipe_mesh(data=2, pipe=2)
        want = model.apply(params, src, method=model.encode)
        got = pipelined_encode(
            model, params, src, mesh=mesh, data_axis="data",
            num_microbatches=2,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )
