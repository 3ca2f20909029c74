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


class TestPipelinedTraining:
    """Pipeline parallelism wired into the TRAIN path (VERDICT round-1 #9):
    pipelined teacher-forced encoder == sequential __call__, and the whole
    jitted train step (grads through the ppermute scan) matches the
    unpipelined step."""

    def test_encode_train_matches_forward(self, rng):
        from stac_st_tpu.models import TransformerMultiTask
        from stac_st_tpu.parallel.pipeline_encoder import (
            pipelined_encode_train,
        )

        model = TransformerMultiTask(
            tgt_vocab=30, input_size=16, d_model=32, nhead=4,
            num_encoder_layers=4, num_decoder_layers=1, d_ffn=64,
            dropout=0.0, normalize_before=True,
        )
        src = jnp.asarray(
            rng.standard_normal((4, 12, 16)).astype(np.float32))
        tgt = jnp.ones((4, 3), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), src, tgt)
        mesh = make_pipe_mesh(data=1, pipe=4)

        # the training forward uses the ROUND-based padding mask — compare
        # against __call__'s encoder output, not encode()'s
        wav_len = jnp.asarray([1.0, 0.9, 0.62, 0.37])
        want, _ = model.apply(params, src, tgt, wav_len)
        got = pipelined_encode_train(
            model, params, src, wav_len, mesh=mesh,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )
        # round vs floor masks differ on these lengths: encode() must NOT
        # match (guards against silently testing the wrong semantics)
        enc_infer = model.apply(params, src, wav_len, method=model.encode)
        assert np.abs(np.asarray(enc_infer) - np.asarray(want)).max() > 1e-4

    def _train_setup(self, dropout: float):
        from stac_st_tpu.models import (
            ConvolutionFrontEnd, LinearHead, TransformerMultiTask,
        )
        from stac_st_tpu.ops import Fbank
        from stac_st_tpu.training.optim import AdamW
        from stac_st_tpu.training.schedulers import WarmCoolDecayLRSchedule
        from stac_st_tpu.training.step import StepConfig, make_optimizer

        vocab, ch, d = 50, 8, 32
        cfg = StepConfig(
            fbank=Fbank(),
            cnn=ConvolutionFrontEnd(out_channels=(ch, ch)),
            transformer=TransformerMultiTask(
                tgt_vocab=vocab, input_size=20 * ch, d_model=d, nhead=4,
                num_encoder_layers=2, num_decoder_layers=1, d_ffn=64,
                dropout=dropout, normalize_before=True,
            ),
            seq_lin=LinearHead(input_size=d, n_neurons=vocab),
            ctc_lin=LinearHead(input_size=d, n_neurons=vocab),
            specaug_opts=None,
            ctc_weight=0.3,
            label_smoothing=0.1,
            loss_reduction="batchmean",
            pad_index=0,
            blank_index=0,
        )
        tx = make_optimizer(
            AdamW(lr=1e-3),
            WarmCoolDecayLRSchedule(1e-3, 10, 10, 100, decay_every=10).value,
        )
        r = np.random.default_rng(0)
        B, L, U = 8, 4000, 6
        batch = {
            "sig": jnp.asarray(r.standard_normal((B, L)).astype(np.float32)),
            "sig_len": jnp.asarray(
                np.linspace(0.4, 1.0, B).astype(np.float32)),
            "tokens": jnp.asarray(r.integers(3, vocab, (B, U)), jnp.int32),
            "tokens_len": jnp.full((B,), 0.8, jnp.float32),
            "tokens_bos": jnp.asarray(
                r.integers(3, vocab, (B, U)), jnp.int32),
            "tokens_eos": jnp.asarray(
                r.integers(3, vocab, (B, U)), jnp.int32),
            "tokens_eos_len": jnp.full((B,), 0.8, jnp.float32),
        }
        return cfg, tx, batch

    def test_train_step_pipeline_matches_sequential(self):
        from stac_st_tpu.parallel.mesh import batch_sharding
        from stac_st_tpu.parallel.pipeline import PipelineSpec
        from stac_st_tpu.training.step import (
            init_train_state, make_train_step,
        )

        cfg, tx, batch = self._train_setup(dropout=0.0)
        rng = jax.random.PRNGKey(0)
        state0 = init_train_state(cfg, tx, rng, batch)

        step_seq = make_train_step(cfg, tx)
        state_a, metrics_a = step_seq(
            jax.device_put(state0), batch, jax.random.PRNGKey(3),
            update_cmvn=True,
        )

        mesh = make_pipe_mesh(data=2, pipe=2)
        spec = PipelineSpec(mesh, "pipe", "data", num_microbatches=2)
        assert spec.row_multiple == 4
        step_pipe = make_train_step(cfg._replace(pipeline=spec), tx)
        sharded = {
            k: jax.device_put(v, batch_sharding(mesh))
            for k, v in batch.items()
        }
        state_b = init_train_state(cfg, tx, rng, batch)
        state_b, metrics_b = step_pipe(
            state_b, sharded, jax.random.PRNGKey(3), update_cmvn=True,
        )

        np.testing.assert_allclose(
            float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(metrics_a["grad_norm"]), float(metrics_b["grad_norm"]),
            rtol=1e-3,
        )
        np.testing.assert_allclose(
            float(state_a.cmvn.count), float(state_b.cmvn.count)
        )
        # gradients match (post-Adam params are NOT compared elementwise:
        # the first Adam step normalizes near-zero grads by ~|g|/(|g|+eps),
        # amplifying fp-noise-level grad differences to lr-scale updates)
        from stac_st_tpu.training.step import _forward, _objectives

        # fresh state: the jitted steps above DONATED their state arrays
        state_g = init_train_state(cfg, tx, rng, batch)

        def loss_of(c):
            def f(params):
                p_ctc, p_seq, _, _ = _forward(
                    params, state_g.cmvn, batch if c.pipeline is None
                    else sharded, c, True, False, jax.random.PRNGKey(3),
                )
                loss, _ = _objectives(
                    p_ctc, p_seq,
                    batch if c.pipeline is None else sharded, c,
                )
                return loss
            return f

        g_seq = jax.grad(loss_of(cfg))(state_g.params)
        g_pipe = jax.grad(loss_of(cfg._replace(pipeline=spec)))(state_g.params)
        for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(g_seq)),
                        jax.tree_util.tree_leaves(jax.device_get(g_pipe))):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-5)

    def test_train_step_pipeline_dropout_runs(self):
        """With dropout active the rng STREAMS differ from the sequential
        path by design; assert the pipelined step is finite, learns, and
        actually drops (train loss != deterministic loss)."""
        from stac_st_tpu.parallel.mesh import batch_sharding
        from stac_st_tpu.parallel.pipeline import PipelineSpec
        from stac_st_tpu.training.step import (
            init_train_state, make_train_step,
        )

        cfg, tx, batch = self._train_setup(dropout=0.3)
        mesh = make_pipe_mesh(data=2, pipe=2)
        spec = PipelineSpec(mesh, "pipe", "data")
        cfg_p = cfg._replace(pipeline=spec)
        rng = jax.random.PRNGKey(0)
        state = init_train_state(cfg, tx, rng, batch)
        step = make_train_step(cfg_p, tx)
        sharded = {
            k: jax.device_put(v, batch_sharding(mesh))
            for k, v in batch.items()
        }
        state1, m1 = step(state, sharded, jax.random.PRNGKey(1))
        assert np.isfinite(float(m1["loss"]))
        assert float(m1["grad_norm"]) > 0.0
        # different rng -> different dropout -> different loss
        state0 = init_train_state(cfg, tx, rng, batch)
        _, m2 = step(state0, sharded, jax.random.PRNGKey(2))
        assert float(m1["loss"]) != float(m2["loss"])

    def test_train_step_dropout_on_pipelined_equals_sequential_schedule(
            self):
        """Dropout-ON parity (VERDICT r4 item 5): the per-(microbatch,
        layer, data-shard) key schedule is the SPEC; the GPipe executor
        must reproduce the sequential executor of the SAME schedule
        exactly — loss, metrics, and updated parameters."""
        from stac_st_tpu.parallel.mesh import batch_sharding, replicated
        from stac_st_tpu.parallel.pipeline import PipelineSpec
        from stac_st_tpu.training.step import (
            init_train_state, make_train_step,
        )

        cfg, tx, batch = self._train_setup(dropout=0.3)
        mesh = make_pipe_mesh(data=2, pipe=2)
        rng = jax.random.PRNGKey(0)
        out = {}
        for name, seq_ref in (("pipelined", False), ("sequential", True)):
            spec = PipelineSpec(mesh, "pipe", "data",
                                sequential_reference=seq_ref)
            cfg_v = cfg._replace(pipeline=spec)
            sharded = {
                k: jax.device_put(v, batch_sharding(mesh))
                for k, v in batch.items()
            }
            state = jax.device_put(
                init_train_state(cfg_v, tx, rng, batch), replicated(mesh))
            step = make_train_step(cfg_v, tx)
            state, m = step(state, sharded, jax.random.PRNGKey(7))
            out[name] = (float(m["loss"]), jax.device_get(state.params))
        assert out["pipelined"][0] == pytest.approx(
            out["sequential"][0], rel=1e-6)
        for a, b in zip(
                jax.tree_util.tree_leaves(out["pipelined"][1]),
                jax.tree_util.tree_leaves(out["sequential"][1])):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
