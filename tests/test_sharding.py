"""Multi-chip SPMD tests on the virtual 8-device CPU mesh.

The fake-distributed analogue (SURVEY.md §4): the full jitted train step runs
sharded over a (data=8, model=1) mesh and must agree with the single-device
result — validating that GSPMD's inserted collectives (grad all-reduce, CMVN
stats reduction) preserve semantics.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stac_st_tpu.parallel.mesh import batch_sharding, make_mesh, replicated


def _tiny_setup():
    import __graft_entry__ as ge

    return ge._build(tiny=True)


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(data=8)
        assert mesh.shape == {"data": 8, "model": 1}
        mesh2 = make_mesh(data=4, model=2)
        assert mesh2.shape == {"data": 4, "model": 2}

    def test_batch_sharding_places_shards(self):
        mesh = make_mesh(data=8)
        x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
        y = jax.device_put(x, batch_sharding(mesh))
        assert len(y.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(y), x)


class TestShardedTrainStep:
    def test_sharded_matches_single_device(self):
        from stac_st_tpu.training.step import init_train_state, make_train_step

        cfg, tx, batch = _tiny_setup()
        # widen batch to 8 rows
        batch = {
            k: jnp.tile(v, (2,) + (1,) * (v.ndim - 1)) for k, v in batch.items()
        }
        rng = jax.random.PRNGKey(0)
        state0 = init_train_state(cfg, tx, rng, batch)
        train_step = make_train_step(cfg, tx)

        # single device (replicated batch placement on 1 device)
        state_a, metrics_a = train_step(
            jax.device_put(state0), batch, jax.random.PRNGKey(42),
            update_cmvn=True,
        )

        # 8-way data sharding
        mesh = make_mesh(data=8)
        sharded_batch = {
            k: jax.device_put(v, batch_sharding(mesh))
            for k, v in batch.items()
        }
        state_b = jax.device_put(
            init_train_state(cfg, tx, rng, batch), replicated(mesh)
        )
        state_b, metrics_b = train_step(
            state_b, sharded_batch, jax.random.PRNGKey(42), update_cmvn=True,
        )

        np.testing.assert_allclose(
            float(metrics_a["loss"]), float(metrics_b["loss"]),
            rtol=1e-4,
        )
        # parameters after one update agree
        flat_a = jax.tree_util.tree_leaves(jax.device_get(state_a.params))
        flat_b = jax.tree_util.tree_leaves(jax.device_get(state_b.params))
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)
        # CMVN folded the same number of utterances
        np.testing.assert_allclose(
            float(state_a.cmvn.count), float(state_b.cmvn.count)
        )


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        loss = jax.jit(fn)(*args)
        assert np.isfinite(float(loss))

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestTensorParallel:
    def test_tp_step_matches_single_device(self):
        """(data=4, model=2) mesh with Megatron-style param sharding must
        reproduce the single-device train step (GSPMD inserts the TP
        collectives from the parameter placements alone)."""
        import jax.numpy as jnp

        from stac_st_tpu.parallel.sharding_rules import shard_params
        from stac_st_tpu.training.step import init_train_state, make_train_step

        cfg, tx, batch = _tiny_setup()
        batch = {
            k: jnp.tile(v, (2,) + (1,) * (v.ndim - 1)) for k, v in batch.items()
        }
        rng = jax.random.PRNGKey(0)
        state0 = init_train_state(cfg, tx, rng, batch)
        train_step = make_train_step(cfg, tx)

        state_a, metrics_a = train_step(
            jax.device_put(state0), batch, jax.random.PRNGKey(7),
            update_cmvn=False,
        )

        mesh = make_mesh(data=4, model=2)
        state_b = init_train_state(cfg, tx, rng, batch)
        sharded_params = shard_params(state_b.params, mesh)
        # optimizer state mirrors the parameter sharding automatically
        state_b = state_b._replace(
            params=sharded_params, opt_state=tx.init(sharded_params)
        )
        sharded_batch = {
            k: jax.device_put(v, batch_sharding(mesh))
            for k, v in batch.items()
        }
        state_b, metrics_b = train_step(
            state_b, sharded_batch, jax.random.PRNGKey(7), update_cmvn=False,
        )

        np.testing.assert_allclose(
            float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-4
        )
        flat_a = jax.tree_util.tree_leaves(jax.device_get(state_a.params))
        flat_b = jax.tree_util.tree_leaves(jax.device_get(state_b.params))
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)

    def test_rules_hit_expected_params(self):
        from stac_st_tpu.parallel.sharding_rules import spec_for_path
        from jax.sharding import PartitionSpec as P

        assert spec_for_path(
            "Transformer/params/decoder/layer_0/self_attn/q_proj/kernel"
        ) == P(None, "model")
        assert spec_for_path(
            "Transformer/params/encoder/layer_3/ffn/fc2/kernel"
        ) == P("model", None)
        assert spec_for_path("seq_lin/params/linear/kernel") == P(None, "model")
        assert spec_for_path(
            "Transformer/params/encoder/layer_0/norm1/scale"
        ) == P()


class TestShardedDecode:
    def test_beam_search_with_sharded_encoder_output(self):
        """Serving scale-out: beam search over a batch sharded on the data
        axis must equal the unsharded result (GSPMD partitions the whole
        decode loop; per-chip RTFx stays constant as the fleet grows)."""
        import jax.numpy as jnp

        from stac_st_tpu.decoding.beam_search import MultiTaskBeamSearch
        from stac_st_tpu.models import LinearHead, TransformerMultiTask

        model = TransformerMultiTask(
            tgt_vocab=40, input_size=16, d_model=32, nhead=4,
            num_encoder_layers=1, num_decoder_layers=1, d_ffn=64,
            dropout=0.0, normalize_before=True,
        )
        seq_lin = LinearHead(input_size=32, n_neurons=40)
        rng = np.random.default_rng(4)
        src = jnp.asarray(rng.standard_normal((8, 10, 16)).astype(np.float32))
        params = model.init(
            jax.random.PRNGKey(1), src, jnp.ones((8, 4), jnp.int32)
        )
        enc = model.apply(params, src, method=model.encode)
        s_params = seq_lin.init(jax.random.PRNGKey(2), enc)

        searcher = MultiTaskBeamSearch(
            [model, seq_lin, None], bos_index=1, eos_index=2, blank_index=0,
            beam_size=3, min_decode_ratio=0.3,
        )
        searcher.bind(params, s_params)
        searcher.set_decoder_prefix_tokens(5, 9)

        hyps_plain, scores_plain = searcher(enc)

        mesh = make_mesh(data=8)
        enc_sharded = jax.device_put(enc, batch_sharding(mesh))
        hyps_shard, scores_shard = searcher(enc_sharded)

        assert hyps_plain == hyps_shard
        np.testing.assert_allclose(scores_plain, scores_shard, rtol=1e-5)
