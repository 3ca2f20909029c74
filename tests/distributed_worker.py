"""Worker for the 2-process jax.distributed smoke test (SURVEY §5.8).

Launched by tests/test_distributed.py as::

    python distributed_worker.py <coordinator> <num_procs> <proc_id>

Each process owns ONE CPU device; jax.distributed.initialize joins them
into a 2-device global mesh (the DCN story the framework ships in
``stac_st_tpu/parallel/distributed.py``). The worker then:

1. asserts the global device count is num_procs;
2. runs a psum across processes (value check);
3. runs one tiny data-parallel optimizer step with the batch sharded
   across processes and checks the loss is finite and identical on every
   process (GSPMD keeps replicated outputs in sync).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "1")


def real_trainer_loss() -> float:
    """One REAL STTrainer train_step on a deterministic tiny batch.

    Called identically from the 2-process workers (GSPMD shards the
    batch across hosts via ``_device_batch``'s
    make_array_from_process_local_data path) and from a single-process
    run (--single) — the driver asserts the losses match, i.e. the
    multi-host step computes exactly what the single-host step does."""
    import numpy as np
    import jax

    from stac_st_tpu.data.dataset import PaddedBatch, _PaddedPair
    from stac_st_tpu.models import (
        ConvolutionFrontEnd,
        LinearHead,
        TransformerMultiTask,
    )
    from stac_st_tpu.ops import Fbank
    from stac_st_tpu.training.optim import AdamW
    from stac_st_tpu.training.trainer import STTrainer

    VOCAB = 50
    cnn = ConvolutionFrontEnd(out_channels=(8, 8))
    transformer = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=20 * 8, d_model=16, nhead=2,
        num_encoder_layers=1, num_decoder_layers=1, d_ffn=32,
        dropout=0.0, normalize_before=True, causal=False,
    )
    hparams = {
        "compute_features": Fbank(),
        "ctc_weight": 0.3,
        "label_smoothing": 0.1,
        "loss_reduction": "batchmean",
        "pad_index": 0, "blank_index": 0, "bos_index": 1, "eos_index": 2,
        "grad_accumulation_factor": 1,
        "max_grad_norm": 5.0,
        "nonfinite_patience": 10,
        "lr_adam": 1e-3,
        "Adam": AdamW(lr=1e-3),
        "optimizer_step_limit": 10_000,
    }
    modules = {
        "CNN": cnn, "Transformer": transformer,
        "seq_lin": LinearHead(input_size=16, n_neurons=VOCAB),
        "ctc_lin": LinearHead(input_size=16, n_neurons=VOCAB),
    }
    trainer = STTrainer(
        modules=modules, opt_class=hparams["Adam"], hparams=hparams,
        run_opts={"data_parallel_count": -1, "precision": "fp32",
                  "rng_impl": "threefry"},
    )
    r = np.random.default_rng(7)
    B, SAMPLES, TOK = 4, 4800, 6
    sig = r.standard_normal((B, SAMPLES)).astype(np.float32) * 0.1
    tokens = r.integers(3, VOCAB, (B, TOK)).astype(np.int32)
    bos = np.concatenate(
        [np.full((B, 1), 1, np.int32), tokens[:, :-1]], axis=1)
    eos = np.concatenate(
        [tokens[:, :-1], np.full((B, 1), 2, np.int32)], axis=1)
    ones = np.ones((B,), np.float32)
    batch = PaddedBatch(
        id=[f"u{i}" for i in range(B)],
        sig=_PaddedPair(sig, ones),
        tokens=_PaddedPair(tokens, ones),
        tokens_bos=_PaddedPair(bos, ones),
        tokens_eos=_PaddedPair(eos, ones),
        duration=[SAMPLES / 16000.0] * B,
        task=["translation"] * B,
        source_lang=["es"] * B,
        target_lang=["en"] * B,
    )
    dev = trainer._device_batch(batch)
    trainer.ensure_state(dev)
    key = jax.random.PRNGKey(0)
    trainer.state, metrics = trainer.train_step(
        trainer.state, dev, key, update_cmvn=False)

    # real beam search over the sharded encoder output: exercises the
    # gather_to_host multi-host boundary (search outputs are sharded on
    # the batch axis across processes)
    from stac_st_tpu.decoding.beam_search import MultiTaskBeamSearch

    searcher = MultiTaskBeamSearch(
        [transformer, modules["seq_lin"], modules["ctc_lin"]],
        bos_index=1, eos_index=2, blank_index=0,
        min_decode_ratio=0.0, max_decode_ratio=1.0, beam_size=2,
    )
    trainer._bind_searcher(searcher)
    searcher.set_decoder_prefix_tokens(3, 4)
    _p_ctc, _p_seq, enc_out = trainer.eval_forward(
        trainer.state.params, trainer.state.cmvn, dev)
    hyps, _scores = searcher(enc_out, dev["sig_len"])
    return float(jax.device_get(metrics["loss"])), repr(hyps)


def main():
    if sys.argv[1] == "--single":
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 1)
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        loss, hyps = real_trainer_loss()
        print(f"REAL_LOSS={loss:.8f}", flush=True)
        print(f"REAL_HYPS={hyps}", flush=True)
        return

    coordinator, num_procs, proc_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 1)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from stac_st_tpu.parallel.distributed import (
        init_distributed,
        is_main_process,
        process_count,
    )

    init_distributed(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert process_count() == num_procs, process_count()
    assert jax.device_count() == num_procs, jax.device_count()
    assert is_main_process() == (proc_id == 0)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, ("data",))

    # ---- 2. cross-process psum -------------------------------------------
    from jax.experimental.shard_map import shard_map

    @jax.jit
    def do_psum(x):
        return shard_map(
            lambda v: jax.lax.psum(v, "data"),
            mesh=mesh, in_specs=P("data"), out_specs=P(),
        )(x)

    global_x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), np.asarray([float(proc_id + 1)]),
        (num_procs,),
    )
    total = do_psum(global_x)
    want = float(np.sum(np.arange(num_procs) + 1))
    got = float(np.asarray(jax.device_get(total)))
    assert abs(got - want) < 1e-6, (got, want)
    print(f"[proc {proc_id}] psum ok: {got}", flush=True)

    # ---- 3. tiny sharded train step --------------------------------------
    import optax

    rng = np.random.default_rng(0)  # same params on every process
    params = {
        "w": jnp.asarray(rng.standard_normal((8, 4)), jnp.float32),
        "b": jnp.zeros((4,), jnp.float32),
    }
    tx = optax.adamw(1e-2)
    opt_state = tx.init(params)

    batch_sharding = NamedSharding(mesh, P("data"))
    # each process contributes its own rows; global batch = 4 rows
    local_rows = 2
    x_local = rng.standard_normal(
        (local_rows, 8)).astype(np.float32) + proc_id
    y_local = rng.standard_normal(
        (local_rows, 4)).astype(np.float32)
    x = jax.make_array_from_process_local_data(
        batch_sharding, x_local, (local_rows * num_procs, 8)
    )
    y = jax.make_array_from_process_local_data(
        batch_sharding, y_local, (local_rows * num_procs, 4)
    )

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            pred = x @ p["w"] + p["b"]
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(params, opt_state, x, y)
    loss = float(jax.device_get(loss))
    assert np.isfinite(loss), loss
    print(f"[proc {proc_id}] sharded train step ok: loss={loss:.6f}",
          flush=True)

    # ---- 4. the REAL trainer step + decode across processes --------------
    real, hyps = real_trainer_loss()
    assert np.isfinite(real), real
    print(f"[proc {proc_id}] REAL_LOSS={real:.8f}", flush=True)
    print(f"[proc {proc_id}] REAL_HYPS={hyps}", flush=True)
    print(f"[proc {proc_id}] DONE loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
