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


def main():
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
    print(f"[proc {proc_id}] DONE loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
