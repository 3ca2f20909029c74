#!/usr/bin/env python3
"""Itemize the training step's device time via jax.profiler.

The small preset plateaus at ~23% MFU (docs/PERF.md round 3) with the
residual attributed to bandwidth-bound elementwise work; this tool
captures a device trace of the REAL compiled multi-step program
(bench_train machinery) and aggregates per-op durations so the residual
is itemized instead of inferred. jax.profiler device tracing works
through the axon tunnel (probed: fusion/copy events appear).

Env: STAC_TRAIN_PRESET / STAC_TRAIN_BATCH / the other bench_train knobs.
Usage: python -u tools/exp_train_profile.py
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax

    import bench_train

    if os.environ.get("STAC_TRAIN_THREEFRY") != "1":
        jax.config.update("jax_default_prng_impl", "rbg")
    preset = os.environ.get("STAC_TRAIN_PRESET", "small")
    batch_rows = int(os.environ.get("STAC_TRAIN_BATCH", "24"))
    n_steps = 6

    import optax

    from stac_st_tpu.training.step import _forward, _objectives

    cfg, tx, batch, state = bench_train._build(preset, batch_rows)

    @jax.jit
    def multi_step(state, batch, key):
        def body(state, k):
            def loss_fn(params):
                p_ctc, p_seq, _, new_cmvn = _forward(
                    params, state.cmvn, batch, cfg, True, False, k
                )
                loss, _ = _objectives(p_ctc, p_seq, batch, cfg)
                return loss, new_cmvn

            (loss, new_cmvn), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, opt_state = tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return state._replace(
                params=params, opt_state=opt_state, cmvn=new_cmvn
            ), loss

        keys = jax.random.split(key, n_steps)
        state, losses = jax.lax.scan(body, state, keys)
        return state, losses

    out_dir = os.environ.get("STAC_PROFILE_DIR", "/tmp/train_trace")
    state2, losses = multi_step(state, batch, jax.random.PRNGKey(1))
    float(np.asarray(losses[-1]))  # compile + settle
    with jax.profiler.trace(out_dir):
        _, losses = multi_step(state, batch, jax.random.PRNGKey(2))
        float(np.asarray(losses[-1]))

    path = sorted(glob.glob(
        os.path.join(out_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    evs = data.get("traceEvents", [])
    # device op events: "X" phase entries carrying a duration on a TPU
    # process track; aggregate by op name
    pids_meta = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids_meta[e["pid"]] = e.get("args", {}).get("name", "")
    agg = {}
    total = 0.0
    for e in evs:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        track = pids_meta.get(e.get("pid"), "")
        if "TPU" not in track and "device" not in track.lower():
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e["dur"]
        total += e["dur"]
    if not agg:  # fall back: no device track labels — aggregate everything
        for e in evs:
            if e.get("ph") == "X" and "dur" in e:
                name = e.get("name", "?")
                agg[name] = agg.get(name, 0.0) + e["dur"]
                total += e["dur"]
    print(f"# preset={preset} B={batch_rows} steps={n_steps} "
          f"total tracked {total/1e3:.2f} ms")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{us/1e3/n_steps:9.3f} ms/step  {100*us/total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
