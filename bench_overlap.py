#!/usr/bin/env python3
"""Loader/device overlap proof (VERDICT r2 item 10).

``bench_loader.py`` measures the host pipeline in isolation;
``bench_train.py`` measures the device step in isolation. This driver runs
BOTH concurrently — the loader producing production-config batches in
worker threads while the device executes compiled train-step scans — and
reports each side's contended rate vs its isolated rate. Device idle
fraction ≈ 1 - contended/isolated device rate; the loader's contended
rate is the one that must stay ≥ the device rate for a zero-stall hot
loop (the claim docs/PERF.md previously extrapolated from isolated
numbers).

    python bench_overlap.py [--utts 48] [--seconds 10] [--window 60]

Prints one JSON line.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_loader import build_corpus  # synthetic wav corpus + manifest


def _make_device_fn():
    """Compiled 10-step train scan on the flagship small preset (bf16+rbg),
    B16 x 15 s — the bench_train configuration."""
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import optax

    import bench_train as bt
    from stac_st_tpu.training.step import _forward, _objectives

    cfg, tx, batch, state = bt._build("small", 16)
    n_steps = 10

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

    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    state, losses = multi_step(state, batch, key)  # compile
    float(losses[-1])
    audio_per_scan = 16 * 15.0 * n_steps
    return multi_step, state, batch, audio_per_scan


def _loader_iter(manifest):
    from stac_st_tpu.data.dataset import SpeechDataset
    from stac_st_tpu.data.loader import BatchLoader
    from stac_st_tpu.data.sampler import DynamicBatchSampler
    from stac_st_tpu.ops.speed_perturb import DeviceSpeedPerturb

    perturb = DeviceSpeedPerturb(16000, [90, 100, 110])
    perturb.seed(1234)
    ds = SpeechDataset(manifest, tokenizer=None, speed_perturb=perturb)
    sampler = DynamicBatchSampler(
        ds.durations(), max_batch_length=450.0, num_buckets=20, shuffle=True
    )
    return BatchLoader(ds, sampler=sampler, num_workers=2, prefetch=4)


def _batch_audio(batch):
    width = batch.sig.data.shape[1]
    return float(np.sum(batch.sig.lengths)) * width / 16000.0


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=48)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--window", type=float, default=60.0,
                    help="concurrent measurement window (s)")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="bench_overlap_")
    try:
        manifest = build_corpus(
            os.path.join(tmp, "wav"), "wav", args.utts, args.seconds
        )
        loader = _loader_iter(manifest)
        for _ in loader:  # warmup epoch (page cache, pools)
            pass

        multi_step, state, dev_batch, audio_per_scan = _make_device_fn()
        key = jax.random.PRNGKey(1)

        # ---- isolated rates ---------------------------------------------
        t0 = time.perf_counter()
        scans = 0
        while time.perf_counter() - t0 < 20.0:
            state, losses = multi_step(state, dev_batch, key)
            float(losses[-1])
            scans += 1
        dev_rate_iso = scans * audio_per_scan / (time.perf_counter() - t0)

        t0 = time.perf_counter()
        audio = 0.0
        for ep in range(3):
            loader.set_epoch(ep + 10)
            for b in loader:
                audio += _batch_audio(b)
        load_rate_iso = audio / (time.perf_counter() - t0)

        # ---- concurrent window ------------------------------------------
        stop = threading.Event()
        stats = {"scans": 0, "audio": 0.0}

        def device_worker():
            nonlocal state
            while not stop.is_set():
                state2, losses = multi_step(state, dev_batch, key)
                float(losses[-1])
                state = state2
                stats["scans"] += 1

        def loader_worker():
            ep = 100
            while not stop.is_set():
                loader.set_epoch(ep)
                ep += 1
                for b in loader:
                    stats["audio"] += _batch_audio(b)
                    if stop.is_set():
                        break

        td = threading.Thread(target=device_worker, daemon=True)
        tl = threading.Thread(target=loader_worker, daemon=True)
        t0 = time.perf_counter()
        td.start()
        tl.start()
        time.sleep(args.window)
        stop.set()
        td.join(timeout=120)
        tl.join(timeout=120)
        dt = time.perf_counter() - t0
        dev_rate_con = stats["scans"] * audio_per_scan / dt
        load_rate_con = stats["audio"] / dt
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    idle = max(0.0, 1.0 - dev_rate_con / dev_rate_iso)
    print(json.dumps({
        "metric": "loader_device_overlap",
        "device_rate_isolated": round(dev_rate_iso, 1),
        "device_rate_contended": round(dev_rate_con, 1),
        "device_idle_pct": round(idle * 100, 1),
        "loader_rate_isolated": round(load_rate_iso, 1),
        "loader_rate_contended": round(load_rate_con, 1),
        "loader_vs_device": round(
            load_rate_con / max(dev_rate_con, 1e-9), 2),
        "host_cores": os.cpu_count(),
        "window_s": args.window,
        "unit": "audio-s/s",
    }))


if __name__ == "__main__":
    main()
