#!/usr/bin/env python3
"""Serve a trained experiment over HTTP and/or gRPC.

The production companion to the batch inference recipe
(``recipes/inference.py``; the reference has no serving story — its
inference is a batch loop, ``stac-st/inference.py``). Loads the experiment
from its own saved config (no model dims re-specified), builds the batched
:class:`~stac_st_tpu.serving.STEngine`, and exposes it through ONE shared
coalescing front end so concurrent requests across both transports batch
into the same TPU calls.

Usage::

    python recipes/serve.py results/transformer_multitask/8886 \
        --transport both --http-port 8080 --grpc-port 50051

    # single transport
    python recipes/serve.py EXP_DIR --transport grpc --grpc-port 50051
"""

from __future__ import annotations

import argparse
import logging
import os
import signal
import threading

logger = logging.getLogger("serve")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    p.add_argument("experiment_dir",
                   help="training experiment directory (hyperparams.yaml + "
                        "save/)")
    p.add_argument("--tokenizer", default=None,
                   help="tokenizer .model path (default: from the saved "
                        "config)")
    p.add_argument("--transport", choices=("http", "grpc", "both"),
                   default="http")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--http-port", type=int, default=8080)
    p.add_argument("--grpc-port", type=int, default=50051)
    # engine knobs (defaults mirror STEngine)
    p.add_argument("--source-lang", default="es")
    p.add_argument("--target-lang", default="en")
    p.add_argument("--beam-size", type=int, default=10)
    p.add_argument("--max-decode-tokens", type=int, default=192)
    p.add_argument("--buckets", default="2,4,8,16,32",
                   help="comma-separated bucket seconds (compile-once grid)")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="shard request batches over this many devices "
                        "(fleet serving; 0/1 = single device, -1 = all)")
    p.add_argument("--no-bf16", action="store_true",
                   help="keep fp32 params/activations")
    p.add_argument("--avg-checkpoints", type=int, default=None,
                   help="average the top-N saved checkpoints (default: "
                        "engine default)")
    # front-end knobs
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--pad-batch", type=str, default=None,
                   help="pad engine batches so any coalesced batch size "
                        "hits a pre-compiled shape. One int = round up to "
                        "a multiple; a comma ladder like '4,16' = pad to "
                        "the smallest rung >= the formed batch (light-load "
                        "batches stop paying max-batch compute — tail-"
                        "latency lever, one compile per rung). Default: "
                        "--max-batch")
    p.add_argument("--kv-cache-dtype", choices=("int8",), default=None,
                   help="quantize the decode self-attention KV cache "
                        "(halves its per-step HBM reads; docs/PERF.md)")
    p.add_argument("--weights-int8", action="store_true",
                   help="weight-only int8 on the decode hot path "
                        "(decoder + output-head kernels stream half the "
                        "HBM bytes per decode step; biggest at small "
                        "batches / large presets — docs/PERF.md)")
    p.add_argument("--continuous", action="store_true",
                   help="serve through the continuous (in-flight) batching "
                        "engine: a persistent greedy decode loop over "
                        "--slots slots with per-chunk slot refill (no "
                        "head-of-line blocking; beam-1 greedy instead of "
                        "beam search — translate/transcribe routes only)")
    p.add_argument("--slots", type=int, default=8,
                   help="continuous mode: decode-loop width (rows per "
                        "step)")
    p.add_argument("--chunk", type=int, default=16,
                   help="continuous mode: decode steps per device dispatch")
    p.add_argument("--admit-rungs", default=None,
                   help="continuous mode: comma-separated admission group "
                        "sizes (one compiled program per bucket x rung; "
                        "default: 1,4,<slots> ladder)")
    p.add_argument("--max-wait-ms", type=float, default=20.0)
    p.add_argument("--request-timeout", type=float, default=300.0)
    p.add_argument("--compile-cache", default="auto",
                   help="persistent XLA compilation cache: 'auto' "
                        "(default; <experiment_dir>/compile_cache — a "
                        "restarted server skips its whole bucket-grid "
                        "compile), 'off', or an explicit directory "
                        "shared across experiments")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip compiling the (bucket x pad-rung) program "
                        "grid before binding ports (default: warm it, so "
                        "no request ever pays a compile; with "
                        "--compile-cache the warmup reloads executables "
                        "instead of compiling)")
    p.add_argument("--warmup-dual", action="store_true",
                   help="also warm the fused dual-prompt (ASR+ST) "
                        "program per shape (for /v1/transcribe_translate "
                        "traffic)")
    p.add_argument("--log-level", default="INFO")
    return p


def _parse_pad_batch(spec: str):
    """'16' -> 16 (round-up multiple); '4,16' -> (4, 16) ladder."""
    parts = [int(s) for s in str(spec).split(",") if s.strip()]
    if not parts:
        raise ValueError(f"--pad-batch: no row counts in {spec!r}")
    return parts[0] if len(parts) == 1 else tuple(parts)


def start_servers(args):
    """Load the experiment and start the requested transports.

    Returns ``(front, servers)`` — the shared coalescing front end and the
    started transport servers (read bound ports from ``server.port``).
    Split from :func:`main` so tests can drive the full path with
    ephemeral ports and close it without signals.
    """
    from stac_st_tpu.serving import STEngine
    from stac_st_tpu.serving_stream import StreamingFrontEnd

    if args.compile_cache != "off":
        from stac_st_tpu.utils.compile_cache import enable_compile_cache

        cache_dir = (os.path.join(args.experiment_dir, "compile_cache")
                     if args.compile_cache == "auto" else args.compile_cache)
        enable_compile_cache(cache_dir)

    kw = dict(
        source_lang=args.source_lang,
        target_lang=args.target_lang,
        beam_size=args.beam_size,
        max_decode_tokens=args.max_decode_tokens,
        bucket_seconds=tuple(
            float(s) for s in args.buckets.split(",") if s.strip()
        ),
        bf16=not args.no_bf16,
        pad_batch_rows=(_parse_pad_batch(args.pad_batch)
                        if args.pad_batch is not None else args.max_batch),
        kv_cache_dtype=args.kv_cache_dtype,
        weights_int8=args.weights_int8,
    )
    if args.data_parallel not in (0, 1):
        import jax
        import numpy as np
        from jax.sharding import Mesh

        devs = jax.devices()
        n = len(devs) if args.data_parallel == -1 else args.data_parallel
        if not 1 <= n <= len(devs):
            raise SystemExit(
                f"--data-parallel {args.data_parallel}: need a value in "
                f"[2, {len(devs)}] (or -1 for all devices); "
                f"{len(devs)} device(s) visible"
            )
        if n > 1:
            mesh_devs = devs[:n]
            kw["mesh"] = Mesh(np.asarray(mesh_devs), ("data",))
            logger.info("fleet serving over %d devices", len(mesh_devs))
        else:
            # -1 on a single-device host: serve without a mesh rather
            # than abort — "-1" means "use whatever is there"
            logger.info("fleet serving requested but 1 device visible; "
                        "serving single-device")
    if args.avg_checkpoints is not None:
        kw["avg_checkpoints"] = args.avg_checkpoints
    logger.info("loading experiment %s", args.experiment_dir)
    engine = STEngine.from_saved_experiment(
        args.experiment_dir, tokenizer_file=args.tokenizer, **kw
    )

    if getattr(args, "continuous", False):
        # continuous (in-flight) batching: one persistent greedy decode
        # loop; requests swap into freed slots between device dispatches
        from stac_st_tpu.serving_continuous import ContinuousBatchingEngine

        rungs = (tuple(int(s) for s in args.admit_rungs.split(",")
                       if s.strip())
                 if args.admit_rungs else None)
        slots = args.slots
        if engine.mesh is not None:
            # slot pool is sharded on the data axis — round the pool up
            # so every device owns the same number of slots
            d = int(engine.mesh.shape["data"])
            if slots % d:
                slots = ((slots + d - 1) // d) * d
                logger.info("rounding --slots %d up to %d (%d per device "
                            "over the %d-way data mesh)",
                            args.slots, slots, slots // d, d)
        front = ContinuousBatchingEngine(
            engine, slots=slots, chunk=args.chunk,
            max_new_tokens=args.max_decode_tokens, admit_rungs=rungs,
        )
        if not getattr(args, "no_warmup", False):
            import time as _time

            t0 = _time.time()
            n = front.warmup()
            logger.info("warmed %d continuous-mode programs in %.1fs",
                        n, _time.time() - t0)
    else:
        if not getattr(args, "no_warmup", False):
            # compile (or cache-load) every (bucket x rung) program BEFORE
            # binding ports: otherwise the first request on each shape pays
            # the full fused compile and early traffic stalls behind it
            import time as _time

            t0 = _time.time()
            n = engine.warmup(dual=getattr(args, "warmup_dual", False))
            logger.info("warmed %d (bucket x rung) shapes in %.1fs",
                        n, _time.time() - t0)

        # one front end shared by every transport: concurrent clients
        # coalesce into the same bucketed TPU calls regardless of protocol
        front = StreamingFrontEnd(
            engine, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms
        )

    servers = []
    if args.transport in ("http", "both"):
        from stac_st_tpu.serving_http import STHttpServer

        servers.append(STHttpServer(
            front, host=args.host, port=args.http_port,
            request_timeout=args.request_timeout,
        ))
    if args.transport in ("grpc", "both"):
        from stac_st_tpu.serving_grpc import STGrpcServer

        servers.append(STGrpcServer(
            front, host=args.host, port=args.grpc_port,
            request_timeout=args.request_timeout,
        ))

    for server in servers:
        server.start()
        logger.info("%s listening on %s:%d",
                    type(server).__name__, args.host, server.port)
    return front, servers


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=getattr(logging, args.log_level.upper(), logging.INFO),
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    front, servers = start_servers(args)

    done = threading.Event()

    def _stop(signum, frame):
        logger.info("signal %d: shutting down", signum)
        done.set()

    signal.signal(signal.SIGTERM, _stop)
    signal.signal(signal.SIGINT, _stop)
    try:
        done.wait()
    finally:
        for server in servers:
            server.close()
        front.close()


if __name__ == "__main__":
    main()
