#!/usr/bin/env python3
"""Serving-under-load benchmark: sustained RTFx through the HTTP path.

VERDICT r2 item 4: the raw ``STEngine`` RTFx was known, but nothing
measured the production ingress — concurrent clients → HTTP →
coalescing ``StreamingFrontEnd`` → bucketed TPU calls. This driver:

1. builds the flagship small preset (d256, 12+6L, vocab 5000), briefly
   trains it ON CHIP on a synthetic supervised task (as ``bench.py``
   phase 2) so eos/early-exit bind and hyp lengths are realistic;
2. wraps it in ``StreamingFrontEnd`` + ``STHttpServer``;
3. runs N concurrent HTTP clients posting base64 waveforms of mixed
   durations for a fixed wall-clock window;
4. reports sustained RTFx, the formed batch-size histogram, and
   p50/p95/p99 request latency as ONE JSON line.

Env knobs: STAC_SERVE_CLIENTS (default 16), STAC_SERVE_SECONDS (default
45 s of load), STAC_SERVE_NOTRAIN=1 (skip the training phase),
STAC_SERVE_MAXBATCH (default 16), STAC_SERVE_TRANSPORT=http|grpc (same
engine and front end behind either ingress, so the pair of runs
isolates transport overhead), STAC_SERVE_FRONT=batch|continuous (the
coalescing beam-10 front end vs the greedy continuous-batching slot
loop; STAC_SERVE_SLOTS / STAC_SERVE_CHUNK size the latter),
STAC_SERVE_COMPILE_CACHE=<dir> (persistent XLA compile cache so
repeated runs skip the remote compiles).
"""

import base64
import http.client
import json
import os
import threading
import time

import numpy as np

SR = 16000
# mixed load; engine buckets pad these. Each bucket costs one fused
# compile through the (slow) axon tunnel, so the default keeps two.
DURATIONS = tuple(
    float(s) for s in os.environ.get(
        "STAC_SERVE_DURATIONS", "10").split(",")
)


class _IdTokenizer:
    """Throughput-bench tokenizer: ids -> space-joined strings."""

    def decode_ids(self, ids):
        return " ".join(str(i) for i in ids)

    def piece_to_id(self, piece):
        return {"[turn]": 7, "[xt]": 8}.get(piece, 3)

    def encode_as_ids(self, text):
        return [3]


def _build_trained_engine():
    import jax
    import jax.numpy as jnp
    import optax

    cache_dir = os.environ.get("STAC_SERVE_COMPILE_CACHE")
    if cache_dir:
        from stac_st_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache(cache_dir)

    from stac_st_tpu.models import (
        ConvolutionFrontEnd,
        LinearHead,
        TransformerMultiTask,
    )
    from stac_st_tpu.ops import Fbank
    from stac_st_tpu.ops.cmvn import cmvn_init
    from stac_st_tpu.ops.losses import nll_loss
    from stac_st_tpu.serving import STEngine

    D, H, ENC_L, DEC_L, FFN, VOCAB = 256, 4, 12, 6, 1024, 5000
    B, SECONDS = 16, 10.0

    cnn = ConvolutionFrontEnd(out_channels=(256, 256))
    transformer = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=5120, d_model=D, nhead=H,
        num_encoder_layers=ENC_L, num_decoder_layers=DEC_L, d_ffn=FFN,
        dropout=0.1, normalize_before=True, causal=False,
    )
    seq_lin = LinearHead(input_size=D, n_neurons=VOCAB)
    ctc_lin = LinearHead(input_size=D, n_neurons=VOCAB)
    fbank = Fbank()

    rng = np.random.default_rng(0)
    wavs = jnp.asarray(
        rng.standard_normal((B, int(SECONDS * SR))).astype(np.float32))
    wav_lens = jnp.ones((B,), jnp.float32)
    key = jax.random.PRNGKey(0)
    feats = fbank(wavs)
    cnn_p = cnn.init(key, feats)
    src = cnn.apply(cnn_p, feats)
    tr_p = transformer.init(key, src, jnp.ones((B, 8), jnp.int32), wav_lens)
    enc = transformer.apply(
        tr_p, src[:1], wav_lens[:1], method=transformer.encode)
    seq_p = seq_lin.init(key, enc)
    ctc_p = ctc_lin.init(key, enc)

    if os.environ.get("STAC_SERVE_NOTRAIN") != "1":
        # brief on-chip training so eos fires (bench.py phase-2 recipe)
        U = 14
        tgt = jnp.asarray(rng.integers(5, VOCAB, (B, U)), jnp.int32)
        prompt = jnp.asarray([[1, 3, 4]] * B, jnp.int32)
        tokens_bos = jnp.concatenate([prompt, tgt], axis=1)
        tokens_eos = jnp.concatenate(
            [prompt[:, 1:], tgt, jnp.full((B, 1), 2, jnp.int32)], axis=1)
        params = {"cnn": cnn_p, "tr": tr_p, "seq": seq_p}
        tx = optax.adamw(3e-4)
        opt_state = tx.init(params)

        @jax.jit
        def train_step(params, opt_state):
            def loss_fn(p):
                f = fbank(wavs)
                s = cnn.apply(p["cnn"], f)
                _e, dec = transformer.apply(p["tr"], s, tokens_bos, wav_lens)
                logp = jax.nn.log_softmax(
                    seq_lin.apply(p["seq"], dec), axis=-1)
                return nll_loss(logp, tokens_eos,
                                jnp.ones((B,), jnp.float32),
                                label_smoothing=0.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        import time as _t
        t0 = _t.time()
        loss = None
        n_train = int(os.environ.get("STAC_SERVE_TRAIN_STEPS", "200"))
        for i in range(n_train):
            params, opt_state, loss = train_step(params, opt_state)
            if i % 50 == 0:
                print(f"# train step {i} loss={float(loss):.3f} "
                      f"({_t.time() - t0:.0f}s)", flush=True)
        print(f"# trained {n_train} steps, loss={float(loss):.3f} "
              f"({_t.time() - t0:.0f}s)", flush=True)
        cnn_p, tr_p, seq_p = params["cnn"], params["tr"], params["seq"]

    eng_params = {"CNN": cnn_p, "Transformer": tr_p, "seq_lin": seq_p,
                  "ctc_lin": ctc_p}
    max_batch = int(os.environ.get("STAC_SERVE_MAXBATCH", "16"))
    # STAC_SERVE_PADBATCH: "16" = round up to one shape (default);
    # "4,16" = row ladder (light batches pad to the smaller rung)
    pad_spec = os.environ.get("STAC_SERVE_PADBATCH", str(max_batch))
    rungs = [int(s) for s in pad_spec.split(",") if s.strip()]
    engine = STEngine(
        transformer, cnn, seq_lin, ctc_lin, eng_params, cmvn_init(80),
        _IdTokenizer(), beam_size=10, max_decode_tokens=192, bf16=True,
        bucket_seconds=DURATIONS,
        # static row-batching: every coalesced batch hits a pre-compiled
        # (width, rung) shape (no request-time compiles)
        pad_batch_rows=rungs[0] if len(rungs) == 1 else tuple(rungs),
        transfer_dtype="int16",
    )
    engine._pad_rungs = rungs  # for per-rung warmup in main()
    # the memorized training wavs: serving payloads slice these so the
    # briefly-trained model emits eos early (realistic hyp lengths), as
    # bench.py's trained phase does
    return engine, np.asarray(wavs)


def main():
    from stac_st_tpu.serving_http import STHttpServer
    from stac_st_tpu.serving_stream import StreamingFrontEnd

    n_clients = int(os.environ.get("STAC_SERVE_CLIENTS", "16"))
    load_seconds = float(os.environ.get("STAC_SERVE_SECONDS", "45"))
    max_batch = int(os.environ.get("STAC_SERVE_MAXBATCH", "16"))
    # STAC_SERVE_TRANSPORT: http (default) | grpc — same engine, same
    # coalescing front end, different ingress, so the two runs isolate
    # transport overhead (JSON+base64+HTTP vs protobuf+HTTP/2).
    transport = os.environ.get("STAC_SERVE_TRANSPORT", "http").lower()

    engine, wav_bank = _build_trained_engine()
    payloads = {}
    for j, d in enumerate(DURATIONS):
        wav = wav_bank[j % len(wav_bank), : int(d * SR)]
        pcm = np.clip(wav * 32768.0, -32768, 32767).astype(np.int16)
        payloads[d] = json.dumps({
            "audio_pcm16_b64": base64.b64encode(
                np.ascontiguousarray(pcm).tobytes()).decode(),
            "source_lang": "es", "target_lang": "en",
        })

    # direct engine RTFx (fused encode+search, no HTTP): the serving
    # engine identity without transport overhead. STAC_SERVE_NODIRECT=1
    # skips it (saves the beam-path compiles when load-testing the
    # continuous front end, which never runs those programs).
    direct_rtfx = None
    if os.environ.get("STAC_SERVE_NODIRECT") != "1":
        direct_wavs = [wav_bank[i % len(wav_bank)] for i in range(16)]
        warm = engine.translate(direct_wavs)  # warmup/compile (top rung)
        # with a pad ladder every rung is its own compiled shape: warm
        # each BEFORE the load window so no request pays a compile
        for rung in getattr(engine, "_pad_rungs", [])[:-1]:
            engine.translate(direct_wavs[:rung])
            print(f"# warmed pad rung {rung}", flush=True)
        hyp_lens = [len(t.split()) for t in warm]
        print(f"# mean hyp len: {sum(hyp_lens) / len(hyp_lens):.1f}",
              flush=True)
        t0 = time.time()
        for _ in range(3):
            engine.translate(direct_wavs)
        direct_rtfx = 16 * 10.0 * 3 / (time.time() - t0)
        print(f"# direct engine RTFx (fused, B16x10s): {direct_rtfx:.1f}",
              flush=True)

    front_kind = os.environ.get("STAC_SERVE_FRONT", "batch").lower()
    if front_kind == "continuous":
        from stac_st_tpu.serving_continuous import ContinuousBatchingEngine

        rungs_spec = os.environ.get("STAC_SERVE_ADMIT_RUNGS")
        front = ContinuousBatchingEngine(
            engine,
            slots=int(os.environ.get("STAC_SERVE_SLOTS", "16")),
            chunk=int(os.environ.get("STAC_SERVE_CHUNK", "16")),
            admit_rungs=(tuple(int(s) for s in rungs_spec.split(","))
                         if rungs_spec else None),
        )
        front.warmup()
        print("# continuous front end warmed", flush=True)
    else:
        front = StreamingFrontEnd(engine, max_batch=max_batch,
                                  max_wait_ms=20)
    if transport == "grpc":
        from stac_st_tpu.serving_grpc import STGrpcClient, STGrpcServer

        server = STGrpcServer(front, port=0,
                              max_workers=max(32, n_clients)).start()
    else:
        server = STHttpServer(front, host="127.0.0.1", port=0).start()
    port = server.port
    # per-duration raw waveforms for the gRPC clients (the HTTP payloads
    # above carry the same audio as PCM16+base64 JSON)
    grpc_wavs = {d: np.ascontiguousarray(
        wav_bank[j % len(wav_bank), : int(d * SR)], np.float32)
        for j, d in enumerate(DURATIONS)}

    # ---- warmup: compile every bucket before the timed window ------------
    for d in DURATIONS:
        if transport == "grpc":
            with STGrpcClient(f"127.0.0.1:{port}") as c:
                r = c.translate(grpc_wavs[d], "es", "en", timeout=600)
                assert isinstance(r, str)  # empty hyp is still a 200
        else:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request("POST", "/v1/translate", payloads[d],
                         {"Content-Type": "application/json"})
            assert conn.getresponse().read()
            conn.close()
    print("# warmup done", flush=True)
    hist0 = (front.batch_histogram()
             if hasattr(front, "batch_histogram") else {})

    stop = threading.Event()
    lock = threading.Lock()
    latencies, done_audio = [], [0.0]
    errors = [0]

    def client_grpc(i):
        c = STGrpcClient(f"127.0.0.1:{port}")
        k = i
        while not stop.is_set():
            d = DURATIONS[k % len(DURATIONS)]
            k += 1
            t0 = time.perf_counter()
            try:
                # a completed RPC counts as served regardless of hyp
                # length (matches the HTTP path's status==200 criterion)
                c.translate(grpc_wavs[d], "es", "en", timeout=600)
                ok = True
            except Exception:
                ok = False
            dt = time.perf_counter() - t0
            with lock:
                if ok:
                    latencies.append(dt)
                    done_audio[0] += d
                else:
                    errors[0] += 1
        c.close()

    def client_http(i):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        k = i
        while not stop.is_set():
            d = DURATIONS[k % len(DURATIONS)]
            k += 1
            t0 = time.perf_counter()
            try:
                conn.request("POST", "/v1/translate", payloads[d],
                             {"Content-Type": "application/json"})
                resp = conn.getresponse()
                body = resp.read()
                ok = resp.status == 200 and b"text" in body
            except Exception:
                ok = False
                conn.close()
                conn = http.client.HTTPConnection(
                    "127.0.0.1", port, timeout=600)
            dt = time.perf_counter() - t0
            with lock:
                if ok:
                    latencies.append(dt)
                    done_audio[0] += d
                else:
                    errors[0] += 1
        conn.close()

    client = client_grpc if transport == "grpc" else client_http

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(n_clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(load_seconds)
    stop.set()
    for t in threads:
        t.join(timeout=600)
    elapsed = time.perf_counter() - t_start

    hist1 = (front.batch_histogram()
             if hasattr(front, "batch_histogram") else {})
    hist = {k: hist1.get(k, 0) - hist0.get(k, 0)
            for k in sorted(set(hist0) | set(hist1))}
    hist = {k: v for k, v in hist.items() if v > 0}
    utilization = (round(front.utilization(), 3)
                   if hasattr(front, "utilization") else None)
    server.close()
    front.close()

    lat = np.asarray(sorted(latencies))
    out = {
        "metric": f"served_rtfx_{transport}"
        + ("_continuous" if front_kind == "continuous" else ""),
        "value": round(done_audio[0] / elapsed, 2),
        "unit": "x_realtime_per_chip_served",
        "clients": n_clients,
        "requests_ok": len(latencies),
        "errors": errors[0],
        "latency_p50_ms": round(float(np.percentile(lat, 50)) * 1000, 1)
        if len(lat) else None,
        "latency_p95_ms": round(float(np.percentile(lat, 95)) * 1000, 1)
        if len(lat) else None,
        "latency_p99_ms": round(float(np.percentile(lat, 99)) * 1000, 1)
        if len(lat) else None,
        "batch_histogram": {str(k): v for k, v in hist.items()},
        "load_seconds": round(elapsed, 1),
        "engine_rtfx_direct": (round(direct_rtfx, 2)
                               if direct_rtfx is not None else None),
    }
    if utilization is not None:
        out["slot_utilization"] = utilization
    print(json.dumps(out))


if __name__ == "__main__":
    main()
