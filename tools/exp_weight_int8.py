#!/usr/bin/env python3
"""Micro-experiment: weight-only int8 for the low-batch decode step.

Every beam-search decode step re-reads ALL decoder weights from HBM
(~16·d_model²·n_layers bytes in bf16: 201 MB for the large preset).
With many rows (the full-budget bench runs B·beam = 160) that read is
amortized and the step is cache/compute-bound — but a latency-sensitive
single stream (beam 10 = 10 rows) amortizes it over almost nothing, so
the weight stream dominates and weight-only int8 storage could nearly
halve the step.

The open question is NOT whether int8→bf16 fuses into the matmul's
operand load — tools/exp_int8_cache.py proved it does on this toolchain
(223 vs 357 µs for the cache read, no materialized copy) — but whether
XLA's loop-invariant code motion hoists the convert OUT of the decode
while_loop when the int8 operand is itself loop-invariant (weights,
unlike the growing KV cache). A hoisted convert materializes the bf16
weights once per call and the loop reads bf16: zero per-step savings.

Variants, per row count r ∈ {10, 40, 160}, d=1024 (large preset), with
L=6 weight blocks of [d, 16d] each (16·d² ≈ one decoder layer's param
bytes; 6 blocks = 201 MB bf16 / 100 MB int8 per step):

  bf16    : x @ W_bf16                                  — today's path
  int8dq  : (x @ W_int8.astype(bf16)) * col_scale       — dequant-on-read
  int8mm  : dyn-quant x → int8; int8×int8 matmul, i32   — native MXU int8

Methodology as in exp_int8_cache.py: per-step cost is the SLOPE between
two trip counts (dispatch + transfer cancel), accumulator feedback
defeats hoisting of the x-side, host transfer forces completion.

Run: python tools/exp_weight_int8.py   (needs the TPU free)
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

D = 1024
FF = 16 * D  # one layer's total param bytes folded into one matmul
L = 6


def _loop(steps, mode):
    @jax.jit
    def loop(x, ws, scales):
        def body(c):
            t, x, acc = c
            h = (x.astype(jnp.float32) + acc * 1e-9).astype(jnp.bfloat16)
            out = jnp.zeros((x.shape[0], D), jnp.float32)
            for i in range(L):
                w, s = ws[i], scales[i]
                if mode == "bf16":
                    y = jnp.matmul(h, w, preferred_element_type=jnp.float32)
                elif mode == "int8dq":
                    y = jnp.matmul(h, w.astype(jnp.bfloat16),
                                   preferred_element_type=jnp.float32)
                    y = y * s[None, :]
                elif mode == "int8mm":
                    sx = jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0
                    hq = jnp.round(h.astype(jnp.float32) / sx).astype(jnp.int8)
                    y = jnp.matmul(hq, w, preferred_element_type=jnp.int32)
                    y = y.astype(jnp.float32) * sx * s[None, :]
                else:
                    raise ValueError(mode)
                # fold FF back to D so the next block consumes it (keeps
                # every weight block live in the loop body)
                out = out + y.reshape(x.shape[0], FF // D, D).sum(1)
            return t + 1, x, acc + out

        def cond(c):
            return c[0] < steps

        _, _, acc = jax.lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32), x,
             jnp.zeros((x.shape[0], D), jnp.float32)))
        return acc

    return loop


def measure(rows, mode, lo=32, hi=128):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((rows, D)), jnp.bfloat16)
    w_f = rng.standard_normal((L, D, FF)).astype(np.float32) * 0.02
    if mode == "bf16":
        ws = jnp.asarray(w_f, jnp.bfloat16)
        scales = jnp.ones((L, FF), jnp.float32)
    else:
        s = np.abs(w_f).max(axis=1) / 127.0  # (L, FF) per-column scale
        ws = jnp.asarray(np.round(w_f / s[:, None, :]), jnp.int8)
        scales = jnp.asarray(s, jnp.float32)

    out = {}
    for steps in (lo, hi):
        fn = _loop(steps, mode)
        np.asarray(fn(x, ws, scales))  # compile + warm
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            np.asarray(fn(x, ws, scales))  # host transfer forces completion
        out[steps] = (time.perf_counter() - t0) / n
    per_step = (out[hi] - out[lo]) / (hi - lo)
    return per_step * 1e6  # µs/step


def main():
    res = {}
    for rows in (10, 40, 160):
        for mode in ("bf16", "int8dq", "int8mm"):
            us = measure(rows, mode)
            res[f"r{rows}_{mode}"] = round(us, 1)
            print(f"rows={rows:4d} {mode:7s}: {us:8.1f} us/step", flush=True)
    # speed-of-light references at 819 GB/s
    res["sol_bf16_us"] = round(L * D * FF * 2 / 819e9 * 1e6, 1)
    res["sol_int8_us"] = round(L * D * FF * 1 / 819e9 * 1e6, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
