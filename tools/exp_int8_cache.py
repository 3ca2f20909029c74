#!/usr/bin/env python3
"""Micro-experiment: is an int8 KV cache a decode-loop win on this chip?

The beam-search decode loop's dominant full-budget cost is the per-step
self-attention cache read (docs/PERF.md round-2/3 analyses). Storing K/V
in int8 halves the bytes read from HBM — IF the int8→bf16 convert fuses
into the attention matmul's operand load. If XLA instead materializes a
bf16 copy of the cache, the experiment loses (an extra full write).

Measurement notes (hard-won on this tunnel):
* a loop whose body is loop-invariant gets hoisted by XLA — feed the
  accumulator back into q so every iteration must re-read the cache;
* ``block_until_ready()`` does NOT block through the axon tunnel — only
  a host transfer does. Per-step cost is therefore derived as the SLOPE
  between a 250-step and a 1000-step program (the fixed dispatch +
  transfer cost cancels).

Variants, at decode bench shapes (B·beam=160 rows, H=4 heads x 6 layers
folded = 24, Dh=64, S=256):

  bf16    : matmul(q, kT_bf16)               — today's path
  int8dq  : matmul(q, kT_int8.astype(bf16))  — dequantize-on-read
  int8mm  : matmul(q_int8, kT_int8, i32 out) — native int8 MXU path

Run: python tools/exp_int8_cache.py   (needs the TPU free)
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, Dh, S = 160, 24, 64, 256  # 24 = 4 heads x 6 layers folded


def _loop(steps, q_dtype, out_dtype):
    @jax.jit
    def loop(q, kT, v):
        def body(c):
            t, q, acc = c
            # accumulator feedback: defeats loop-invariant hoisting
            q_t = (q.astype(jnp.float32) + acc * 1e-9).astype(q.dtype)
            k_op = (kT.astype(jnp.bfloat16)
                    if kT.dtype == jnp.int8 and q.dtype != jnp.int8 else kT)
            logits = jnp.matmul(q_t, k_op, preferred_element_type=out_dtype)
            w = jax.nn.softmax(logits.astype(jnp.float32), -1)
            v_op = v.astype(jnp.bfloat16) if v.dtype == jnp.int8 else v
            o = jnp.matmul(w.astype(v_op.dtype), v_op,
                           preferred_element_type=jnp.float32)
            return t + 1, q, acc + o

        def cond(c):
            return c[0] < steps

        _, _, acc = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), q,
                         jnp.zeros((B, H, 1, Dh), jnp.float32)))
        return acc

    return loop


def _time(fn, q, kT, v, reps=3):
    c = fn.lower(q, kT, v).compile()
    np.asarray(c(q, kT, v))  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(c(q, kT, v))  # host transfer = the only true barrier
        best = min(best, time.perf_counter() - t0)
    return best


def run(name, kT, v, q_dtype, out_dtype):
    q0 = jnp.ones((B, H, 1, Dh), q_dtype)
    t_lo = _time(_loop(250, q_dtype, out_dtype), q0, kT, v)
    t_hi = _time(_loop(1000, q_dtype, out_dtype), q0, kT, v)
    us = (t_hi - t_lo) / 750 * 1e6
    gbps = (kT.nbytes + v.nbytes) / (us * 1e-6) / 1e9
    print(json.dumps({"variant": name, "us_per_step": round(us, 1),
                      "cache_mb": round((kT.nbytes + v.nbytes) / 1e6, 1),
                      "eff_gbps": round(gbps, 1)}), flush=True)
    return us


def main():
    rng = np.random.default_rng(0)
    k_f = rng.standard_normal((B, H, Dh, S)).astype(np.float32)
    v_f = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    kT16 = jnp.asarray(k_f, jnp.bfloat16)
    v16 = jnp.asarray(v_f, jnp.bfloat16)
    kT8 = jnp.asarray(np.clip(k_f * 40, -127, 127).astype(np.int8))
    v8 = jnp.asarray(np.clip(v_f * 40, -127, 127).astype(np.int8))

    run("bf16", kT16, v16, jnp.bfloat16, jnp.float32)
    run("int8dq", kT8, v8, jnp.bfloat16, jnp.float32)
    run("int8mm", kT8, v8, jnp.int8, jnp.int32)


if __name__ == "__main__":
    main()
