#!/usr/bin/env python3
"""Micro-experiment: does an int4 KV cache beat int8 on this chip?

Follow-on to ``exp_int8_cache.py`` (which established that int8 halves
the decode loop's dominant HBM stream and the int8→bf16 convert fuses
into the attention matmul's operand load — shipped as
``kv_cache_dtype='int8'``). int4 would halve the cache bytes AGAIN —
IF this toolchain can (a) store jnp.int4 arrays and (b) fuse the
int4→bf16 convert into the operand load the way it does for int8. If
XLA materializes a wider copy, or int4 loads run at deci-rate on the
VPU, the experiment loses.

Variants, at decode bench shapes (B·beam=160 rows, H=4 heads x 6 layers
folded = 24, Dh=64, S=256):

  int8dq    : matmul(q, kT_int8.astype(bf16))  — today's shipped path
  int4dq    : matmul(q, kT_int4.astype(bf16))  — native int4 storage
  int4pack  : two int4 values packed per int8 byte along S, unpacked
              with shift/mask before the matmul — the fallback encoding
              if native int4 storage is rejected (same bytes as int4dq)

Measurement methodology is inherited from exp_int8_cache.py verbatim:
accumulator feedback against loop-invariant hoisting; per-step cost as
the slope between 250- and 1000-step programs (host transfer is the
only true barrier through this tunnel).

Run: python tools/exp_int4_cache.py   (needs the TPU free)
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, Dh, S = 160, 24, 64, 256  # 24 = 4 heads x 6 layers folded


def _loop(steps, unpack):
    @jax.jit
    def loop(q, kT, v):
        def body(c):
            t, q, acc = c
            q_t = (q.astype(jnp.float32) + acc * 1e-9).astype(q.dtype)
            k_op, v_op = unpack(kT, v)
            logits = jnp.matmul(q_t, k_op,
                                preferred_element_type=jnp.float32)
            w = jax.nn.softmax(logits.astype(jnp.float32), -1)
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
        np.asarray(c(q, kT, v))
        best = min(best, time.perf_counter() - t0)
    return best


def run(name, kT, v, unpack, nbytes):
    q0 = jnp.ones((B, H, 1, Dh), jnp.bfloat16)
    try:
        t_lo = _time(_loop(250, unpack), q0, kT, v)
        t_hi = _time(_loop(1000, unpack), q0, kT, v)
    except Exception as e:  # toolchain rejection is a result, not a crash
        print(json.dumps({"variant": name,
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)
        return None
    us = (t_hi - t_lo) / 750 * 1e6
    gbps = nbytes / (us * 1e-6) / 1e9
    print(json.dumps({"variant": name, "us_per_step": round(us, 1),
                      "cache_mb": round(nbytes / 1e6, 1),
                      "eff_gbps": round(gbps, 1)}), flush=True)
    return us


def main():
    rng = np.random.default_rng(0)
    k_f = rng.standard_normal((B, H, Dh, S)).astype(np.float32)
    v_f = rng.standard_normal((B, H, S, Dh)).astype(np.float32)

    def ident(kT, v):
        return kT.astype(jnp.bfloat16), v.astype(jnp.bfloat16)

    kT8 = jnp.asarray(np.clip(k_f * 40, -127, 127).astype(np.int8))
    v8 = jnp.asarray(np.clip(v_f * 40, -127, 127).astype(np.int8))
    run("int8dq", kT8, v8, ident, kT8.nbytes + v8.nbytes)

    k4 = np.clip(np.round(k_f * 2.3), -7, 7).astype(np.int8)
    v4 = np.clip(np.round(v_f * 2.3), -7, 7).astype(np.int8)
    try:
        kT4 = jnp.asarray(k4, jnp.int4)
        v4j = jnp.asarray(v4, jnp.int4)
        run("int4dq", kT4, v4j, ident,
            (k4.size + v4.size) // 2)
    except Exception as e:
        print(json.dumps({"variant": "int4dq",
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)

    # packed fallback: two int4 nibbles per int8 byte along the S axis
    def pack(x4, axis):
        lo, hi = np.split(x4, 2, axis=axis)  # halves along S
        return ((lo & 0x0F) | ((hi & 0x0F) << 4)).astype(np.int8)

    kp = jnp.asarray(pack(k4, axis=3))   # (B,H,Dh,S/2)
    vp = jnp.asarray(pack(v4, axis=2))   # (B,H,S/2,Dh)

    def unpack_nibbles(kT, v):
        def un(p, axis):
            lo = (p << 4).astype(jnp.int8) >> 4  # sign-extend low nibble
            hi = p >> 4                           # arithmetic shift: high
            return jnp.concatenate([lo, hi], axis=axis).astype(jnp.bfloat16)
        return un(kT, 3), un(v, 2)

    run("int4pack", kp, vp, unpack_nibbles, kp.nbytes + vp.nbytes)


if __name__ == "__main__":
    main()
