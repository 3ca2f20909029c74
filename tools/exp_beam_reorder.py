#!/usr/bin/env python3
"""Measure beam-reorder strategies for the decode KV cache.

The B16 headline trace (docs/PERF.md) attributes ~24% of search device
time to the per-step beam-reorder gathers: the self-attention K/V cache
(int8, 6 layers x 2 tensors) is physically re-permuted by parent-beam
index every step, costing read+write of the whole allocated cache on
top of attention's mandatory read. The alternative — carry the cache
UNPERMUTED and resolve ancestry at attention time via a composed
ancestor table — eliminates the persistent rewrite but turns
attention's contiguous read into a (beam, time)-indexed gather. Whether
that wins depends on XLA's gather efficiency and fusion, so: measure.

Variants (one decoder layer at real shapes, 250-step while loop):
  A) reorder-carry   — today's scheme: gather K,V by parent each step
  B) anc-carry       — carry K,V fixed + composed anc[(row), t];
                       attention gathers K,V rows through anc
  C) anc-carry+onehot — like B but K_eff = einsum(onehot(anc), K)
                       (gather as MXU matmul instead of scatter-gather)

Each variant computes bit-equivalent attention output (checked vs A on
a short unrolled oracle before timing).

Usage: python -u tools/exp_beam_reorder.py   (real TPU)
Env: STAC_BR_BATCH (16), STAC_BR_BEAM (10), STAC_BR_T (254),
     STAC_BR_STEPS (250), STAC_BR_INT8 (1).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    B = int(os.environ.get("STAC_BR_BATCH", "16"))
    BEAM = int(os.environ.get("STAC_BR_BEAM", "10"))
    T = int(os.environ.get("STAC_BR_T", "254"))
    STEPS = int(os.environ.get("STAC_BR_STEPS", "250"))
    INT8 = os.environ.get("STAC_BR_INT8", "1") != "0"
    H, DH = 4, 64
    R = B * BEAM

    cdtype = jnp.int8 if INT8 else jnp.bfloat16
    rng = np.random.default_rng(0)

    def mk_cache():
        if INT8:
            return jnp.asarray(
                rng.integers(-127, 127, (R, H, T, DH)).astype(np.int8))
        return jnp.asarray(
            rng.standard_normal((R, H, T, DH)).astype(np.float32)
        ).astype(jnp.bfloat16)

    k0, v0 = mk_cache(), mk_cache()
    q_all = jnp.asarray(
        rng.standard_normal((STEPS, R, H, DH)).astype(np.float32)
    ).astype(jnp.bfloat16)
    new_kv = jnp.asarray(
        rng.standard_normal((STEPS, R, H, DH)).astype(np.float32))
    new_kv_c = (new_kv * 10).astype(np.int8) if INT8 else \
        jnp.asarray(new_kv).astype(jnp.bfloat16)
    new_kv_c = jnp.asarray(new_kv_c)
    # per-(step, utterance) parent permutations within the beam group
    par = np.stack([
        np.stack([rng.permutation(BEAM) for _ in range(B)])
        for _ in range(STEPS)]).astype(np.int32)          # [S, B, beam]
    # flat row index: parent row for each (b, beam)
    base = (np.arange(B)[:, None] * BEAM).astype(np.int32)
    par_rows = jnp.asarray(par + base[None])              # [S, B, beam]
    par_flat = par_rows.reshape(STEPS, R)

    def deq(x):
        return x.astype(jnp.bfloat16) * (1.0 / 10.0) if INT8 else x

    def attn(q, k, v):
        # q: [R,H,DH]; k,v carried dtype [R,H,T,DH]
        s = jnp.einsum("rhd,rhtd->rht", q, deq(k)).astype(jnp.float32)
        w = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("rht,rhtd->rhd", w, deq(v))

    def put(cache, x, t):
        return lax.dynamic_update_slice(
            cache, x.astype(cdtype)[:, :, None, :], (0, 0, t, 0))

    # ---- A: reorder the physical cache every step -------------------
    def run_A(k0, v0):
        def body(carry, xs):
            k, v, t = carry
            q, kvnew, prow = xs
            k = jnp.take(k, prow, axis=0)
            v = jnp.take(v, prow, axis=0)
            k = put(k, kvnew, t)
            v = put(v, kvnew, t)
            o = attn(q, k, v)
            return (k, v, t + 1), o.sum().astype(jnp.float32)

        (_, _, _), outs = lax.scan(
            body, (k0, v0, jnp.zeros((), jnp.int32)),
            (q_all, new_kv_c, par_flat))
        return outs

    # ---- B: fixed cache + composed ancestor table -------------------
    def run_B(k0, v0):
        anc0 = jnp.broadcast_to(
            jnp.arange(R, dtype=jnp.int32)[:, None], (R, T))

        def body(carry, xs):
            k, v, anc, t = carry
            q, kvnew, prow = xs
            # compose: row r's history is parent's history
            anc = jnp.take(anc, prow, axis=0)
            # slot t belongs to r itself (write-once, physical order)
            anc = jnp.where(jnp.arange(T)[None, :] == t,
                            jnp.arange(R, dtype=jnp.int32)[:, None], anc)
            k = put(k, kvnew, t)
            v = put(v, kvnew, t)
            idx = anc[:, None, :, None]                   # [R,1,T,1]
            k_eff = jnp.take_along_axis(k, idx, axis=0)
            v_eff = jnp.take_along_axis(v, idx, axis=0)
            o = attn(q, k_eff, v_eff)
            return (k, v, anc, t + 1), o.sum().astype(jnp.float32)

        (_, _, _, _), outs = lax.scan(
            body, (k0, v0, anc0, jnp.zeros((), jnp.int32)),
            (q_all, new_kv_c, par_flat))
        return outs

    # ---- C: fixed cache + one-hot matmul resolve --------------------
    def run_C(k0, v0):
        anc0 = jnp.broadcast_to(
            jnp.tile(jnp.arange(BEAM, dtype=jnp.int32), (B,))[:, None],
            (R, T))  # within-group ancestor

        def body(carry, xs):
            k, v, anc, t = carry
            q, kvnew, prow = xs
            anc = jnp.take(anc, prow, axis=0)
            within = jnp.tile(jnp.arange(BEAM, dtype=jnp.int32), (B,))
            anc = jnp.where(jnp.arange(T)[None, :] == t,
                            within[:, None], anc)
            k = put(k, kvnew, t)
            v = put(v, kvnew, t)
            oh = jax.nn.one_hot(
                anc.reshape(B, BEAM, T), BEAM, dtype=jnp.bfloat16)
            kg = deq(k).reshape(B, BEAM, H, T, DH)
            vg = deq(v).reshape(B, BEAM, H, T, DH)
            k_eff = jnp.einsum("bqtk,bkhtd->bqhtd", oh, kg)
            v_eff = jnp.einsum("bqtk,bkhtd->bqhtd", oh, vg)
            qq = q.reshape(B, BEAM, H, DH)
            s = jnp.einsum("bqhd,bqhtd->bqht", qq, k_eff
                           ).astype(jnp.float32)
            w = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
            o = jnp.einsum("bqht,bqhtd->bqhd", w, v_eff)
            return (k, v, anc, t + 1), o.sum().astype(jnp.float32)

        (_, _, _, _), outs = lax.scan(
            body, (k0, v0, anc0, jnp.zeros((), jnp.int32)),
            (q_all, new_kv_c, par_flat))
        return outs

    fA = jax.jit(run_A)
    oA = np.asarray(fA(k0, v0))
    print(f"# [B={B} beam={BEAM} H={H} T={T} Dh={DH}] "
          f"{'int8' if INT8 else 'bf16'} cache, {STEPS} steps, 1 layer")
    for name, fn in (("A reorder-carry", fA),
                     ("B anc gather", jax.jit(run_B)),
                     ("C anc one-hot", jax.jit(run_C))):
        o = np.asarray(fn(k0, v0))
        err = float(np.max(np.abs(o - oA))) / max(1e-9,
                                                  float(np.max(np.abs(oA))))
        np.asarray(fn(k0, v0))
        t0 = time.perf_counter()
        np.asarray(fn(k0, v0))
        dt = time.perf_counter() - t0
        print(f"{dt * 1e6 / STEPS:9.1f} us/step  rel_err={err:.2e}  {name}")


if __name__ == "__main__":
    main()
