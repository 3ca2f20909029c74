#!/usr/bin/env python3
"""Measure exact top-k strategies at the beam-search hot shape.

The B16 headline decode trace (tools/exp_decode_profile.py,
docs/PERF.md) shows XLA's TopK custom-call over f32[16, 50000]
(beam 10 x vocab 5000 candidates per utterance) costs ~218 us per
step — ~18% of the search and ~55x the 3.2 MB read's HBM
speed-of-light. This tool times EXACT alternatives on the real chip:

  a) lax.top_k over [B, beam*V]            (what the search compiles today)
  b) two-stage chunked top_k: top-k within C chunks, then over C*k
  c) per-beam top_k [B*beam, V] -> combine [B, beam*k] -> top_k
     (exact: any beam contributes at most k entries to the global top-k)
  d) iterative argmax (k passes of max+mask)
  e) approx_max_k with recall_target=0.99/1.0 (for reference; NOT exact)

Every variant is checked for value/index equality against (a) on the
bench input (random normal — ties are measure-zero) before timing.

Usage: python -u tools/exp_topk.py    (real TPU)
Env: STAC_TK_BATCH (16), STAC_TK_BEAM (10), STAC_TK_VOCAB (5000),
     STAC_TK_ITERS (200).
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

    B = int(os.environ.get("STAC_TK_BATCH", "16"))
    BEAM = int(os.environ.get("STAC_TK_BEAM", "10"))
    V = int(os.environ.get("STAC_TK_VOCAB", "5000"))
    ITERS = int(os.environ.get("STAC_TK_ITERS", "200"))
    K = BEAM
    M = BEAM * V

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, M)).astype(np.float32))

    def flat(fn):
        # scan the op ITERS times inside one program so the tunnel's
        # ~28 ms dispatch cost is paid once (same methodology as
        # bench.py::_scanned_rtfx); perturb input against hoisting.
        def run(x):
            def body(c, i):
                v, idx = fn(x + i.astype(x.dtype) * 1e-9)
                return c + v.sum() + idx.sum().astype(jnp.float32), None
            tot, _ = lax.scan(body, jnp.zeros((), jnp.float32),
                              jnp.arange(ITERS))
            return tot
        return jax.jit(run)

    def t_topk(x):
        return lax.top_k(x, K)

    def t_chunked(chunks):
        def f(x):
            xc = x.reshape(B, chunks, M // chunks)
            cv, ci = lax.top_k(xc, K)                 # [B, C, K]
            base = (jnp.arange(chunks, dtype=jnp.int32) * (M // chunks))
            gi = ci + base[None, :, None]
            cv = cv.reshape(B, chunks * K)
            gi = gi.reshape(B, chunks * K)
            fv, fi = lax.top_k(cv, K)
            return fv, jnp.take_along_axis(gi, fi, axis=1)
        return f

    def t_perbeam(x):
        xb = x.reshape(B * BEAM, V)
        cv, ci = lax.top_k(xb, K)                     # [B*beam, K]
        base = (jnp.arange(BEAM, dtype=jnp.int32) * V)
        gi = ci.reshape(B, BEAM, K) + base[None, :, None]
        fv, fi = lax.top_k(cv.reshape(B, BEAM * K), K)
        return fv, jnp.take_along_axis(gi.reshape(B, BEAM * K), fi, axis=1)

    def t_iter_argmax(x):
        iota = lax.broadcasted_iota(jnp.int32, (B, M), 1)

        def body(carry, _):
            cur = carry
            i = jnp.argmax(cur, axis=-1)
            v = jnp.take_along_axis(cur, i[:, None], axis=1)[:, 0]
            cur = jnp.where(iota == i[:, None], -jnp.inf, cur)
            return cur, (v, i.astype(jnp.int32))

        _, (vs, js) = lax.scan(body, x, None, length=K)
        return vs.T, js.T

    def t_approx(recall):
        def f(x):
            return lax.approx_max_k(x, K, recall_target=recall,
                                    aggregate_to_topk=True)
        return f

    ref_v, ref_i = jax.jit(t_topk)(x)
    ref_v, ref_i = np.asarray(ref_v), np.asarray(ref_i)

    cands = [("lax.top_k [B,beam*V]", t_topk, True)]
    for c in (10, 25, 50, 100):
        if M % c == 0:
            cands.append((f"chunked C={c}", t_chunked(c), True))
    cands.append(("per-beam then combine", t_perbeam, True))
    cands.append(("iterative argmax", t_iter_argmax, True))
    cands.append(("approx recall=.99 (!exact)", t_approx(0.99), False))
    cands.append(("approx recall=.9999 (!exact)", t_approx(0.9999), False))

    print(f"# [B={B}, beam={BEAM}, V={V}] k={K}, {ITERS} scanned iters")
    for name, fn, exact in cands:
        v, i = jax.jit(fn)(x)
        v, i = np.asarray(v), np.asarray(i)
        ok = bool(np.array_equal(v, ref_v) and np.array_equal(i, ref_i))
        r = flat(fn)
        np.asarray(r(x))  # compile
        t0 = time.perf_counter()
        np.asarray(r(x))
        dt = time.perf_counter() - t0
        tag = "EXACT-MATCH" if ok else ("mismatch!" if exact else "approx")
        print(f"{dt * 1e6 / ITERS:9.1f} us/op  {tag:12s} {name}")


if __name__ == "__main__":
    main()
