"""Continuous (in-flight) batching: a persistent decode loop over slots.

The coalescing front end (``serving_stream.py``) forms a batch and decodes
it TO COMPLETION — one long utterance holds every row of its batch hostage,
and a request arriving just after a batch forms waits out the whole engine
call (head-of-line blocking at the decode level). This module removes both:
a fixed pool of SLOTS decodes greedily in lock-step, and whenever a slot
finishes (eos / budget), the host swaps a queued request into it between
device dispatches while the other slots keep generating. The reference has
no serving story at all (its inference is the batch recipe
``stac-st/inference.py``); this is the production serving pattern
(vLLM-style continuous batching) built TPU-first.

TPU-native design — the device never sees the raggedness:

* ONE compiled step program over all R slots, static shapes everywhere.
  Each slot sits at its own decode depth: the per-layer KV write index is
  an (R, 1, 1, 1) array and the fused where-append + causal bias broadcast
  over it (``TransformerMultiTask.decode_step_rows``), so ragged slots
  advance independently inside one batched matmul step.
* Steps run in CHUNKS of ``chunk`` tokens per dispatch (a ``lax.scan``),
  amortizing the host→device dispatch round trip; finished slots inside a
  chunk emit a sentinel and are refilled at the next chunk boundary.
* ADMISSION is BATCHED: queued requests are grouped by audio bucket and
  admitted through one compiled program per (bucket, rung) shape — encode
  the group together (the expensive part amortizes exactly like the batch
  engine's encoder), pad encoder outputs to the largest bucket's frame
  count (extra columns are masked by the per-slot cross-attention bias —
  padded weights underflow to exact zeros), prime the 3-token language
  prompts through ``decode_window``, and SCATTER the primed rows into
  their slots in one op. Rows padding the group up to the rung scatter to
  index R with ``mode='drop'`` — the device-native way to mask a write.
  The language prompt is per-slot runtime data, so one pool serves any
  mix of ASR/ST and language pairs simultaneously.
* State buffers are donated back to each program (``donate_argnums``), so
  the persistent caches never copy.
* MESH composition: given an :class:`STEngine` built over a ``data`` mesh,
  the slot pool is sharded on its row axis (R/d slots' KV cache per
  device) and params stay replicated. The chunk step is row-independent,
  so GSPMD partitions it collective-free — per-device work drops to R/d
  rows while the host loop stays a single program. Admission scatters
  replicated rows onto whichever shard owns the target slot.

Decoding in the slot loop is GREEDY (beam 1): one hypothesis per slot is
what makes slot swapping exact and cheap. Output per utterance is exactly
the model's greedy decode (tests/test_serving_continuous.py asserts token
equality vs a sequential single-utterance oracle). For deployments that
need the reference TEST-PROTOCOL output (beam 10, eos-threshold, length
normalization, temperature 1.15 — ``transformer_multitask.yaml:228-251``),
``protocol_finalize=True`` turns the loop into the draft tier of a
HYBRID: finished utterances are re-decoded through the batch engine's
protocol search by a finalizer thread (batched per bucket × language
pair), the greedy draft streams to the caller immediately
(``submit(on_draft=...)``), and the future resolves with text
token-identical to ``STEngine.translate``/``transcribe``. Draft/final
agreement is surfaced in ``stats()['draft_exact']``.
"""

from __future__ import annotations

import contextlib
import logging
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops import masks as M

logger = logging.getLogger(__name__)

__all__ = ["ContinuousBatchingEngine"]

_PROMPT_LEN = 3  # [bos, src_lang, tgt_lang] — mutitask_decoder.py:85-103


@dataclass
class _Request:
    wav: np.ndarray
    source_lang: str
    target_lang: str
    future: Future = field(default_factory=Future)
    t_submit: float = 0.0
    on_draft: Optional[object] = None


class _Slot:
    """Host-side mirror of one device slot."""

    __slots__ = ("req", "tokens", "active", "t_admit")

    def __init__(self):
        self.req: Optional[_Request] = None
        self.tokens: List[int] = []
        self.active = False
        self.t_admit = 0.0


class ContinuousBatchingEngine:
    """Slot-based continuous batching over an :class:`STEngine`'s model.

    ::

        cont = ContinuousBatchingEngine(engine, slots=8, chunk=16)
        fut = cont.submit(wav, task="translate")
        text = fut.result()
        cont.close()

    Parameters: ``slots`` — decode-loop width R (rows per step; size it to
    the expected concurrency — idle slots still ride the batched matmuls);
    ``chunk`` — decode steps per device dispatch (finished slots wait at
    most one chunk for refill; larger chunks amortize dispatch overhead);
    ``max_new_tokens`` — per-utterance generation budget (defaults to the
    engine's serving cap; per-slot budget is
    ``min(valid encoder frames, cap)`` — the reference's
    ``max_decode_ratio`` semantic); ``admit_rungs`` — admission group
    sizes, one compiled program per (bucket, rung); a queued burst admits
    at the smallest rung that fits, so a lone request pays a 1-row encode
    while a burst amortizes one encoder pass over the whole group
    (default ladder: 1, 4, ``slots``). The engine's
    ``kv_cache_dtype='int8'`` and ``weights_int8`` compose with this loop.
    """

    def __init__(self, engine, slots: int = 8, chunk: int = 16,
                 max_new_tokens: Optional[int] = None,
                 admit_rungs: Optional[Sequence[int]] = None,
                 queue_capacity: int = 1024,
                 protocol_finalize: bool = False,
                 finalize_batch: int = 8,
                 finalize_linger: float = 0.02):
        from .ops import pallas as pallas_mod

        if pallas_mod.is_enabled():
            raise RuntimeError(
                "ContinuousBatchingEngine does not support the opt-in "
                "Pallas decode kernels (they take a scalar cache index); "
                "disable them for continuous serving")
        if slots < 1 or chunk < 1:
            raise ValueError("slots and chunk must be >= 1")
        self.engine = engine
        self.mesh = getattr(engine, "mesh", None)
        if self.mesh is not None:
            d = int(self.mesh.shape["data"])
            if int(slots) % d:
                raise ValueError(
                    f"slots={slots} must be a multiple of the mesh's "
                    f"data-axis size {d}: the slot pool is sharded on its "
                    f"row axis across the mesh")
        self.slots = int(slots)
        self.chunk = int(chunk)
        self.eos = int(engine.searcher.config.eos_index)
        self.bos = int(engine.searcher.bos_token)
        self.cap = int(max_new_tokens or engine.searcher.max_decode_tokens
                       or 192)
        self._kv_dtype = engine.searcher.kv_cache_dtype
        R, CAP = self.slots, _PROMPT_LEN + self.cap

        if admit_rungs is None:
            admit_rungs = (1, 4, self.slots)
        rungs = sorted({int(r) for r in admit_rungs
                        if 1 <= int(r) <= self.slots})
        if not rungs:
            raise ValueError(f"admit_rungs {admit_rungs!r}: no rung in "
                             f"[1, slots={self.slots}]")
        if rungs[-1] != self.slots:
            rungs.append(self.slots)  # a full-pool burst must fit one call
        self._admit_rungs: Tuple[int, ...] = tuple(rungs)

        model = engine._transformer
        seq_def = engine.searcher.seq_lin_def
        encode = engine._encode
        eos_const = self.eos
        cap_const = self.cap
        kv_dtype = self._kv_dtype

        # encoder frame count per bucket width (static, via eval_shape)
        widths = [int(b * engine.sample_rate) for b in engine.buckets]
        self._widths = widths
        probe = jax.eval_shape(
            encode, engine.params, engine.cmvn,
            jax.ShapeDtypeStruct((1, widths[-1]), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        )
        self._S_max = S_max = probe.shape[1]
        enc_dtype = probe.dtype

        def _init_state(params):
            enc0 = jnp.zeros((R, S_max, probe.shape[2]), enc_dtype)
            bias0 = jnp.full((R, 1, 1, S_max), M.NEG_INF, jnp.float32)
            cache = model.apply(
                params["Transformer"], enc0, CAP, bias0, 1, False,
                kv_dtype, method=model.init_decode_cache,
            )
            layers = [
                {**ly, "self": {**ly["self"],
                                "index": jnp.zeros((R, 1, 1, 1), jnp.int32)}}
                for ly in cache["layers"]
            ]
            return {
                "layers": layers,
                "enc_bias": bias0,
                "pos": jnp.zeros((R,), jnp.int32),
                "last": jnp.zeros((R,), jnp.int32),
                "done": jnp.ones((R,), bool),
                "gen": jnp.zeros((R,), jnp.int32),
                "budget": jnp.zeros((R,), jnp.int32),
            }

        # Mesh composition (data parallel × continuous): the slot pool is
        # SHARDED on its row axis over the mesh's ``data`` axis — each
        # device owns R/d slots' KV cache and advances them locally (the
        # chunk step is row-independent, so XLA partitions it with zero
        # collectives; only the tiny emitted-token gather crosses the
        # mesh). Params/CMVN stay replicated (STEngine already placed
        # them), and admission groups are replicated rows whose scatter
        # lands on whichever shard owns the target slot.
        if self.mesh is None:
            shard_R = repl = None
            self._state = jax.jit(_init_state)(engine.params)
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            shard_R = NamedSharding(self.mesh, PartitionSpec("data"))
            repl = NamedSharding(self.mesh, PartitionSpec())
            self._state = jax.jit(
                _init_state, out_shardings=shard_R)(engine.params)

        def _admit_batch(params, cmvn, state, slot_ids, valid, wavs, lens,
                         prompts):
            """Encode + prompt-prime a GROUP of utterances into slots.

            Compiled once per (bucket width, rung A); ``slot_ids`` (A,),
            ``valid`` (A,) bool, and the language ``prompts`` (A, 3) are
            runtime data. Rows with ``valid=False`` pad the group up to
            the rung: their scatter index becomes R and ``mode='drop'``
            discards the write on device — no masking select needed.
            Returns (state', first tokens (A,), done flags (A,)) — the
            first generated token comes free from each prompt's last
            hidden state."""
            enc = encode(params, cmvn, wavs, lens)  # (A, S_w, d)
            A, S_w = enc.shape[0], enc.shape[1]
            # reference mask semantics against the NATIVE frame count
            # (masks.src_key_padding_mask_encode), then mask all padding
            abs_len = jnp.floor(lens * S_w)  # (A,)
            mask = jnp.arange(S_max)[None, :] > abs_len[:, None]
            bias = M.additive_bias(mask[:, None, None, :])  # (A,1,1,S_max)
            enc_p = jnp.pad(enc, ((0, 0), (0, S_max - S_w), (0, 0)))
            cache_a = model.apply(
                params["Transformer"], enc_p, CAP, bias, 1, False,
                kv_dtype, method=model.init_decode_cache,
            )
            hidden, cache_a = model.apply(
                params["Transformer"], prompts,
                jnp.zeros((), jnp.int32), cache_a,
                method=model.decode_window,
            )  # (A, P, d)
            logits = seq_def.apply(params["seq_lin"], hidden[:, -1, :])
            first = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (A,)
            valid_frames = (abs_len + 1).astype(jnp.int32)  # frames kept
            budget = jnp.minimum(valid_frames, cap_const)
            first_is_eos = first == eos_const
            gen0 = jnp.where(first_is_eos, 0, 1)
            done0 = first_is_eos | (gen0 >= budget)

            # invalid rows scatter out of range; mode='drop' masks them
            tgt = jnp.where(valid, slot_ids, R)

            def scat(big, rows):
                return big.at[tgt].set(rows.astype(big.dtype), mode="drop")

            idx_rows = jnp.full((A, 1, 1, 1), _PROMPT_LEN, jnp.int32)
            layers = []
            for big, row in zip(state["layers"], cache_a["layers"]):
                sb, sr = big["self"], row["self"]
                merged = {
                    "k": scat(sb["k"], sr["k"]),
                    "v": scat(sb["v"], sr["v"]),
                    "index": sb["index"].at[tgt].set(idx_rows, mode="drop"),
                }
                for nm in ("k_scale", "v_scale"):
                    if nm in sb:
                        merged[nm] = scat(sb[nm], sr[nm])
                layer = {
                    "self": merged,
                    "cross_k": scat(big["cross_k"], row["cross_k"]),
                    "cross_v": scat(big["cross_v"], row["cross_v"]),
                }
                for nm in ("cross_k_scale", "cross_v_scale"):
                    if nm in big:
                        layer[nm] = scat(big[nm], row[nm])
                layers.append(layer)

            def put(arr, vals, dtype):
                return arr.at[tgt].set(vals.astype(dtype), mode="drop")

            return {
                "layers": layers,
                "enc_bias": scat(state["enc_bias"], bias),
                "pos": put(state["pos"],
                           jnp.full((A,), _PROMPT_LEN, jnp.int32),
                           jnp.int32),
                "last": put(state["last"], first, jnp.int32),
                "done": put(state["done"], done0, bool),
                "gen": put(state["gen"], gen0, jnp.int32),
                "budget": put(state["budget"], budget, jnp.int32),
            }, first, done0

        if self.mesh is None:
            self._admit_batch = jax.jit(_admit_batch, donate_argnums=(2,))
        else:
            self._admit_batch = jax.jit(
                _admit_batch, donate_argnums=(2,),
                in_shardings=(repl, repl, shard_R, repl, repl, repl, repl,
                              repl),
                out_shardings=(shard_R, repl, repl),
            )

        def _step_chunk(params, state):
            """Advance every slot ``chunk`` greedy steps in one dispatch.

            Finished slots keep riding the batched matmuls (static
            shapes) but emit the -1 sentinel; their stale cache rows are
            fully overwritten on the next admit."""

            def body(st, _):
                cache = {"layers": st["layers"],
                         "enc_bias": st["enc_bias"]}
                hidden, cache = model.apply(
                    params["Transformer"], st["last"], st["pos"], cache,
                    method=model.decode_step_rows,
                )  # (R, d)
                logits = seq_def.apply(params["seq_lin"], hidden)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                active = jnp.logical_not(st["done"])
                is_eos = nxt == eos_const
                emit_ok = active & jnp.logical_not(is_eos)
                emit = jnp.where(emit_ok, nxt, -1)
                gen = st["gen"] + emit_ok.astype(jnp.int32)
                done = st["done"] | (active & is_eos) | (gen >= st["budget"])
                st2 = {
                    "layers": cache["layers"],
                    "enc_bias": st["enc_bias"],
                    "pos": jnp.where(active, st["pos"] + 1, st["pos"]),
                    "last": jnp.where(emit_ok, nxt, st["last"]),
                    "done": done,
                    "gen": gen,
                    "budget": st["budget"],
                }
                return st2, emit

            state, emits = jax.lax.scan(body, state, None,
                                        length=self.chunk)
            return state, jnp.swapaxes(emits, 0, 1), state["done"]

        if self.mesh is None:
            self._step_chunk = jax.jit(_step_chunk, donate_argnums=(1,))
        else:
            self._step_chunk = jax.jit(
                _step_chunk, donate_argnums=(1,),
                in_shardings=(repl, shard_R),
                out_shardings=(shard_R, repl, repl),
            )

        # ------------------------------------------------- host-side loop
        self._queue: "queue.Queue[_Request]" = queue.Queue(queue_capacity)
        self._slots = [_Slot() for _ in range(R)]
        self._free = list(range(R))
        self._closing = threading.Event()
        self._pause_req = threading.Event()
        self._pause_ack = threading.Event()
        self._stats: Dict[str, float] = {
            "submitted": 0, "completed": 0, "chunks": 0, "admits": 0,
            "admit_calls": 0, "tokens": 0, "active_slot_steps": 0,
            "slot_steps": 0,
        }
        self._lock = threading.Lock()

        # ------------------------------------------- protocol finalization
        # Hybrid serving (VERDICT r4 item 3): the slot loop produces a
        # GREEDY DRAFT with continuous-batching latency; finished
        # utterances are then re-decoded through the batch engine's
        # test-protocol search (beam 10, eos-threshold, length norm,
        # temperature 1.15 — transformer_multitask.yaml:228-251) by a
        # finalizer thread, batched per (bucket, language-pair) group.
        # The future resolves with the PROTOCOL-EXACT text (token streams
        # identical to STEngine.translate/transcribe — same wav, same
        # bucket width, row-independent search); the draft reaches the
        # caller early via submit(on_draft=...). Draft-vs-final agreement
        # is tracked in stats()['draft_exact'].
        self.protocol_finalize = bool(protocol_finalize)
        self._finalize_batch = max(1, int(finalize_batch))
        self._finalize_linger = float(finalize_linger)
        self._final_q: "queue.Queue[tuple]" = queue.Queue()
        self._finalizer: Optional[threading.Thread] = None
        if self.protocol_finalize:
            self._stats.update({"finalized": 0, "draft_exact": 0})
            self._finalizer = threading.Thread(
                target=self._finalize_loop, name="protocol-finalizer",
                daemon=True)
            self._finalizer.start()

        self._worker = threading.Thread(
            target=self._run, name="continuous-batching", daemon=True)
        self._worker.start()

    # ----------------------------------------------------------------- API
    def start(self) -> None:
        """Front-end protocol no-op: the slot loop starts at construction.

        Present so the engine drops into :class:`~.serving_http.STHttpServer`
        / :class:`~.serving_grpc.STGrpcServer` wherever a
        :class:`~.serving_stream.StreamingFrontEnd` is expected."""

    def stats(self) -> Dict[str, float]:
        """Snapshot of loop counters (front-end protocol)."""
        with self._lock:
            snap = dict(self._stats)
        snap["queued"] = self._queue.qsize()
        snap["active_slots"] = sum(1 for s in self._slots if s.active)
        total = snap["slot_steps"]
        snap["utilization"] = (
            snap["active_slot_steps"] / total if total else 0.0)
        return snap

    def warmup(self) -> int:
        """Compile every (bucket × admit-rung) admission program and the
        chunk step before traffic arrives. The worker is paused and each
        program runs once with an all-invalid group (every scatter row
        drops), so live state is untouched and no fake requests appear in
        the counters. Returns the number of programs warmed."""
        eng = self.engine
        n = 0
        with self._pause_worker():
            for width in self._widths:
                for rung in self._admit_rungs:
                    wavs = jnp.zeros((rung, width), jnp.float32)
                    lens = jnp.ones((rung,), jnp.float32)
                    prompts = jnp.full((rung, _PROMPT_LEN), self.bos,
                                       jnp.int32)
                    slot_ids = jnp.zeros((rung,), jnp.int32)
                    valid = jnp.zeros((rung,), bool)
                    self._state, _, _ = self._admit_batch(
                        eng.params, eng.cmvn, self._state, slot_ids,
                        valid, wavs, lens, prompts)
                    n += 1
            # the chunk step: safe on an all-done pool (pos/gen gated on
            # active; writes at stale indices are overwritten on admit)
            self._state, _, _ = self._step_chunk(eng.params, self._state)
            n += 1
        return n

    def submit(self, wav: np.ndarray, task: str = "translate",
               source_lang: Optional[str] = None,
               target_lang: Optional[str] = None,
               on_draft=None) -> Future:
        """Enqueue one utterance; the Future resolves to the decoded text.

        ``task``: 'translate' (src→tgt) or 'transcribe' (src→src).
        ``on_draft``: with ``protocol_finalize``, called with the greedy
        draft text as soon as the slot loop finishes it (the future then
        resolves later with the protocol-exact beam text)."""
        if self._closing.is_set():
            raise RuntimeError("engine is closed")
        src = source_lang or self.engine.source_lang
        if task == "translate":
            tgt = target_lang or self.engine.target_lang
        elif task == "transcribe":
            tgt = src
        else:
            raise ValueError(
                f"the continuous engine serves translate|transcribe; "
                f"{task!r} needs the batch front end "
                f"(serving_stream.StreamingFrontEnd)")
        wav = np.asarray(wav)
        if wav.dtype == np.int16:
            wav = wav.astype(np.float32) / 32768.0
        else:
            wav = wav.astype(np.float32)
        req = _Request(wav=wav, source_lang=src, target_lang=tgt,
                       t_submit=time.monotonic())
        req.on_draft = on_draft
        self._queue.put(req)
        with self._lock:
            self._stats["submitted"] += 1
        return req.future

    def translate(self, wavs, source_lang=None, target_lang=None):
        futs = [self.submit(w, "translate", source_lang, target_lang)
                for w in wavs]
        return [f.result() for f in futs]

    def transcribe(self, wavs, source_lang=None):
        futs = [self.submit(w, "transcribe", source_lang) for w in wavs]
        return [f.result() for f in futs]

    def close(self, timeout: float = 60.0) -> None:
        """Drain in-flight work, then stop the worker (and finalizer)."""
        self._closing.set()
        self._worker.join(timeout)
        if self._finalizer is not None:
            self._finalizer.join(timeout)
            # finalizer died/timed out with work pending: fail loudly
            while True:
                try:
                    req, _draft = self._final_q.get_nowait()
                except queue.Empty:
                    break
                req.future.set_exception(RuntimeError("engine closed"))
        # anything still queued after the drain window fails loudly
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            req.future.set_exception(RuntimeError("engine closed"))

    def utilization(self) -> float:
        """Mean fraction of slot-steps that carried an active request."""
        with self._lock:
            total = self._stats["slot_steps"]
            return (self._stats["active_slot_steps"] / total
                    ) if total else 0.0

    # ------------------------------------------------------------- worker
    @contextlib.contextmanager
    def _pause_worker(self):
        """Hold the worker at its loop top so device state can be touched
        from another thread (warmup)."""
        self._pause_req.set()
        try:
            while (self._worker.is_alive()
                   and not self._pause_ack.wait(timeout=0.1)):
                pass
            yield
        finally:
            self._pause_req.clear()

    def _prompt_ids(self, src: str, tgt: str) -> List[int]:
        sp = self.engine.tokenizer
        src_id = sp.encode_as_ids(f"[{src}]")[-1]
        tgt_id = sp.encode_as_ids(f"[{tgt}]")[-1]
        return [self.bos, src_id, tgt_id]

    def _admit_many(self, reqs: List[_Request]) -> None:
        """Admit queued requests into free slots: group by bucket width,
        one device call per (bucket, rung) group."""
        eng = self.engine
        nfree = len(self._free)
        if len(reqs) > nfree:  # e.g. the idle wake-up plus a full drain
            for req in reqs[nfree:]:
                self._queue.put(req)
            reqs = reqs[:nfree]
        groups: Dict[int, List[_Request]] = {}
        for req in reqs:
            groups.setdefault(eng._bucket_width(len(req.wav)),
                              []).append(req)
        for width, grp in groups.items():
            while grp:
                rung = next(r for r in self._admit_rungs
                            if r >= min(len(grp), self._admit_rungs[-1]))
                take, grp = grp[:rung], grp[rung:]
                try:
                    self._admit_group(width, rung, take)
                except Exception as e:
                    logger.exception("admit failed (width=%d rung=%d)",
                                     width, rung)
                    for req in take:
                        req.future.set_exception(e)

    def _admit_group(self, width: int, rung: int,
                     take: List[_Request]) -> None:
        eng = self.engine
        n = len(take)
        wavs = np.zeros((rung, width), np.float32)
        lens = np.ones((rung,), np.float32)
        prompts = np.full((rung, _PROMPT_LEN), self.bos, np.int32)
        slot_ids = np.zeros((rung,), np.int32)
        valid = np.zeros((rung,), bool)
        assigned: List[int] = []
        try:
            for i, req in enumerate(take):
                wavs[i, : len(req.wav)] = req.wav
                lens[i] = len(req.wav) / width
                prompts[i] = self._prompt_ids(req.source_lang,
                                              req.target_lang)
                s = self._free.pop()
                slot_ids[i] = s
                valid[i] = True
                assigned.append(s)
            self._state, first, done0 = self._admit_batch(
                eng.params, eng.cmvn, self._state, jnp.asarray(slot_ids),
                jnp.asarray(valid), jnp.asarray(wavs), jnp.asarray(lens),
                jnp.asarray(prompts),
            )
        except Exception:
            # a failed group must not leak its slots: nothing was
            # activated, so every popped slot returns to the free list
            self._free.extend(assigned)
            raise
        first = np.asarray(first)
        done0 = np.asarray(done0)
        now = time.monotonic()
        with self._lock:
            self._stats["admits"] += n
            self._stats["admit_calls"] += 1
        for i, (req, s) in enumerate(zip(take, assigned)):
            slot = self._slots[s]
            slot.req, slot.tokens, slot.active = req, [], True
            slot.t_admit = now
            tok = int(first[i])
            if tok != self.eos:
                slot.tokens.append(tok)
            if bool(done0[i]):
                self._finish(s)

    def _finish(self, s: int) -> None:
        slot = self._slots[s]
        req, tokens = slot.req, slot.tokens
        slot.req, slot.tokens, slot.active = None, [], False
        self._free.append(s)
        with self._lock:
            self._stats["completed"] += 1
            self._stats["tokens"] += len(tokens)
        try:
            text = self.engine.tokenizer.decode_ids(tokens)
        except Exception as e:  # tokenizer failure must not kill the loop
            req.future.set_exception(e)
            return
        if self.protocol_finalize:
            if req.on_draft is not None:
                try:
                    req.on_draft(text)
                except Exception:  # user callback must not kill the loop
                    logger.exception("on_draft callback failed")
            self._final_q.put((req, text))
        else:
            req.future.set_result(text)

    # ------------------------------------------------ protocol finalizer
    def _finalize_loop(self) -> None:
        """Batch finished drafts through the protocol-exact beam search.

        Groups by (source_lang, target_lang) so each batch engine call
        carries one prompt; within a call, STEngine buckets by audio
        width itself. Runs in its own thread — the device interleaves
        the beam programs with the slot loop's chunk programs."""
        while True:
            try:
                first = self._final_q.get(timeout=0.05)
            except queue.Empty:
                # drain-then-exit: once the slot worker has stopped, no
                # new drafts can arrive
                if self._closing.is_set() and not self._worker.is_alive():
                    return
                continue
            batch = [first]
            deadline = time.monotonic() + self._finalize_linger
            while len(batch) < self._finalize_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._final_q.get(timeout=remaining))
                except queue.Empty:
                    break
            groups: Dict[Tuple[str, str], List[tuple]] = {}
            for req, draft in batch:
                groups.setdefault(
                    (req.source_lang, req.target_lang), []
                ).append((req, draft))
            for (src, tgt), items in groups.items():
                try:
                    finals = self.engine.translate(
                        [r.wav for r, _ in items],
                        source_lang=src, target_lang=tgt)
                except Exception as e:
                    for req, _ in items:
                        req.future.set_exception(e)
                    continue
                exact = 0
                for (req, draft), final in zip(items, finals):
                    exact += final == draft
                    req.future.set_result(final)
                with self._lock:
                    self._stats["finalized"] += len(items)
                    self._stats["draft_exact"] += exact

    def _drain_queue(self) -> List[_Request]:
        """Pop up to len(free) queued requests without blocking."""
        reqs: List[_Request] = []
        while len(reqs) < len(self._free):
            try:
                reqs.append(self._queue.get_nowait())
            except queue.Empty:
                break
        return reqs

    def _advance_chunk(self, active: List[int]) -> None:
        self._state, emits, done = self._step_chunk(
            self.engine.params, self._state)
        emits = np.asarray(emits)
        done = np.asarray(done)
        with self._lock:
            self._stats["chunks"] += 1
            self._stats["slot_steps"] += self.slots * self.chunk
            self._stats["active_slot_steps"] += len(active) * self.chunk
        for s in active:
            toks = emits[s]
            self._slots[s].tokens.extend(
                int(t) for t in toks[toks >= 0])
            if done[s]:
                self._finish(s)

    def _run(self) -> None:
        while True:
            if self._pause_req.is_set():
                self._pause_ack.set()
                while (self._pause_req.is_set()
                       and not self._closing.is_set()):
                    time.sleep(0.001)
                self._pause_ack.clear()
            # refill free slots from the queue (grouped batched admits)
            reqs = self._drain_queue()
            if reqs:
                self._admit_many(reqs)
            active = [i for i, sl in enumerate(self._slots) if sl.active]
            if not active:
                if self._closing.is_set():
                    return
                try:
                    req = self._queue.get(timeout=0.05)
                except queue.Empty:
                    continue
                # merge the woken request with any burst right behind it
                self._admit_many([req] + self._drain_queue())
                continue
            # advance everyone by one chunk
            self._advance_chunk(active)
