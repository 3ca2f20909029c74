"""Continuous (in-flight) batching: exactness vs a sequential greedy oracle.

The contract: every utterance decoded through the slot loop yields EXACTLY
the model's greedy decode — independent of what other requests share the
slot pool, when the request was admitted, which slot it landed in, or how
often the slot was reused. The oracle below mirrors the admit math
(encode → pad to S_max → prompt prime via decode_window) and then takes
plain scalar decode steps; the engine must match token-for-token.
"""

import threading
import time

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stac_st_tpu.models import (
    ConvolutionFrontEnd,
    LinearHead,
    TransformerMultiTask,
)
from stac_st_tpu.ops import masks as M
from stac_st_tpu.ops.cmvn import cmvn_init
from stac_st_tpu.serving import STEngine
from stac_st_tpu.serving_continuous import ContinuousBatchingEngine

VOCAB = 150
CAP = 10  # small generation budget keeps the tests fast


@pytest.fixture(scope="module")
def parts(tmp_path_factory):
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_corpus, train_fixture_tokenizer

    root = str(tmp_path_factory.mktemp("contserve"))
    _, _, joint = make_corpus(root, n_utts=4, seconds=0.4)
    sp, _ = train_fixture_tokenizer(root, joint, vocab=VOCAB)

    cnn = ConvolutionFrontEnd(out_channels=(16, 16))
    transformer = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=20 * 16, d_model=32, nhead=4,
        num_encoder_layers=2, num_decoder_layers=2, d_ffn=64,
        dropout=0.0, normalize_before=True,
    )
    seq_lin = LinearHead(input_size=32, n_neurons=VOCAB)
    rng = jax.random.PRNGKey(0)
    feats = jnp.zeros((1, 41, 80))
    cnn_p = cnn.init(rng, feats)
    src = cnn.apply(cnn_p, feats)
    tr_p = transformer.init(rng, src, jnp.ones((1, 4), jnp.int32))
    enc = transformer.apply(tr_p, src, method=transformer.encode)
    params = {
        "CNN": cnn_p,
        "Transformer": tr_p,
        "seq_lin": seq_lin.init(rng, enc),
    }
    return dict(cnn=cnn, transformer=transformer, seq_lin=seq_lin,
                params=params, sp=sp)


def _build_engine(p, **kw):
    opts = dict(beam_size=2, bucket_seconds=(0.5, 1.0), bf16=False,
                max_decode_tokens=CAP)
    opts.update(kw)
    return STEngine(
        p["transformer"], p["cnn"], p["seq_lin"], None,
        p["params"], cmvn_init(80), p["sp"], **opts,
    )


def _oracle_tokens(engine, S_max, wav, src, tgt, cap=CAP):
    """Sequential greedy decode of one utterance, mirroring admit math."""
    model = engine._transformer
    seq = engine.searcher.seq_lin_def
    sp = engine.tokenizer
    eos = engine.searcher.config.eos_index
    src_id = sp.encode_as_ids(f"[{src}]")[-1]
    tgt_id = sp.encode_as_ids(f"[{tgt}]")[-1]
    prompt = jnp.asarray(
        [engine.searcher.bos_token, src_id, tgt_id], jnp.int32)

    width = engine._bucket_width(len(wav))
    batch = np.zeros((1, width), np.float32)
    batch[0, : len(wav)] = wav
    lens = jnp.asarray([len(wav) / width], jnp.float32)
    enc = engine._encode(engine.params, engine.cmvn,
                         jnp.asarray(batch), lens)
    S_w = enc.shape[1]
    abs_len = jnp.floor(lens * S_w)
    mask = jnp.arange(S_max)[None, :] > abs_len[:, None]
    bias = M.additive_bias(mask[:, None, None, :])
    enc_p = jnp.pad(enc, ((0, 0), (0, S_max - S_w), (0, 0)))
    tp = engine.params["Transformer"]
    cache = model.apply(
        tp, enc_p, 3 + cap, bias, 1, False,
        engine.searcher.kv_cache_dtype, method=model.init_decode_cache)
    hidden, cache = model.apply(
        tp, prompt[None, :], jnp.zeros((), jnp.int32), cache,
        method=model.decode_window)
    logits = seq.apply(engine.params["seq_lin"], hidden[:, -1, :])
    tok = int(jnp.argmax(logits[0]))
    budget = min(int(abs_len[0]) + 1, cap)
    out, pos = [], 3
    while tok != eos and len(out) < budget:
        out.append(tok)
        if len(out) >= budget:
            break
        hidden, cache = model.apply(
            tp, jnp.asarray([tok], jnp.int32), jnp.asarray(pos), cache,
            method=model.decode_step)
        logits = seq.apply(engine.params["seq_lin"], hidden)
        tok = int(jnp.argmax(logits[0]))
        pos += 1
    return out


def _wav(rng, seconds):
    return rng.standard_normal(int(seconds * 16000)).astype(np.float32)


class TestContinuousExactness:
    def test_single_matches_oracle(self, parts, rng):
        engine = _build_engine(parts)
        cont = ContinuousBatchingEngine(engine, slots=2, chunk=4)
        try:
            wav = _wav(rng, 0.4)
            got = cont.submit(wav, "translate").result(timeout=300)
            want = engine.tokenizer.decode_ids(
                _oracle_tokens(engine, cont._S_max, wav, "es", "en"))
            assert got == want
        finally:
            cont.close()

    def test_mixed_concurrent_matches_oracles(self, parts, rng):
        """9 mixed-length requests over 3 slots, both tasks interleaved:
        slot reuse, ragged depths, and mid-flight admission all exact."""
        engine = _build_engine(parts)
        cont = ContinuousBatchingEngine(engine, slots=3, chunk=3)
        try:
            specs = [
                (0.2, "translate"), (0.8, "transcribe"), (0.45, "translate"),
                (0.9, "translate"), (0.3, "transcribe"), (0.7, "translate"),
                (0.5, "transcribe"), (0.25, "translate"), (0.85, "translate"),
            ]
            wavs = [_wav(rng, s) for s, _ in specs]
            futs = [cont.submit(w, task) for w, (_, task) in
                    zip(wavs, specs)]
            got = [f.result(timeout=300) for f in futs]
            for g, w, (_, task) in zip(got, wavs, specs):
                tgt = "en" if task == "translate" else "es"
                want = engine.tokenizer.decode_ids(
                    _oracle_tokens(engine, cont._S_max, w, "es", tgt))
                assert g == want
            stats = cont.stats()
            assert stats["completed"] == len(specs)
            assert 0.0 < cont.utilization() <= 1.0
            assert stats["utilization"] == cont.utilization()
        finally:
            cont.close()

    def test_budget_cut(self, parts, rng):
        engine = _build_engine(parts)
        cont = ContinuousBatchingEngine(engine, slots=2, chunk=4,
                                        max_new_tokens=3)
        try:
            wav = _wav(rng, 0.4)
            got = cont.submit(wav).result(timeout=300)
            want = engine.tokenizer.decode_ids(
                _oracle_tokens(engine, cont._S_max, wav, "es", "en",
                               cap=3))
            assert got == want
            n_tokens = len(
                engine.tokenizer.encode_as_ids(got)) if got else 0
            assert n_tokens <= 4  # detok may merge; budget binds on ids
        finally:
            cont.close()

    def test_int8_kv_cache_matches_int8_oracle(self, parts, rng):
        engine = _build_engine(parts, kv_cache_dtype="int8")
        cont = ContinuousBatchingEngine(engine, slots=2, chunk=4)
        try:
            wavs = [_wav(rng, 0.3), _wav(rng, 0.8)]
            futs = [cont.submit(w) for w in wavs]
            got = [f.result(timeout=300) for f in futs]
            for g, w in zip(got, wavs):
                want = engine.tokenizer.decode_ids(
                    _oracle_tokens(engine, cont._S_max, w, "es", "en"))
                assert g == want
        finally:
            cont.close()

    def test_int8_weights_matches_int8_oracle(self, parts, rng):
        """Weight-only int8 composes: the slot loop runs the SAME
        quantized decoder params, so it must match the quantized
        sequential oracle token-for-token."""
        engine = _build_engine(parts, weights_int8=True)
        cont = ContinuousBatchingEngine(engine, slots=2, chunk=4)
        try:
            wav = _wav(rng, 0.5)
            got = cont.submit(wav).result(timeout=300)
            want = engine.tokenizer.decode_ids(
                _oracle_tokens(engine, cont._S_max, wav, "es", "en"))
            assert got == want
        finally:
            cont.close()


class TestContinuousLifecycle:
    def test_staggered_arrivals(self, parts, rng):
        """Requests arriving while others are mid-decode are admitted into
        freed slots and still decode exactly."""
        engine = _build_engine(parts)
        cont = ContinuousBatchingEngine(engine, slots=2, chunk=2)
        try:
            first = [cont.submit(_wav(rng, 0.8)) for _ in range(2)]
            time.sleep(0.1)
            late_wav = _wav(rng, 0.3)
            late = cont.submit(late_wav, "transcribe")
            for f in first:
                f.result(timeout=300)
            got = late.result(timeout=300)
            want = engine.tokenizer.decode_ids(
                _oracle_tokens(engine, cont._S_max, late_wav, "es", "es"))
            assert got == want
        finally:
            cont.close()

    def test_close_rejects_new_work(self, parts, rng):
        engine = _build_engine(parts)
        cont = ContinuousBatchingEngine(engine, slots=2, chunk=2)
        cont.close()
        with pytest.raises(RuntimeError):
            cont.submit(_wav(rng, 0.2))

    def test_close_drains_in_flight(self, parts, rng):
        engine = _build_engine(parts)
        cont = ContinuousBatchingEngine(engine, slots=2, chunk=2)
        futs = [cont.submit(_wav(rng, 0.4)) for _ in range(4)]
        cont.close()
        for f in futs:
            assert isinstance(f.result(timeout=10), str)

    def test_failed_admit_releases_slots(self, parts, rng):
        """A request whose admission raises (here: prompt encoding
        forced to fail) must fail ITS future only — the slots its group
        had claimed return to the free list and later requests still
        decode exactly."""
        engine = _build_engine(parts)
        cont = ContinuousBatchingEngine(engine, slots=2, chunk=2)
        try:
            orig = cont._prompt_ids

            def bad_prompt(src, tgt):
                if src == "boom":
                    raise RuntimeError("boom")
                return orig(src, tgt)

            cont._prompt_ids = bad_prompt
            bad = cont.submit(_wav(rng, 0.3), "translate",
                              source_lang="boom")
            with pytest.raises(RuntimeError, match="boom"):
                bad.result(timeout=300)
            # pool fully recovered: 2 concurrent good requests fit
            wavs = [_wav(rng, 0.3), _wav(rng, 0.35)]
            futs = [cont.submit(w) for w in wavs]
            got = [f.result(timeout=300) for f in futs]
            for g, w in zip(got, wavs):
                want = engine.tokenizer.decode_ids(
                    _oracle_tokens(engine, cont._S_max, w, "es", "en"))
                assert g == want
            assert len(cont._free) == 2
        finally:
            cont.close()

    def test_http_front_end(self, parts, rng):
        """The continuous engine drops into STHttpServer as the front end:
        decodes are exact over the wire, unsupported routes map to 400,
        and /stats reports the loop counters."""
        import base64
        import json
        import urllib.error
        import urllib.request

        from stac_st_tpu.serving_http import STHttpServer

        engine = _build_engine(parts)
        cont = ContinuousBatchingEngine(engine, slots=2, chunk=4)
        try:
            with STHttpServer(cont, port=0) as srv:
                wav = _wav(rng, 0.4)
                body = json.dumps({
                    "audio_b64": base64.b64encode(
                        wav.astype(np.float32).tobytes()).decode(),
                }).encode()
                req = urllib.request.Request(
                    f"http://127.0.0.1:{srv.port}/v1/translate",
                    data=body,
                    headers={"Content-Type": "application/json"},
                    method="POST")
                with urllib.request.urlopen(req, timeout=300) as resp:
                    out = json.loads(resp.read())
                want = engine.tokenizer.decode_ids(
                    _oracle_tokens(engine, cont._S_max, wav, "es", "en"))
                assert out["text"] == want

                req = urllib.request.Request(
                    f"http://127.0.0.1:{srv.port}/v1/speaker_turns",
                    data=body,
                    headers={"Content-Type": "application/json"},
                    method="POST")
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(req, timeout=60)
                assert ei.value.code == 400

                with urllib.request.urlopen(
                        f"http://127.0.0.1:{srv.port}/stats",
                        timeout=60) as resp:
                    stats = json.loads(resp.read())
                assert stats["completed"] >= 1
                assert "utilization" in stats
        finally:
            cont.close()

    def test_warmup_compiles_every_bucket_and_rung(self, parts, rng):
        engine = _build_engine(parts)
        cont = ContinuousBatchingEngine(engine, slots=2, chunk=4)
        try:
            n = cont.warmup()
            # (bucket x rung) admits + the chunk step; slots=2 clamps the
            # default (1, 4, slots) ladder to (1, 2)
            assert cont._admit_rungs == (1, 2)
            assert n == len(engine.buckets) * 2 + 1
            # warmup runs all-invalid groups: no fake traffic in counters
            assert cont.stats()["completed"] == 0
            assert cont.stats()["admits"] == 0
            # live state is untouched: a real decode still works after
            wav = _wav(rng, 0.4)
            got = cont.submit(wav).result(timeout=300)
            want = engine.tokenizer.decode_ids(
                _oracle_tokens(engine, cont._S_max, wav, "es", "en"))
            assert got == want
        finally:
            cont.close()

    def test_burst_admits_in_groups(self, parts, rng):
        """A queued burst admits through the rung ladder (fewer device
        calls than requests) and every output is still oracle-exact."""
        engine = _build_engine(parts)
        cont = ContinuousBatchingEngine(engine, slots=4, chunk=4)
        try:
            cont.warmup()
            wavs = [_wav(rng, 0.3 + 0.05 * i) for i in range(8)]
            futs = [cont.submit(w) for w in wavs]
            got = [f.result(timeout=300) for f in futs]
            for g, w in zip(got, wavs):
                want = engine.tokenizer.decode_ids(
                    _oracle_tokens(engine, cont._S_max, w, "es", "en"))
                assert g == want
            stats = cont.stats()
            assert stats["admits"] == 8
            assert stats["admit_calls"] < 8  # grouping actually happened
        finally:
            cont.close()

    def test_pallas_mode_rejected(self, parts):
        from stac_st_tpu.ops import pallas as pallas_mod

        engine = _build_engine(parts)
        pallas_mod.enable(interpret=True)
        try:
            with pytest.raises(RuntimeError):
                ContinuousBatchingEngine(engine)
        finally:
            pallas_mod.disable()


class TestMeshedContinuous:
    """Continuous batching × data mesh (VERDICT r3 item 3): the slot pool
    shards over the mesh's ``data`` axis, params replicate, and every
    utterance still decodes to EXACTLY the model's greedy tokens."""

    @staticmethod
    def _mesh(n):
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < n:
            pytest.skip(f"need {n} devices, have {len(devs)}")
        return Mesh(np.asarray(devs[:n]), ("data",))

    def test_slots_must_divide_mesh(self, parts):
        mesh = self._mesh(4)
        engine = _build_engine(parts, mesh=mesh)
        with pytest.raises(ValueError, match="multiple of the mesh"):
            ContinuousBatchingEngine(engine, slots=3)

    def test_meshed_mixed_concurrent_matches_oracles(self, parts, rng):
        """8 slots over a 4-device data mesh (2 slots/device), 9 mixed
        requests with slot reuse and ragged depths — token-exact vs the
        sequential (unmeshed) greedy oracle, and the state actually lives
        sharded across the mesh."""
        mesh = self._mesh(4)
        engine = _build_engine(parts, mesh=mesh)
        cont = ContinuousBatchingEngine(engine, slots=8, chunk=3)
        try:
            # the persistent KV cache really is sharded on the slot axis
            k0 = cont._state["layers"][0]["self"]["k"]
            assert len(k0.sharding.device_set) == 4, k0.sharding
            assert not cont._state["pos"].sharding.is_fully_replicated

            specs = [
                (0.2, "translate"), (0.8, "transcribe"), (0.45, "translate"),
                (0.9, "translate"), (0.3, "transcribe"), (0.7, "translate"),
                (0.5, "transcribe"), (0.25, "translate"), (0.85, "translate"),
            ]
            wavs = [_wav(rng, s) for s, _ in specs]
            futs = [cont.submit(w, task) for w, (_, task) in
                    zip(wavs, specs)]
            got = [f.result(timeout=300) for f in futs]
            # oracle on a mesh-free engine: same params, same math
            plain = _build_engine(parts)
            for g, w, (_, task) in zip(got, wavs, specs):
                tgt = "en" if task == "translate" else "es"
                want = plain.tokenizer.decode_ids(
                    _oracle_tokens(plain, cont._S_max, w, "es", tgt))
                assert g == want
            assert cont.stats()["completed"] == len(specs)
        finally:
            cont.close()

    def test_meshed_warmup_and_budget(self, parts, rng):
        mesh = self._mesh(2)
        engine = _build_engine(parts, mesh=mesh)
        cont = ContinuousBatchingEngine(engine, slots=4, chunk=4)
        try:
            assert cont.warmup() > 0
            wav = _wav(rng, 0.4)
            got = cont.submit(wav, "translate").result(timeout=300)
            plain = _build_engine(parts)
            want = plain.tokenizer.decode_ids(
                _oracle_tokens(plain, cont._S_max, wav, "es", "en"))
            assert got == want
        finally:
            cont.close()


class TestProtocolFinalize:
    """Hybrid serving (VERDICT r4 item 3): the slot loop drafts greedily,
    the finalizer re-decodes finished utterances through the batch
    engine's protocol search — futures must resolve with text
    TOKEN-IDENTICAL to STEngine.translate/transcribe, and the draft must
    stream early via on_draft."""

    def test_finals_match_batch_engine_exactly(self, parts, rng):
        engine = _build_engine(parts)
        cont = ContinuousBatchingEngine(
            engine, slots=4, chunk=4, protocol_finalize=True,
            finalize_batch=4)
        specs = [(0.2, "translate"), (0.8, "transcribe"),
                 (0.45, "translate"), (0.9, "translate"),
                 (0.3, "transcribe"), (0.6, "translate")]
        wavs = [_wav(rng, s) for s, _ in specs]
        try:
            futs = [cont.submit(w, task) for w, (_, task) in
                    zip(wavs, specs)]
            got = [f.result(timeout=300) for f in futs]
        finally:
            cont.close()
        # the batch engine on the same wavs IS the spec
        ref = _build_engine(parts)
        for g, w, (_, task) in zip(got, wavs, specs):
            if task == "translate":
                want = ref.translate([w])[0]
            else:
                want = ref.transcribe([w])[0]
            assert g == want, (task, g, want)
        st = cont.stats()
        assert st["finalized"] == len(specs)
        assert 0 <= st["draft_exact"] <= st["finalized"]

    def test_draft_streams_before_final(self, parts, rng):
        engine = _build_engine(parts)
        cont = ContinuousBatchingEngine(
            engine, slots=2, chunk=4, protocol_finalize=True)
        drafts = []
        order = []
        try:
            wav = _wav(rng, 0.5)
            fut = cont.submit(
                wav, "translate",
                on_draft=lambda t: (drafts.append(t),
                                    order.append("draft")))
            final = fut.result(timeout=300)
            order.append("final")
        finally:
            cont.close()
        assert order == ["draft", "final"]
        assert len(drafts) == 1
        # the draft is exactly the greedy engine's output
        plain_cont = ContinuousBatchingEngine(
            _build_engine(parts), slots=2, chunk=4)
        try:
            want_draft = plain_cont.submit(
                wav, "translate").result(timeout=300)
        finally:
            plain_cont.close()
        assert drafts[0] == want_draft
        # and the future carried the protocol decode
        assert final == _build_engine(parts).translate([wav])[0]

    def test_mixed_language_groups(self, parts, rng):
        """Finalizer groups by language pair; mixed pairs in one batch
        window must each get their own prompt's protocol output."""
        engine = _build_engine(parts)
        cont = ContinuousBatchingEngine(
            engine, slots=4, chunk=4, protocol_finalize=True,
            finalize_batch=8, finalize_linger=0.2)
        wavs = [_wav(rng, 0.3), _wav(rng, 0.4), _wav(rng, 0.5)]
        try:
            futs = [
                cont.submit(wavs[0], "translate"),
                cont.submit(wavs[1], "transcribe"),
                cont.submit(wavs[2], "translate"),
            ]
            got = [f.result(timeout=300) for f in futs]
        finally:
            cont.close()
        ref = _build_engine(parts)
        assert got[0] == ref.translate([wavs[0]])[0]
        assert got[1] == ref.transcribe([wavs[1]])[0]
        assert got[2] == ref.translate([wavs[2]])[0]

    def test_close_drains_finalizer(self, parts, rng):
        engine = _build_engine(parts)
        cont = ContinuousBatchingEngine(
            engine, slots=2, chunk=4, protocol_finalize=True)
        futs = [cont.submit(_wav(rng, 0.3 + 0.1 * i), "translate")
                for i in range(4)]
        cont.close()
        for f in futs:
            assert isinstance(f.result(timeout=1), str)
