"""Streaming front-end tests: coalescing, correctness vs direct batch calls,
incremental turn streaming."""

import threading

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stac_st_tpu.models import (
    ConvolutionFrontEnd,
    LinearHead,
    TransformerMultiTask,
)
from stac_st_tpu.ops.cmvn import cmvn_init
from stac_st_tpu.serving import STEngine
from stac_st_tpu.serving_stream import StreamingFrontEnd, TurnStreamer

VOCAB = 150


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_corpus, train_fixture_tokenizer

    root = str(tmp_path_factory.mktemp("stream"))
    _, _, joint = make_corpus(root, n_utts=4, seconds=0.4)
    sp, _ = train_fixture_tokenizer(root, joint, vocab=VOCAB)

    cnn = ConvolutionFrontEnd(out_channels=(16, 16))
    transformer = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=20 * 16, d_model=32, nhead=4,
        num_encoder_layers=2, num_decoder_layers=2, d_ffn=64,
        dropout=0.0, normalize_before=True,
    )
    seq_lin = LinearHead(input_size=32, n_neurons=VOCAB)
    ctc_lin = LinearHead(input_size=32, n_neurons=VOCAB)
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
        "ctc_lin": ctc_lin.init(rng, enc),
    }
    return STEngine(
        transformer, cnn, seq_lin, ctc_lin, params, cmvn_init(80), sp,
        beam_size=2, bucket_seconds=(0.5, 1.0), bf16=False,
        turn_id=sp.piece_to_id("[turn]"), xt_id=sp.piece_to_id("[xt]"),
    )


@pytest.fixture(scope="module")
def wavs():
    r = np.random.default_rng(11)
    return [
        r.standard_normal(int(s * 16000)).astype(np.float32)
        for s in (0.3, 0.8, 0.45, 0.7)
    ]


class TestStreamingFrontEnd:
    def test_results_match_direct_batch_calls(self, engine, wavs):
        direct = engine.translate(wavs)
        with StreamingFrontEnd(engine, max_batch=8, max_wait_ms=50) as front:
            futures = [front.submit(w, task="translate") for w in wavs]
            got = [f.result(timeout=120) for f in futures]
        assert got == direct

    def test_coalesces_queued_requests(self, engine, wavs):
        """Requests queued before the worker starts land in ONE batch and
        per-language-pair engine call groups."""
        front = StreamingFrontEnd(engine, max_batch=16, max_wait_ms=50,
                                  autostart=False)
        futures = [front.submit(w, task="transcribe") for w in wavs]
        front.start()
        results = [f.result(timeout=120) for f in futures]
        front.close()
        s = front.stats()
        assert s["requests"] == len(wavs)
        assert s["batches"] == 1
        assert s["engine_calls"] == 1  # same task + lang pair -> one call
        assert s["max_batch_seen"] == len(wavs)
        assert results == engine.transcribe(wavs)

    def test_mixed_tasks_grouped_correctly(self, engine, wavs):
        front = StreamingFrontEnd(engine, max_batch=16, max_wait_ms=50,
                                  autostart=False)
        f_st = front.submit(wavs[0], task="translate")
        f_asr = front.submit(wavs[1], task="transcribe")
        f_turn = front.submit(wavs[2], task="speaker_turns")
        front.start()
        st, asr, turns = (f_st.result(120), f_asr.result(120),
                          f_turn.result(120))
        front.close()
        assert st == engine.translate([wavs[0]])[0]
        assert asr == engine.transcribe([wavs[1]])[0]
        assert turns == engine.speaker_turns([wavs[2]])[0]
        assert front.stats()["engine_calls"] == 3

    def test_transcribe_translate_task(self, engine, wavs):
        with StreamingFrontEnd(engine, max_batch=8, max_wait_ms=50) as front:
            futs = [front.submit(w, task="transcribe_translate")
                    for w in wavs[:2]]
            got = [f.result(timeout=120) for f in futs]
        asr, st = engine.transcribe_and_translate(wavs[:2])
        assert got == [
            {"transcription": a, "translation": s} for a, s in zip(asr, st)
        ]

    def test_submissions_from_many_threads(self, engine, wavs):
        with StreamingFrontEnd(engine, max_batch=4, max_wait_ms=20) as front:
            results = [None] * len(wavs)

            def one(i):
                results[i] = front.submit(
                    wavs[i], task="translate").result(timeout=120)

            threads = [threading.Thread(target=one, args=(i,))
                       for i in range(len(wavs))]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        assert results == engine.translate(wavs)

    def test_bad_task_rejected(self, engine):
        front = StreamingFrontEnd(engine, autostart=False)
        with pytest.raises(ValueError):
            front.submit(np.zeros(100, np.float32), task="summarize")

    def test_submit_after_close_raises(self, engine):
        """A closed front end must fail fast, not queue into the void."""
        front = StreamingFrontEnd(engine, autostart=False)
        front.start()
        front.close()
        with pytest.raises(RuntimeError, match="closed"):
            front.submit(np.zeros(100, np.float32), task="translate")
        # restartable
        front.start()
        fut = front.submit(
            np.zeros(int(0.2 * 16000), np.float32), task="transcribe")
        assert isinstance(fut.result(timeout=120), str)
        front.close()


class TestTurnStreamer:
    def test_windows_and_absolute_offsets(self, engine):
        r = np.random.default_rng(3)
        sr = engine.sample_rate
        wav = r.standard_normal(int(1.1 * sr)).astype(np.float32)
        streamer = TurnStreamer(engine, window_seconds=0.5)
        emitted = []
        # feed in uneven chunks; two full 0.5 s windows + 0.1 s tail
        for chunk in np.array_split(wav, 7):
            emitted.extend(streamer.feed(chunk))
        emitted.extend(streamer.finish())
        assert len(emitted) == 3
        for i, ev in enumerate(emitted):
            assert set(ev) == {"turn", "xt"}
            for ts in ev.values():
                for t in ts:  # absolute timestamps fall inside window i
                    assert 0.5 * i <= t <= 0.5 * (i + 1) + 1e-6

        # window contents decode identically to direct per-window calls
        direct = engine.speaker_turns(
            [wav[: int(0.5 * sr)], wav[int(0.5 * sr): sr], wav[sr:]]
        )
        for i, (ev, ref) in enumerate(zip(emitted, direct)):
            for name in ("turn", "xt"):
                np.testing.assert_allclose(
                    np.asarray(ev[name]) - 0.5 * i, np.asarray(ref[name]),
                    atol=1e-6,
                )

    def test_finish_empty_is_noop(self, engine):
        streamer = TurnStreamer(engine, window_seconds=0.5)
        assert streamer.finish() == []
