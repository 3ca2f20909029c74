"""HTTP serving adapter tests: real sockets, JSON API, error paths."""

import base64
import json
import threading
import urllib.error
import urllib.request

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
from stac_st_tpu.serving_http import STHttpServer

VOCAB = 150


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_corpus, train_fixture_tokenizer

    root = str(tmp_path_factory.mktemp("http"))
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
def server(engine):
    with STHttpServer(engine, port=0, max_wait_ms=30) as srv:
        yield srv


def _post(server, path, payload, timeout=180):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


def _get(server, path, timeout=30):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}{path}", timeout=timeout
    ) as resp:
        return resp.status, json.loads(resp.read())


class TestHttpApi:
    def test_healthz_and_stats(self, server):
        assert _get(server, "/healthz") == (200, {"status": "ok"})
        code, stats = _get(server, "/stats")
        assert code == 200 and "requests" in stats

    def test_translate_json_audio(self, server, engine, rng):
        wav = rng.standard_normal(int(0.3 * 16000)).astype(np.float32)
        code, body = _post(server, "/v1/translate", {"audio": wav.tolist()})
        assert code == 200
        assert body["text"] == engine.translate([wav])[0]

    def test_transcribe_b64_audio(self, server, engine, rng):
        wav = rng.standard_normal(int(0.4 * 16000)).astype(np.float32)
        code, body = _post(server, "/v1/transcribe", {
            "audio_b64": base64.b64encode(wav.tobytes()).decode(),
        })
        assert code == 200
        assert body["text"] == engine.transcribe([wav])[0]

    def test_transcribe_translate_route(self, server, engine, rng):
        wav = rng.standard_normal(int(0.3 * 16000)).astype(np.float32)
        code, body = _post(server, "/v1/transcribe_translate", {
            "audio": wav.tolist()})
        assert code == 200
        asr, st = engine.transcribe_and_translate([wav])
        assert body == {"transcription": asr[0], "translation": st[0]}

    def test_speaker_turns(self, server, engine, rng):
        wav = rng.standard_normal(8000).astype(np.float32)
        code, body = _post(server, "/v1/speaker_turns", {
            "audio": wav.tolist()})
        assert code == 200
        assert body["events"] == engine.speaker_turns([wav])[0]

    def test_long_form_route(self, server, engine):
        r = np.random.default_rng(12)
        wav = np.concatenate([
            np.zeros(8000, np.float32),
            (0.5 * r.standard_normal(int(0.6 * 16000))).astype(np.float32),
            np.zeros(8000, np.float32),
        ])
        code, body = _post(server, "/v1/long_form", {
            "audio": wav.tolist()})
        assert code == 200
        ref = engine.long_form(wav)
        assert body["transcription"] == ref["transcription"]
        assert body["translation"] == ref["translation"]
        assert len(body["segments"]) == len(ref["segments"])

    def test_concurrent_clients_coalesce(self, server, engine, rng):
        wavs = [rng.standard_normal(int(0.3 * 16000)).astype(np.float32)
                for _ in range(4)]
        results = [None] * 4

        def one(i):
            _, body = _post(server, "/v1/translate",
                            {"audio": wavs[i].tolist()})
            results[i] = body["text"]

        threads = [threading.Thread(target=one, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == engine.translate(wavs)

    def test_error_paths(self, server):
        # unknown path -> 404
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, "/v1/summarize", {"audio": [0.0]})
        assert e.value.code == 404
        # missing audio -> 400 with explanation
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, "/v1/translate", {})
        assert e.value.code == 400
        assert "audio" in json.loads(e.value.read())["error"]
        # malformed JSON -> 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v1/translate",
            data=b"{not json", method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
        # empty audio -> 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, "/v1/translate", {"audio": []})
        assert e.value.code == 400
