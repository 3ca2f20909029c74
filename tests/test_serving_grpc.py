"""gRPC serving adapter tests: real server/channel, unary + streaming RPCs.

Engine fixture mirrors test_serving_http.py; the adapter under test is
stac_st_tpu/serving_grpc.py (generic handlers over the checked-in protos).
"""

import threading

import numpy as np
import pytest
import jax
import jax.numpy as jnp

grpc = pytest.importorskip("grpc")

from stac_st_tpu.models import (
    ConvolutionFrontEnd,
    LinearHead,
    TransformerMultiTask,
)
from stac_st_tpu.ops.cmvn import cmvn_init
from stac_st_tpu.serving import STEngine
from stac_st_tpu.serving_grpc import STGrpcClient, STGrpcServer
from stac_st_tpu.serving_stream import TurnStreamer

VOCAB = 150


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_corpus, train_fixture_tokenizer

    root = str(tmp_path_factory.mktemp("grpc"))
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
    with STGrpcServer(engine, port=0, max_wait_ms=30,
                      stream_window_seconds=0.5) as srv:
        yield srv


@pytest.fixture(scope="module")
def client(server):
    with STGrpcClient(f"127.0.0.1:{server.port}") as c:
        yield c


class TestGrpcApi:
    def test_health_and_stats(self, client):
        assert client.health(timeout=30) == "ok"
        stats = client.stats(timeout=30)
        assert "requests" in stats

    def test_translate_packed_audio(self, client, engine, rng):
        wav = rng.standard_normal(int(0.3 * 16000)).astype(np.float32)
        text = client.translate(wav, timeout=180)
        assert text == engine.translate([wav])[0]

    def test_transcribe_repeated_float(self, server, engine, rng):
        wav = rng.standard_normal(int(0.4 * 16000)).astype(np.float32)
        with STGrpcClient(f"127.0.0.1:{server.port}",
                          pack_audio=False) as c:
            assert c.transcribe(wav, timeout=180) == (
                engine.transcribe([wav])[0])

    def test_transcribe_translate(self, client, engine, rng):
        wav = rng.standard_normal(int(0.3 * 16000)).astype(np.float32)
        got = client.transcribe_translate(wav, timeout=180)
        asr, st = engine.transcribe_and_translate([wav])
        assert got == {"transcription": asr[0], "translation": st[0]}

    def test_speaker_turns(self, client, engine, rng):
        wav = rng.standard_normal(8000).astype(np.float32)
        assert client.speaker_turns(wav, timeout=180) == (
            engine.speaker_turns([wav])[0])

    def test_long_form(self, client, engine):
        r = np.random.default_rng(13)
        wav = np.concatenate([
            np.zeros(8000, np.float32),
            (0.5 * r.standard_normal(int(0.6 * 16000))).astype(np.float32),
            np.zeros(8000, np.float32),
        ])
        got = client.long_form(wav, timeout=300)
        ref = engine.long_form(wav)
        assert got["transcription"] == ref["transcription"]
        assert got["translation"] == ref["translation"]
        assert got["rttm"] == ref["rttm"]
        assert [(s["start"], s["end"]) for s in got["segments"]] == [
            (s["start"], s["end"]) for s in ref["segments"]]

    def test_concurrent_clients_coalesce(self, client, engine, rng):
        wavs = [rng.standard_normal(int(0.3 * 16000)).astype(np.float32)
                for _ in range(4)]
        results = [None] * 4

        def one(i):
            results[i] = client.translate(wavs[i], timeout=180)

        threads = [threading.Thread(target=one, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == engine.translate(wavs)

    def test_stream_turns_matches_turn_streamer(self, client, engine, rng):
        # 1.3 s of audio in 0.2 s chunks over a 0.5 s window -> 2 full
        # windows + a flushed tail; events must equal a local TurnStreamer.
        chunks = [rng.standard_normal(3200).astype(np.float32)
                  for _ in range(7)]  # 1.4 s total
        got = list(client.stream_turns(chunks, timeout=300))

        oracle = TurnStreamer(engine, window_seconds=0.5)
        want = []
        for c in chunks:
            want.extend(oracle.feed(c))
        want.extend(oracle.finish())

        assert len(got) == len(want) == 3
        for g, w in zip(got, want):
            assert g["turn"] == pytest.approx(w["turn"])
            assert g["xt"] == pytest.approx(w["xt"])
        assert got[-1]["window_end_s"] == pytest.approx(1.4)

    def test_error_paths(self, client, server):
        # empty audio -> INVALID_ARGUMENT with explanation
        with pytest.raises(grpc.RpcError) as e:
            client.translate(np.zeros((0,), np.float32), timeout=30)
        assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
        assert "audio" in e.value.details()
        # neither samples nor bytes -> INVALID_ARGUMENT
        from stac_st_tpu.protos import stac_st_pb2 as pb
        raw = grpc.insecure_channel(f"127.0.0.1:{server.port}").unary_unary(
            "/stac_st.v1.SpeechTranslation/Translate",
            request_serializer=pb.DecodeRequest.SerializeToString,
            response_deserializer=pb.TextResponse.FromString)
        with pytest.raises(grpc.RpcError) as e:
            raw(pb.DecodeRequest(), timeout=30)
        assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
        # unknown method -> UNIMPLEMENTED
        bad = grpc.insecure_channel(f"127.0.0.1:{server.port}").unary_unary(
            "/stac_st.v1.SpeechTranslation/Summarize",
            request_serializer=pb.DecodeRequest.SerializeToString,
            response_deserializer=pb.TextResponse.FromString)
        with pytest.raises(grpc.RpcError) as e:
            bad(pb.DecodeRequest(samples=[0.0]), timeout=30)
        assert e.value.code() == grpc.StatusCode.UNIMPLEMENTED

    def test_closed_server_unavailable(self, engine):
        srv = STGrpcServer(engine, port=0).start()
        port = srv.port
        srv.close()
        c = grpc.insecure_channel(f"127.0.0.1:{port}")
        from stac_st_tpu.protos import stac_st_pb2 as pb
        call = c.unary_unary(
            "/stac_st.v1.SpeechTranslation/Health",
            request_serializer=pb.Empty.SerializeToString,
            response_deserializer=pb.HealthResponse.FromString)
        with pytest.raises(grpc.RpcError):
            call(pb.Empty(), timeout=5)
