"""gRPC serving adapter over the streaming front end.

The reference has no serving surface (inference is a batch recipe,
``stac-st/inference.py``); this adapter is the production ingress the TPU
rebuild adds — the gRPC sibling of :mod:`stac_st_tpu.serving_http`:

* unary RPCs ``Translate`` / ``Transcribe`` / ``SpeakerTurns`` block on the
  coalescing :class:`~stac_st_tpu.serving_stream.StreamingFrontEnd`, so
  concurrent clients are exactly the traffic it groups into one TPU call;
* ``StreamTurns`` is a bidirectional stream over
  :class:`~stac_st_tpu.serving_stream.TurnStreamer`: long-form audio chunks
  in, absolute-timestamped [turn]/[xt] window events out;
* ``Health`` / ``Stats`` mirror ``/healthz`` and ``/stats``.

No generated service stubs are required: the service is registered with
``grpc.method_handlers_generic_handler`` against the checked-in message
classes (``protos/stac_st_pb2.py``), and :class:`STGrpcClient` builds its
multicallables directly on the channel — only ``protoc --python_out`` (no
grpc plugin) is ever needed to regenerate messages.
"""

from __future__ import annotations

import logging
import threading
from concurrent import futures as _futures
from typing import Iterator, Optional

import numpy as np

try:  # pragma: no cover - exercised via _require_grpc
    import grpc
except ImportError:  # pragma: no cover
    grpc = None  # type: ignore[assignment]

from .protos import stac_st_pb2 as pb
from .serving_stream import StreamingFrontEnd, TurnStreamer

logger = logging.getLogger(__name__)

__all__ = ["STGrpcServer", "STGrpcClient", "SERVICE_NAME"]

SERVICE_NAME = "stac_st.v1.SpeechTranslation"


def _require_grpc():
    if grpc is None:  # pragma: no cover
        raise ImportError(
            "grpcio is not installed; the gRPC adapter needs the `grpc` "
            "package (the HTTP adapter in serving_http.py is stdlib-only)"
        )


def _request_wav(msg) -> np.ndarray:
    """Extract the waveform from a DecodeRequest/AudioChunk."""
    if len(msg.samples):
        wav = np.asarray(msg.samples, np.float32)
    elif msg.audio_f32le:
        wav = np.frombuffer(msg.audio_f32le, np.float32).copy()
    else:
        raise ValueError(
            "request needs 'samples' (repeated float) or 'audio_f32le' "
            "(packed float32 little-endian)"
        )
    if wav.ndim != 1 or wav.size == 0:
        raise ValueError("audio must be a non-empty 1-D waveform")
    return wav


class _Servicer:
    """RPC method implementations bound to a StreamingFrontEnd."""

    def __init__(self, front: StreamingFrontEnd, request_timeout: float,
                 stream_window_seconds: float):
        self.front = front
        self.request_timeout = float(request_timeout)
        self.stream_window_seconds = float(stream_window_seconds)

    # ------------------------------------------------------------- unary
    def _decode(self, task: str, request, context):
        try:
            wav = _request_wav(request)
        except ValueError as exc:
            context.abort(grpc.StatusCode.INVALID_ARGUMENT, str(exc))
        try:
            fut = self.front.submit(
                wav, task=task,
                source_lang=request.source_lang or None,
                target_lang=request.target_lang or None,
            )
        except ValueError as exc:  # task unsupported by this front end
            context.abort(grpc.StatusCode.INVALID_ARGUMENT, str(exc))
        except RuntimeError as exc:  # front end closed
            context.abort(grpc.StatusCode.UNAVAILABLE, str(exc))
        # respect the client's deadline when it is tighter than ours
        remaining = context.time_remaining()
        timeout = (min(self.request_timeout, remaining)
                   if remaining is not None else self.request_timeout)
        try:
            return fut.result(timeout=timeout)
        # concurrent.futures.TimeoutError is only an alias of the builtin
        # from Python 3.11; catch both so 3.10 maps timeouts correctly
        except (TimeoutError, _futures.TimeoutError):
            context.abort(grpc.StatusCode.DEADLINE_EXCEEDED,
                          "decode timed out")

    def Translate(self, request, context):  # noqa: N802 (gRPC API)
        return pb.TextResponse(
            text=self._decode("translate", request, context))

    def Transcribe(self, request, context):  # noqa: N802
        return pb.TextResponse(
            text=self._decode("transcribe", request, context))

    def TranscribeTranslate(self, request, context):  # noqa: N802
        both = self._decode("transcribe_translate", request, context)
        return pb.DualTextResponse(
            transcription=both["transcription"],
            translation=both["translation"],
        )

    def SpeakerTurns(self, request, context):  # noqa: N802
        events = self._decode("speaker_turns", request, context)
        return pb.TurnEvents(turn=events["turn"], xt=events["xt"])

    def LongForm(self, request, context):  # noqa: N802
        out = self._decode("long_form", request, context)
        return pb.LongFormResponse(
            segments=[
                pb.LongFormSegment(
                    start_s=s["start"], end_s=s["end"],
                    transcription=s["transcription"],
                    translation=s["translation"])
                for s in out["segments"]
            ],
            transcription=out["transcription"],
            translation=out["translation"],
            rttm_turn=out["rttm"]["turn"],
            rttm_xt=out["rttm"]["xt"],
        )

    # ----------------------------------------------------------- streaming
    def StreamTurns(self, request_iterator, context):  # noqa: N802
        streamer = TurnStreamer(
            self.front.engine, window_seconds=self.stream_window_seconds
        )
        sr = self.front.engine.sample_rate

        def window_msg(events):
            return pb.TurnWindow(
                events=pb.TurnEvents(turn=events["turn"], xt=events["xt"]),
                window_end_s=streamer._offset_samples / sr,
            )

        for chunk in request_iterator:
            try:
                wav = _request_wav(chunk)
            except ValueError as exc:
                context.abort(grpc.StatusCode.INVALID_ARGUMENT, str(exc))
            for events in streamer.feed(wav):
                yield window_msg(events)
        for events in streamer.finish():
            yield window_msg(events)

    # ------------------------------------------------------------- meta
    def Health(self, request, context):  # noqa: N802
        return pb.HealthResponse(status="ok")

    def Stats(self, request, context):  # noqa: N802
        return pb.StatsResponse(counters=self.front.stats())


def _handlers(servicer: _Servicer):
    u = grpc.unary_unary_rpc_method_handler
    return grpc.method_handlers_generic_handler(SERVICE_NAME, {
        "Translate": u(
            servicer.Translate,
            request_deserializer=pb.DecodeRequest.FromString,
            response_serializer=pb.TextResponse.SerializeToString),
        "Transcribe": u(
            servicer.Transcribe,
            request_deserializer=pb.DecodeRequest.FromString,
            response_serializer=pb.TextResponse.SerializeToString),
        "TranscribeTranslate": u(
            servicer.TranscribeTranslate,
            request_deserializer=pb.DecodeRequest.FromString,
            response_serializer=pb.DualTextResponse.SerializeToString),
        "SpeakerTurns": u(
            servicer.SpeakerTurns,
            request_deserializer=pb.DecodeRequest.FromString,
            response_serializer=pb.TurnEvents.SerializeToString),
        "LongForm": u(
            servicer.LongForm,
            request_deserializer=pb.DecodeRequest.FromString,
            response_serializer=pb.LongFormResponse.SerializeToString),
        "StreamTurns": grpc.stream_stream_rpc_method_handler(
            servicer.StreamTurns,
            request_deserializer=pb.AudioChunk.FromString,
            response_serializer=pb.TurnWindow.SerializeToString),
        "Health": u(
            servicer.Health,
            request_deserializer=pb.Empty.FromString,
            response_serializer=pb.HealthResponse.SerializeToString),
        "Stats": u(
            servicer.Stats,
            request_deserializer=pb.Empty.FromString,
            response_serializer=pb.StatsResponse.SerializeToString),
    })


class STGrpcServer:
    """Serve an STEngine (or an existing StreamingFrontEnd) over gRPC.

    ::

        server = STGrpcServer(engine, port=50051)
        server.start()          # background grpc server; server.port bound
        ...
        server.close()

    ``port=0`` binds an ephemeral port (read it back from ``.port``).
    ``max_workers`` bounds concurrent in-flight RPCs; each unary RPC parks
    on its Future while the front end's single worker batches the group —
    size it to the concurrency you want coalesced, not to CPU count.
    """

    def __init__(self, engine_or_front, host: str = "127.0.0.1",
                 port: int = 50051, request_timeout: float = 300.0,
                 max_workers: int = 32,
                 stream_window_seconds: float = 16.0,
                 **front_kwargs):
        _require_grpc()
        # anything exposing submit() is already a front end (the batch
        # StreamingFrontEnd or the ContinuousBatchingEngine); a bare
        # STEngine gets wrapped in the batch front end
        if hasattr(engine_or_front, "submit"):
            self.front = engine_or_front
            self._owns_front = False
        else:
            self.front = StreamingFrontEnd(engine_or_front, **front_kwargs)
            self._owns_front = True
        self._servicer = _Servicer(
            self.front, request_timeout, stream_window_seconds
        )
        self._server = grpc.server(
            _futures.ThreadPoolExecutor(
                max_workers=max_workers, thread_name_prefix="st-grpc"),
        )
        self._server.add_generic_rpc_handlers((_handlers(self._servicer),))
        self.port = self._server.add_insecure_port(f"{host}:{port}")
        if self.port == 0:
            raise RuntimeError(f"could not bind gRPC port on {host}:{port}")

    def start(self) -> "STGrpcServer":
        self.front.start()
        self._server.start()
        logger.info("gRPC serving on port %d", self.port)
        return self

    def close(self, grace: float = 5.0) -> None:
        self._server.stop(grace).wait()
        if self._owns_front:
            self.front.close()

    def wait_for_termination(self, timeout: Optional[float] = None) -> bool:
        return self._server.wait_for_termination(timeout)

    def __enter__(self) -> "STGrpcServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.close()


class STGrpcClient:
    """Minimal client for :class:`STGrpcServer` (no generated stubs).

    ::

        with STGrpcClient("localhost:50051") as client:
            text = client.translate(wav, source_lang="es", target_lang="en")
    """

    def __init__(self, target: str, *, pack_audio: bool = True,
                 channel: Optional["grpc.Channel"] = None):
        _require_grpc()
        self.pack_audio = pack_audio  # send packed f32le (half the bytes)
        self._channel = channel or grpc.insecure_channel(target)
        pfx = f"/{SERVICE_NAME}/"
        uu = self._channel.unary_unary
        self._translate = uu(
            pfx + "Translate",
            request_serializer=pb.DecodeRequest.SerializeToString,
            response_deserializer=pb.TextResponse.FromString)
        self._transcribe = uu(
            pfx + "Transcribe",
            request_serializer=pb.DecodeRequest.SerializeToString,
            response_deserializer=pb.TextResponse.FromString)
        self._transcribe_translate = uu(
            pfx + "TranscribeTranslate",
            request_serializer=pb.DecodeRequest.SerializeToString,
            response_deserializer=pb.DualTextResponse.FromString)
        self._speaker_turns = uu(
            pfx + "SpeakerTurns",
            request_serializer=pb.DecodeRequest.SerializeToString,
            response_deserializer=pb.TurnEvents.FromString)
        self._long_form = uu(
            pfx + "LongForm",
            request_serializer=pb.DecodeRequest.SerializeToString,
            response_deserializer=pb.LongFormResponse.FromString)
        self._stream_turns = self._channel.stream_stream(
            pfx + "StreamTurns",
            request_serializer=pb.AudioChunk.SerializeToString,
            response_deserializer=pb.TurnWindow.FromString)
        self._health = uu(
            pfx + "Health",
            request_serializer=pb.Empty.SerializeToString,
            response_deserializer=pb.HealthResponse.FromString)
        self._stats = uu(
            pfx + "Stats",
            request_serializer=pb.Empty.SerializeToString,
            response_deserializer=pb.StatsResponse.FromString)

    def _request(self, wav, source_lang=None, target_lang=None):
        wav = np.ascontiguousarray(wav, np.float32)
        req = pb.DecodeRequest(
            source_lang=source_lang or "", target_lang=target_lang or "")
        if self.pack_audio:
            req.audio_f32le = wav.tobytes()
        else:
            req.samples.extend(wav.tolist())
        return req

    def translate(self, wav, source_lang=None, target_lang=None,
                  timeout=None) -> str:
        return self._translate(
            self._request(wav, source_lang, target_lang), timeout=timeout
        ).text

    def transcribe(self, wav, source_lang=None, timeout=None) -> str:
        return self._transcribe(
            self._request(wav, source_lang), timeout=timeout).text

    def transcribe_translate(self, wav, source_lang=None, target_lang=None,
                             timeout=None) -> dict:
        """Both task outputs from one fused dual-prompt decode."""
        r = self._transcribe_translate(
            self._request(wav, source_lang, target_lang), timeout=timeout
        )
        return {"transcription": r.transcription, "translation": r.translation}

    def speaker_turns(self, wav, timeout=None) -> dict:
        ev = self._speaker_turns(self._request(wav), timeout=timeout)
        return {"turn": list(ev.turn), "xt": list(ev.xt)}

    def long_form(self, wav, source_lang=None, target_lang=None,
                  timeout=None) -> dict:
        """Whole-conversation decode (engine.long_form) over the wire."""
        r = self._long_form(
            self._request(wav, source_lang, target_lang), timeout=timeout)
        return {
            "segments": [
                {"start": s.start_s, "end": s.end_s,
                 "transcription": s.transcription,
                 "translation": s.translation}
                for s in r.segments
            ],
            "transcription": r.transcription,
            "translation": r.translation,
            "rttm": {"turn": list(r.rttm_turn), "xt": list(r.rttm_xt)},
        }

    def stream_turns(self, chunks, timeout=None) -> Iterator[dict]:
        """Stream long-form audio chunks; yields per-window event dicts."""

        def gen():
            for c in chunks:
                wav = np.ascontiguousarray(c, np.float32)
                if self.pack_audio:
                    yield pb.AudioChunk(audio_f32le=wav.tobytes())
                else:
                    yield pb.AudioChunk(samples=wav.tolist())

        for win in self._stream_turns(gen(), timeout=timeout):
            yield {
                "turn": list(win.events.turn),
                "xt": list(win.events.xt),
                "window_end_s": win.window_end_s,
            }

    def health(self, timeout=None) -> str:
        return self._health(pb.Empty(), timeout=timeout).status

    def stats(self, timeout=None) -> dict:
        return dict(self._stats(pb.Empty(), timeout=timeout).counters)

    def close(self) -> None:
        self._channel.close()

    def __enter__(self) -> "STGrpcClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def serve_forever(engine, host: str = "127.0.0.1", port: int = 50051,
                  **kwargs) -> None:
    """Blocking entry point with graceful SIGTERM/SIGINT shutdown."""
    import signal

    server = STGrpcServer(engine, host=host, port=port, **kwargs).start()
    done = threading.Event()

    def _stop(signum, frame):
        logger.info("signal %d: shutting down", signum)
        done.set()

    signal.signal(signal.SIGTERM, _stop)
    signal.signal(signal.SIGINT, _stop)
    try:
        done.wait()
    finally:
        server.close()
