"""STEngine: production batched inference API (load once, decode many).

The reference has no serving story — inference is a batch recipe
(``stac-st/inference.py``). For deployment this engine wraps the whole stack
behind two calls::

    engine = STEngine.from_experiment("exp/stac-st/3333", "tok/5000_bpe.model")
    texts = engine.translate(wavs)        # es -> en ST
    texts = engine.transcribe(wavs)       # es ASR
    events = engine.speaker_turns(wavs)   # CTC-spike [turn]/[xt] events
    result = engine.long_form(long_wav)   # VAD -> dual decode -> RTTM

TPU-native serving design:
* inputs are bucketed to a fixed grid of audio lengths (default powers-of-2
  seconds) so the engine compiles a handful of kernels once and reuses them
  for any traffic mix;
* ASR and ST share one encoder pass per batch (the reference's
  encoder-once/decode-twice flow) and the language prompt is runtime data —
  switching tasks or language pairs never recompiles;
* parameters are held in bf16 for MXU-rate matmuls; features and beam
  scoring stay fp32.
"""

from __future__ import annotations

import logging
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data.audio import read_audio
from .decoding.beam_search import MultiTaskBeamSearch
from .models import ConvolutionFrontEnd, LinearHead, TransformerMultiTask
from .ops import Fbank
from .ops.cmvn import CmvnState, cmvn_apply, cmvn_init
from .tokenizer import SentencePieceProcessor
from .utils.rttm import extract_turn_events

logger = logging.getLogger(__name__)

__all__ = ["STEngine", "SpeculativeSTEngine"]

_BUCKET_SECONDS = (2.0, 4.0, 8.0, 16.0, 32.0)


class STEngine:
    def __init__(
        self,
        transformer: TransformerMultiTask,
        cnn: ConvolutionFrontEnd,
        seq_lin: LinearHead,
        ctc_lin: Optional[LinearHead],
        params: Dict,
        cmvn: CmvnState,
        tokenizer,
        source_lang: str = "es",
        target_lang: str = "en",
        beam_size: int = 10,
        max_decode_tokens: int = 192,
        sample_rate: int = 16000,
        bucket_seconds: Sequence[float] = _BUCKET_SECONDS,
        bf16: bool = True,
        pad_batch_rows: Optional[int] = None,
        transfer_dtype: str = "float32",
        turn_id: int = 7,
        xt_id: int = 8,
        mesh=None,
        kv_cache_dtype: Optional[str] = None,
        weights_int8: bool = False,
    ):
        """mesh: optional ``jax.sharding.Mesh`` with a ``data`` axis —
        fleet serving: parameters/CMVN are replicated across the mesh and
        every request batch is sharded on its rows, so encode + beam
        search run data-parallel over all chips (the search is
        embarrassingly parallel per utterance; per-chip RTFx is constant
        and fleet throughput scales linearly — docs/PERF.md). Rows are
        padded to a multiple of the data-axis size and the pads dropped on
        output."""
        self.tokenizer = tokenizer
        self.sample_rate = int(sample_rate)
        self.buckets = tuple(sorted(bucket_seconds))
        # static row-batching: pad every engine call's row count so
        # coalesced batches of ANY size hit a pre-compiled (width, rows)
        # shape instead of compiling per formed batch size — a serving
        # front end forms 1..max_batch-row batches, and each distinct row
        # count would otherwise be a fresh XLA compile at request time
        # (docs/PERF.md round 3). Padded rows are full-length silence and
        # are dropped on output.
        #   int:      round UP to a multiple (one compiled row shape);
        #   sequence: a LADDER, e.g. (4, 16) — pad to the smallest rung
        #             >= the formed batch, so light-load batches stop
        #             paying the full max-batch compute (tail-latency
        #             lever; rows beyond the top rung round up to a
        #             multiple of it). One compile per rung.
        if pad_batch_rows and not isinstance(pad_batch_rows, int):
            self.pad_batch_rows = tuple(
                sorted(int(r) for r in pad_batch_rows)
            )
            if not self.pad_batch_rows or min(self.pad_batch_rows) < 1:
                raise ValueError("pad_batch_rows ladder must be >= 1")
        else:
            self.pad_batch_rows = (
                int(pad_batch_rows) if pad_batch_rows else None
            )
        # host->device audio transfer dtype. "int16": requests are packed
        # as PCM16 (audio is 16-bit at origin anyway) and converted to
        # float on device — halves per-request H2D bytes, the dominant
        # per-call cost once encode+search are fused (docs/PERF.md r3).
        if transfer_dtype not in ("float32", "int16"):
            raise ValueError(
                f"transfer_dtype must be float32|int16, got {transfer_dtype}"
            )
        self.transfer_dtype = transfer_dtype
        self.source_lang = source_lang
        self.target_lang = target_lang
        self.turn_id, self.xt_id = turn_id, xt_id
        self._fbank = Fbank(sample_rate=sample_rate)
        self._cnn = cnn
        self._transformer = transformer
        self._ctc_lin = ctc_lin
        self.cmvn = cmvn

        if bf16:
            cast = lambda t: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t
            )
            params = {
                k: (cast(v) if k != "normalize" else v)
                for k, v in params.items()
            }
        if weights_int8:
            # weight-only int8 on the decode hot path: decoder + seq_lin
            # kernels stream half the HBM bytes per decode step (4× at
            # single-stream row counts — docs/PERF.md round 3,
            # tools/exp_weight_int8.py). Opt-in: quantization noise can
            # reorder near-tied beams. Scales stay fp32 (created after
            # the bf16 cast above, so the cast never touches them).
            from .utils.quantize import quantize_decode_weights

            t_q, s_q = quantize_decode_weights(
                params["Transformer"], params["seq_lin"])
            params = {**params, "Transformer": t_q, "seq_lin": s_q}
        self.weights_int8 = bool(weights_int8)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            replicated = NamedSharding(mesh, PartitionSpec())
            params = jax.device_put(params, replicated)
            cmvn = jax.device_put(cmvn, replicated)
            self.cmvn = cmvn
        self.params = params
        self._bf16 = bf16

        self.searcher = MultiTaskBeamSearch(
            [transformer, seq_lin, ctc_lin],
            bos_index=1, eos_index=2, blank_index=0,
            min_decode_ratio=0.0, max_decode_ratio=1.0,
            beam_size=int(beam_size), using_eos_threshold=True,
            length_normalization=True, temperature=1.15,
            max_decode_tokens=max_decode_tokens,
            # 'int8' halves per-step decode cache HBM reads (opt-in;
            # docs/PERF.md round 3, tools/exp_int8_cache.py)
            kv_cache_dtype=kv_cache_dtype,
        )
        self.searcher.bind(params["Transformer"], params["seq_lin"])

        cnn_def, tr_def, fbank = self._cnn, self._transformer, self._fbank
        use_bf16 = bf16

        @jax.jit
        def _encode(params, cmvn, wavs, wav_lens):
            if wavs.dtype == jnp.int16:  # PCM16 transfer: unpack on device
                wavs = wavs.astype(jnp.float32) / 32768.0
            feats = fbank(wavs)
            feats = cmvn_apply(cmvn, feats)
            if use_bf16:
                feats = feats.astype(jnp.bfloat16)
            src = cnn_def.apply(params["CNN"], feats)
            enc = tr_def.apply(
                params["Transformer"], src, wav_lens, method=tr_def.encode
            )
            return enc

        self._encode = _encode

        # fused serving path: fbank -> CMVN -> CNN -> encode -> beam search
        # as ONE compiled program per bucket — halves per-bucket dispatches
        # and keeps enc_out on device (docs/PERF.md round 3). The searcher
        # inlines via search_arrays; prompt stays a runtime argument so
        # ASR<->ST switching reuses the compiled kernel.
        searcher = self.searcher

        @jax.jit
        def _decode_fused(params, cmvn, wavs, wav_lens, prompt):
            enc = _encode(params, cmvn, wavs, wav_lens)
            sp = {"t": params["Transformer"], "s": params["seq_lin"],
                  "lm": None}
            tokens, lengths, scores, _ = searcher.search_arrays(
                enc, wav_lens, prompt=prompt, params=sp
            )
            return tokens, lengths, scores

        self._decode_fused = _decode_fused

        @jax.jit
        def _decode_dual_fused(params, cmvn, wavs, wav_lens, prompts):
            """Encode ONCE, decode under BOTH prompts in one fused beam
            search (2 rows per utterance via call_multi semantics): the
            transcribe+translate request shape pays one program dispatch
            and one encoder pass for two output streams."""
            enc = _encode(params, cmvn, wavs, wav_lens)
            rows = enc.shape[0]
            enc2 = jnp.concatenate([enc, enc], axis=0)
            wl2 = jnp.concatenate([wav_lens, wav_lens], axis=0)
            prompt_rows = jnp.repeat(prompts, rows, axis=0)
            sp = {"t": params["Transformer"], "s": params["seq_lin"],
                  "lm": None}
            tokens, lengths, scores, _ = searcher.search_arrays(
                enc2, wl2, prompt=prompt_rows, params=sp
            )
            return tokens, lengths, scores

        self._decode_dual_fused = _decode_dual_fused

        if ctc_lin is not None:
            @jax.jit
            def _ctc_argmax(params, enc):
                logits = ctc_lin.apply(params["ctc_lin"], enc)
                return jnp.argmax(logits, axis=-1)

            self._ctc_argmax = _ctc_argmax

            @jax.jit
            def _decode_dual_fused_ctc(params, cmvn, wavs, wav_lens,
                                       prompts):
                """The long-form program: one encoder pass feeding BOTH
                the fused dual-prompt search and the CTC turn/xt frame
                argmax — everything a conversation segment needs from one
                dispatch. Padded frames are forced to blank so bucket
                padding cannot fake speaker-change spikes."""
                enc = _encode(params, cmvn, wavs, wav_lens)
                am = jnp.argmax(
                    ctc_lin.apply(params["ctc_lin"], enc), axis=-1)
                n_frames = enc.shape[1]
                valid = jnp.ceil(wav_lens * n_frames).astype(jnp.int32)
                am = jnp.where(
                    jnp.arange(n_frames)[None, :] < valid[:, None], am, 0)
                rows = enc.shape[0]
                enc2 = jnp.concatenate([enc, enc], axis=0)
                wl2 = jnp.concatenate([wav_lens, wav_lens], axis=0)
                prompt_rows = jnp.repeat(prompts, rows, axis=0)
                sp = {"t": params["Transformer"], "s": params["seq_lin"],
                      "lm": None}
                tokens, lengths, scores, _ = searcher.search_arrays(
                    enc2, wl2, prompt=prompt_rows, params=sp
                )
                return tokens, lengths, scores, am

            self._decode_dual_fused_ctc = _decode_dual_fused_ctc
        else:
            self._ctc_argmax = None
            self._decode_dual_fused_ctc = None

    # ------------------------------------------------------------ factories
    @classmethod
    def from_experiment(
        cls, pretrained_path: str, tokenizer_file: str,
        d_model: int = 256, nhead: int = 4, num_encoder_layers: int = 12,
        num_decoder_layers: int = 6, d_ffn: int = 1024, vocab: int = 5000,
        **kw,
    ) -> "STEngine":
        """Load averaged weights from a training experiment's save dir,
        with explicitly-specified model dims (see ``from_saved_experiment``
        for the config-free variant)."""
        import os

        tokenizer = SentencePieceProcessor(tokenizer_file)
        cnn = ConvolutionFrontEnd()
        transformer = TransformerMultiTask(
            tgt_vocab=vocab, input_size=5120, d_model=d_model, nhead=nhead,
            num_encoder_layers=num_encoder_layers,
            num_decoder_layers=num_decoder_layers, d_ffn=d_ffn,
            dropout=0.1, normalize_before=True,
        )
        seq_lin = LinearHead(input_size=d_model, n_neurons=vocab)
        ctc_lin = LinearHead(input_size=d_model, n_neurons=vocab)

        return cls._load_from_save(
            cnn, transformer, seq_lin, ctc_lin,
            os.path.join(pretrained_path, "save"), tokenizer, 80, **kw
        )

    @classmethod
    def from_saved_experiment(
        cls, experiment_directory: str,
        tokenizer_file: Optional[str] = None, **kw,
    ) -> "STEngine":
        """First-class reload of a training experiment from its OWN saved
        config: modules are rebuilt from ``hyperparams.yaml`` +
        ``overrides.yaml`` exactly as training built them, so the caller
        never re-specifies model dims. (The reference instead greps values
        back out of the saved yaml in shell —
        ``evaluations/vad_shas/run_inference.sh:27-37``; SURVEY §5.6 flags
        this as the thing to fix first-class.)
        """
        import os

        import yaml as _yaml

        from .config.hyperyaml import load_hyperpyyaml

        ov_path = os.path.join(experiment_directory, "overrides.yaml")
        overrides = {}
        if os.path.isfile(ov_path):
            with open(ov_path) as f:
                overrides = _yaml.safe_load(f) or {}
        with open(os.path.join(experiment_directory, "hyperparams.yaml")) as f:
            hp = load_hyperpyyaml(f, overrides)

        tokenizer_file = tokenizer_file or hp.get("tokenizer_file")
        if not tokenizer_file or not os.path.isfile(str(tokenizer_file)):
            raise FileNotFoundError(
                "tokenizer model not found; pass tokenizer_file= (saved "
                f"config points at {tokenizer_file!r})"
            )
        tokenizer = SentencePieceProcessor(str(tokenizer_file))
        return cls._load_from_save(
            hp["CNN"], hp["Transformer"], hp["seq_lin"], hp.get("ctc_lin"),
            os.path.join(experiment_directory, "save"), tokenizer,
            int(hp.get("n_mels", 80)), **kw
        )

    @classmethod
    def _load_from_save(cls, cnn, transformer, seq_lin, ctc_lin,
                        ckpt_dir: str, tokenizer, n_mels: int,
                        avg_checkpoints: Optional[int] = None,
                        **kw) -> "STEngine":
        from flax import serialization

        from .training.checkpoint import Checkpointer, average_checkpoints

        ckpts = Checkpointer(ckpt_dir).find_checkpoints(
            max_key="ACC", max_num_checkpoints=avg_checkpoints
        )
        if not ckpts:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
        raw = average_checkpoints(ckpts, "model")
        # template init for from_state_dict
        rng = jax.random.PRNGKey(0)
        feats = jnp.zeros((1, 101, n_mels))
        cnn_p = cnn.init(rng, feats)
        src = cnn.apply(cnn_p, feats)
        tr_p = transformer.init(rng, src, jnp.ones((1, 4), jnp.int32))
        enc = transformer.apply(tr_p, src, method=transformer.encode)
        template = {
            "CNN": cnn_p,
            "Transformer": tr_p,
            "seq_lin": seq_lin.init(rng, enc),
        }
        if ctc_lin is not None:
            template["ctc_lin"] = ctc_lin.init(rng, enc)
        params = serialization.from_state_dict(template, raw)
        cmvn = cmvn_init(n_mels)
        if "normalizer" in ckpts[0].names():
            n = ckpts[0].load("normalizer")
            cmvn = CmvnState(
                mean=jnp.asarray(n["mean"]), std=jnp.asarray(n["std"]),
                count=jnp.asarray(n["count"]),
            )
        return cls(transformer, cnn, seq_lin, ctc_lin, params, cmvn,
                   tokenizer, **kw)

    # ------------------------------------------------------------- internal
    def _bucket_width(self, n_samples: int) -> int:
        seconds = n_samples / self.sample_rate
        for b in self.buckets:
            if seconds <= b:
                return int(b * self.sample_rate)
        return int(
            math.ceil(seconds / self.buckets[-1]) * self.buckets[-1]
            * self.sample_rate
        )

    def _prepare(self, wavs: Sequence[np.ndarray]):
        """Group inputs by bucket; returns list of (indices, array, lens)."""
        pcm16 = self.transfer_dtype == "int16"
        by_width: Dict[int, List[int]] = {}
        arrays = []
        for i, wav in enumerate(wavs):
            wav = np.asarray(wav)
            if pcm16:
                # pack once on host; device unpacks (halves H2D bytes)
                if wav.dtype != np.int16:
                    wav = np.clip(
                        np.asarray(wav, np.float32) * 32768.0,
                        -32768, 32767,
                    ).astype(np.int16)
            elif wav.dtype == np.int16:
                wav = wav.astype(np.float32) / 32768.0
            else:
                wav = np.asarray(wav, np.float32)
            arrays.append(wav)
            by_width.setdefault(self._bucket_width(len(wav)), []).append(i)
        groups = []
        for width, idx in sorted(by_width.items()):
            rows = len(idx)
            if isinstance(self.pad_batch_rows, tuple):
                top = self.pad_batch_rows[-1]
                if rows > top:
                    rows = rows + (-rows) % top
                else:
                    rows = next(r for r in self.pad_batch_rows if r >= rows)
            elif self.pad_batch_rows:
                rows = rows + (-rows) % self.pad_batch_rows
            if self.mesh is not None:
                d = int(self.mesh.shape["data"])
                rows = rows + (-rows) % d
            batch = np.zeros(
                (rows, width), np.int16 if pcm16 else np.float32
            )
            # padded rows carry full-length silence (len 1.0): zero-length
            # masks would make every encoder position padding
            lens = np.ones((rows,), np.float32)
            for row, i in enumerate(idx):
                batch[row, : len(arrays[i])] = arrays[i]
                lens[row] = len(arrays[i]) / width
            batch_j, lens_j = jnp.asarray(batch), jnp.asarray(lens)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                batch_j = jax.device_put(
                    batch_j, NamedSharding(self.mesh, P("data"))
                )
                lens_j = jax.device_put(
                    lens_j, NamedSharding(self.mesh, P("data"))
                )
            groups.append((idx, batch_j, lens_j))
        return groups

    def _decode(self, wavs, src_lang: str, tgt_lang: str) -> List[str]:
        sp = self.tokenizer
        src_id = sp.encode_as_ids(f"[{src_lang}]")[-1]
        tgt_id = sp.encode_as_ids(f"[{tgt_lang}]")[-1]
        out: List[Optional[str]] = [None] * len(wavs)
        prompt = jnp.asarray(
            [self.searcher.bos_token, src_id, tgt_id], jnp.int32
        )
        for idx, batch, lens in self._prepare(wavs):
            tokens, lengths, _scores = self._decode_fused(
                self.params, self.cmvn, batch, lens, prompt
            )
            tokens = np.asarray(tokens)
            lengths = np.asarray(lengths)
            for row, i in enumerate(idx):
                out[i] = sp.decode_ids(
                    [int(t) for t in tokens[row, : lengths[row]]]
                )
        return out  # type: ignore[return-value]

    # ------------------------------------------------------------------ API
    def load_audio(self, path: str) -> np.ndarray:
        return read_audio(path, sample_rate=self.sample_rate)[0]

    def warmup(self, dual: bool = False) -> int:
        """Compile the full (bucket × pad-rung) program grid up front.

        A fresh server otherwise pays each fused compile on the FIRST
        request that hits a shape (tens of seconds per program on TPU),
        stalling early traffic behind it; with a persistent compilation
        cache (``utils/compile_cache.py``) this reloads executables
        instead of compiling. ``dual=True`` additionally warms the
        fused dual-prompt (ASR+ST) program per shape. Returns the
        number of (bucket, rung) shapes exercised."""
        rungs = (self.pad_batch_rows
                 if isinstance(self.pad_batch_rows, tuple)
                 else (self.pad_batch_rows or 1,))
        n = 0
        for sec in self.buckets:
            wav = np.zeros((max(int(sec * self.sample_rate), 1),),
                           np.float32)
            for r in rungs:
                self.translate([wav] * int(r))
                if dual:
                    self.transcribe_and_translate([wav] * int(r))
                n += 1
        return n

    def translate(self, wavs: Sequence[np.ndarray],
                  source_lang: Optional[str] = None,
                  target_lang: Optional[str] = None) -> List[str]:
        return self._decode(
            wavs, source_lang or self.source_lang,
            target_lang or self.target_lang,
        )

    def transcribe(self, wavs: Sequence[np.ndarray],
                   source_lang: Optional[str] = None) -> List[str]:
        lang = source_lang or self.source_lang
        return self._decode(wavs, lang, lang)

    def transcribe_and_translate(
        self, wavs: Sequence[np.ndarray],
        source_lang: Optional[str] = None,
        target_lang: Optional[str] = None,
    ) -> Tuple[List[str], List[str]]:
        """Both task outputs per utterance from ONE encoder pass and ONE
        fused dual-prompt beam search (the reference's inference recipe
        semantics — ``stac-st/inference.py:100-129`` — as a single serving
        call). Returns (transcriptions, translations).

        Performance note (tools/exp_dual_decode.py, measured on chip):
        fusion beats two sequential searches while the fused row count
        (2 · batch · beam) stays overhead-bound (~80 rows at full decode
        budget; +26% at batch 1) and costs ~10-25% beyond that — size
        serving batches accordingly when using this endpoint under load."""
        sp = self.tokenizer
        src = source_lang or self.source_lang
        tgt = target_lang or self.target_lang
        src_id = sp.encode_as_ids(f"[{src}]")[-1]
        tgt_id = sp.encode_as_ids(f"[{tgt}]")[-1]
        bos = self.searcher.bos_token
        prompts = jnp.asarray(
            [[bos, src_id, src_id], [bos, src_id, tgt_id]], jnp.int32
        )
        asr: List[Optional[str]] = [None] * len(wavs)
        st: List[Optional[str]] = [None] * len(wavs)
        for idx, batch, lens in self._prepare(wavs):
            tokens, lengths, _scores = self._decode_dual_fused(
                self.params, self.cmvn, batch, lens, prompts
            )
            tokens = np.asarray(tokens)
            lengths = np.asarray(lengths)
            rows = len(lens)
            for row, i in enumerate(idx):
                asr[i] = sp.decode_ids(
                    [int(t) for t in tokens[row, : lengths[row]]]
                )
                st[i] = sp.decode_ids(
                    [int(t) for t in
                     tokens[rows + row, : lengths[rows + row]]]
                )
        return asr, st  # type: ignore[return-value]

    def speaker_turns(self, wavs: Sequence[np.ndarray]) -> List[Dict]:
        """Per-input [turn]/[xt] events (seconds) from the CTC head."""
        if self._ctc_argmax is None:
            raise RuntimeError("engine built without a CTC head")
        results: List[Optional[Dict]] = [None] * len(wavs)
        for idx, batch, lens in self._prepare(wavs):
            enc = self._encode(self.params, self.cmvn, batch, lens)
            am = np.asarray(self._ctc_argmax(self.params, enc))
            ids = [f"utt{i}-0-0-0" for i in idx]
            events = extract_turn_events(
                ids, am, {"turn": self.turn_id, "xt": self.xt_id}
            )
            for row, i in enumerate(idx):
                results[i] = {
                    name: [
                        float(line.split()[3])
                        for line in events[name]
                        if line.split()[1] == ids[row]
                    ]
                    for name in ("turn", "xt")
                }
        return results  # type: ignore[return-value]

    def long_form(
        self,
        wav: np.ndarray,
        source_lang: Optional[str] = None,
        target_lang: Optional[str] = None,
        *,
        segmentation: str = "pause",
        dac_min_segment_length: float = 10.0,
        dac_max_segment_length: float = 15.0,
        frame_ms: int = 10,
        aggressiveness: int = 1,
        padding_ms: int = 300,
        prob_fn=None,
        uri: str = "conversation",
    ) -> Dict:
        """Whole-conversation inference in ONE call: VAD-segment a long
        waveform, batch the segments through the fused dual-prompt
        (ASR+ST) search plus the CTC speaker-turn head, and merge.

        The reference needs a four-stage shell pipeline for this
        (``run_shas_segmentation.sh`` → ``inference.py`` →
        ``fix_RTTM.py`` → realign); here the same semantics are an
        engine method: ``segmentation='pause'`` is the WebRTC
        pause-based method (frame 10 ms / aggressiveness 1 —
        ``run_shas_segmentation.sh:113-121``), ``'shas'`` the pDAC
        min/max method (defaults = the grid's ``10_15`` point,
        line 137; pass ``prob_fn`` to plug a learned frame classifier).

        Returns a dict with per-segment results (``segments``: start /
        end seconds, raw ``transcription``/``translation`` still
        carrying ``[turn]``/``[xt]`` markers), conversation-level
        merged clean texts, and absolute-time RTTM lines per marker
        (utterance ids follow the reference's
        ``<uri>-0-<start_cs>-<end_cs>`` centisecond convention that
        ``fix_rttm``/the F1 scorer parse).
        """
        from .prep.shas import pause_based_segments, shas_segments

        wav = np.asarray(wav)
        if wav.dtype == np.int16:
            wav = wav.astype(np.float32) / 32768.0
        else:
            wav = wav.astype(np.float32)
        if segmentation == "pause":
            segs = pause_based_segments(
                wav, self.sample_rate, frame_ms, aggressiveness,
                padding_ms)
        elif segmentation == "shas":
            segs = shas_segments(
                wav, self.sample_rate, dac_min_segment_length,
                dac_max_segment_length, prob_fn)
        else:
            raise ValueError(
                f"segmentation must be 'pause' or 'shas', got "
                f"{segmentation!r}")
        empty = {
            "segments": [], "transcription": "", "translation": "",
            "rttm": {"turn": [], "xt": []},
        }
        if not segs:
            return empty
        segs = sorted(segs)
        sr = self.sample_rate
        seg_wavs, seg_ids = [], []
        for off, dur in segs:
            a, b = int(round(off * sr)), int(round((off + dur) * sr))
            seg_wavs.append(wav[a:b])
            seg_ids.append(
                f"{uri}-0-{int(round(off * 100)):06d}-"
                f"{int(round((off + dur) * 100)):06d}")

        sp = self.tokenizer
        src = source_lang or self.source_lang
        tgt = target_lang or self.target_lang
        src_id = sp.encode_as_ids(f"[{src}]")[-1]
        tgt_id = sp.encode_as_ids(f"[{tgt}]")[-1]
        bos = self.searcher.bos_token
        prompts = jnp.asarray(
            [[bos, src_id, src_id], [bos, src_id, tgt_id]], jnp.int32)
        token_ids = {"turn": self.turn_id, "xt": self.xt_id}

        asr: List[Optional[str]] = [None] * len(seg_wavs)
        st: List[Optional[str]] = [None] * len(seg_wavs)
        rttm: Dict[str, List[str]] = {"turn": [], "xt": []}
        for idx, batch, lens in self._prepare(seg_wavs):
            if self._decode_dual_fused_ctc is not None:
                tokens, lengths, _scores, am = self._decode_dual_fused_ctc(
                    self.params, self.cmvn, batch, lens, prompts)
                events = extract_turn_events(
                    [seg_ids[i] for i in idx],
                    np.asarray(am)[: len(idx)], token_ids)
                for name in rttm:
                    rttm[name].extend(events[name])
            else:
                tokens, lengths, _scores = self._decode_dual_fused(
                    self.params, self.cmvn, batch, lens, prompts)
            tokens, lengths = np.asarray(tokens), np.asarray(lengths)
            rows = len(lens)
            for row, i in enumerate(idx):
                asr[i] = sp.decode_ids(
                    [int(t) for t in tokens[row, : lengths[row]]])
                st[i] = sp.decode_ids(
                    [int(t) for t in
                     tokens[rows + row, : lengths[rows + row]]])
        for name in rttm:
            rttm[name].sort(key=lambda ln: float(ln.split()[3]))

        def clean(texts: List[Optional[str]]) -> str:
            joined = " ".join(t for t in texts if t)
            words = [w for w in joined.split()
                     if w not in ("[turn]", "[xt]")]
            return " ".join(words)

        return {
            "segments": [
                {
                    "start": round(off, 6),
                    "end": round(off + dur, 6),
                    "transcription": asr[i],
                    "translation": st[i],
                }
                for i, (off, dur) in enumerate(segs)
            ],
            "transcription": clean(asr),
            "translation": clean(st),
            "rttm": rttm,
        }


class SpeculativeSTEngine:
    """Single-stream speculative serving: draft proposes, target verifies.

    Wraps two ``STEngine``s sharing a tokenizer: the DRAFT (a small,
    cheap model — e.g. the reference 'small' preset, or a distilled
    student) proposes ``k`` tokens per round and the TARGET verifies the
    whole window in ONE KV-cached windowed decode step. Output is
    exactly the target model's greedy decode (beam 1), independent of
    draft quality (``decoding/speculative.py``); the draft only changes
    the number of target dispatches.

    When to use: LARGE targets at LOW concurrency — the decode step's
    per-token cost there is dominated by re-reading the decoder weights
    from HBM every step (201 MB/step bf16 on the large preset), and the
    windowed verify reads them once per k tokens. Composes with
    ``weights_int8=True`` and ``kv_cache_dtype='int8'`` on either
    engine. At high concurrency the step is row-bound and speculation
    stops paying — keep the plain batched beam engine there. Greedy vs
    the engine's beam-10 default is a quality trade the caller opts
    into (the reference protocol's test config is beam 10,
    ``transformer_multitask.yaml:228-251``).

    The reference has no serving/speculative story; this is a
    beyond-reference serving mode.
    """

    def __init__(self, target: STEngine, draft: STEngine, k: int = 6):
        from .decoding.speculative import (
            bind_spec_model,
            speculative_greedy_search,
        )

        if target.sample_rate != draft.sample_rate:
            raise ValueError("target/draft sample rates differ")
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.target, self.draft, self.k = target, draft, int(k)
        self.last_stats: List[Dict] = []

        t_def, t_seq_def = target._transformer, target.searcher.seq_lin_def
        d_def, d_seq_def = draft._transformer, draft.searcher.seq_lin_def
        t_kv = target.searcher.kv_cache_dtype
        d_kv = draft.searcher.kv_cache_dtype
        t_encode, d_encode = target._encode, draft._encode
        cap = target.searcher.max_decode_tokens
        eos = target.searcher.config.eos_index
        mask_pad = target.searcher.mask_encoder_padding
        k_steps = self.k

        @jax.jit
        def _program(tp, tcm, dp, dcm, wavs, lens, prompt):
            # bind INSIDE the jit so the weights are traced arguments,
            # not constants baked into the HLO (a large preset would
            # otherwise serialize its whole param tree into the program)
            t_bound = bind_spec_model(
                t_def, t_seq_def, tp["Transformer"], tp["seq_lin"], t_kv)
            d_bound = bind_spec_model(
                d_def, d_seq_def, dp["Transformer"], dp["seq_lin"], d_kv)
            enc_t = t_encode(tp, tcm, wavs, lens)
            enc_d = d_encode(dp, dcm, wavs, lens)
            S = enc_t.shape[1]
            max_steps = S if cap is None else min(S, cap)
            bias_t = bias_d = None
            if mask_pad:
                from .ops import masks as M

                pad_t = M.src_key_padding_mask_encode(lens, S)
                bias_t = M.additive_bias(pad_t[:, None, None, :])
                pad_d = M.src_key_padding_mask_encode(
                    lens, enc_d.shape[1])
                bias_d = M.additive_bias(pad_d[:, None, None, :])
            return speculative_greedy_search(
                t_bound, d_bound, enc_t, enc_d, prompt, max_steps,
                k_steps, eos_index=eos, enc_bias_target=bias_t,
                enc_bias_draft=bias_d,
            )

        self._program = _program

    def _decode_one(self, wav: np.ndarray, src_lang: str,
                    tgt_lang: str) -> str:
        sp = self.target.tokenizer
        src_id = sp.encode_as_ids(f"[{src_lang}]")[-1]
        tgt_id = sp.encode_as_ids(f"[{tgt_lang}]")[-1]
        prompt = jnp.asarray(
            [self.target.searcher.bos_token, src_id, tgt_id], jnp.int32
        )
        wav = np.asarray(wav)
        if wav.dtype == np.int16:
            wav = wav.astype(np.float32) / 32768.0
        width = self.target._bucket_width(len(wav))
        batch = np.zeros((1, width), np.float32)
        batch[0, : len(wav)] = wav
        lens = np.asarray([len(wav) / width], np.float32)
        res = self._program(
            self.target.params, self.target.cmvn,
            self.draft.params, self.draft.cmvn,
            jnp.asarray(batch), jnp.asarray(lens), prompt,
        )
        n = int(res.length)
        steps = int(res.target_steps)
        self.last_stats.append({
            "tokens": n,
            "target_steps": steps,
            "tokens_per_target_step": n / max(steps, 1),
            "drafted": int(res.drafted),
        })
        return sp.decode_ids([int(t) for t in np.asarray(res.tokens[:n])])

    # --------------------------------------------------------------- API
    def transcribe(self, wavs: Sequence[np.ndarray],
                   source_lang: Optional[str] = None) -> List[str]:
        lang = source_lang or self.target.source_lang
        self.last_stats = []
        return [self._decode_one(w, lang, lang) for w in wavs]

    def translate(self, wavs: Sequence[np.ndarray],
                  source_lang: Optional[str] = None,
                  target_lang: Optional[str] = None) -> List[str]:
        src = source_lang or self.target.source_lang
        tgt = target_lang or self.target.target_lang
        self.last_stats = []
        return [self._decode_one(w, src, tgt) for w in wavs]

    def warmup(self) -> int:
        """Compile the per-bucket speculative program grid up front."""
        n = 0
        for sec in self.target.buckets:
            wav = np.zeros(
                (max(int(sec * self.target.sample_rate), 1),), np.float32)
            self.translate([wav])
            n += 1
        return n
