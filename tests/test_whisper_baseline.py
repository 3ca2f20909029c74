"""Execute the Whisper baseline end-to-end with a locally built tiny
random WhisperForConditionalGeneration checkpoint (no network).

Covers the full reference path (``evaluations/whisper/eval_whisper.py``):
processor feature extraction → generate with forced (language, task)
decoder ids → hypothesis cleanup → 4-ref BLEU / WER with the >125 % outlier
skip → per-conversation artifacts.
"""

import json
import os

import numpy as np
import pytest

pytest.importorskip("transformers")

from stac_st_tpu.data.audio import write_wav
from stac_st_tpu.eval.whisper_baseline import run_whisper_baseline


@pytest.fixture(scope="module")
def tiny_whisper(tmp_path_factory):
    """Build + save a tiny random Whisper checkpoint and processor."""
    import torch
    from transformers import (
        WhisperConfig,
        WhisperFeatureExtractor,
        WhisperForConditionalGeneration,
        WhisperTokenizer,
    )
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    out = tmp_path_factory.mktemp("tiny_whisper")
    vocab = {c: i for i, c in enumerate(bytes_to_unicode().values())}
    vocab["<|endoftext|>"] = len(vocab)
    with open(out / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(out / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
    tok = WhisperTokenizer(str(out / "vocab.json"), str(out / "merges.txt"))
    tok.add_special_tokens({
        "additional_special_tokens": ["<|startoftranscript|>"]
        + [f"<|{lang}|>" for lang in ("en", "es", "de", "fr")]
        + ["<|translate|>", "<|transcribe|>", "<|notimestamps|>"],
    })
    tok.save_pretrained(str(out))
    WhisperFeatureExtractor(feature_size=80).save_pretrained(str(out))

    torch.manual_seed(0)
    cfg = WhisperConfig(
        vocab_size=len(tok), d_model=32,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        num_mel_bins=80, max_source_positions=1500,
        max_target_positions=448,
        pad_token_id=tok.pad_token_id or vocab["<|endoftext|>"],
        bos_token_id=vocab["<|endoftext|>"],
        eos_token_id=vocab["<|endoftext|>"],
        decoder_start_token_id=tok.convert_tokens_to_ids(
            "<|startoftranscript|>"
        ),
        suppress_tokens=[], begin_suppress_tokens=[],
    )
    model = WhisperForConditionalGeneration(cfg)
    model.generation_config.suppress_tokens = None
    model.generation_config.begin_suppress_tokens = None
    model.generation_config.forced_decoder_ids = None
    model.generation_config.max_length = 24
    model.save_pretrained(str(out))
    return str(out)


@pytest.fixture(scope="module")
def fixture_manifest(tmp_path_factory):
    root = tmp_path_factory.mktemp("whisper_fixture")
    rng = np.random.default_rng(0)
    data = {}
    for conv in ("20051009_a", "20051010_b"):
        for i in range(2):
            uid = f"{conv}-A-{i:06d}-{i + 100:06d}"
            wav = os.path.join(str(root), f"{uid}.wav")
            write_wav(
                wav,
                (rng.standard_normal(16000) * 0.05).astype(np.float32),
                16000,
            )
            data[uid] = {
                "wav": wav,
                "duration": 1.0,
                "source_lang": "es",
                "target_lang": "en",
                "task": "translation",
                "transcription": "hola qué tal [turn] muy bien",
                **{f"translation_{n}": f"hello how are you ref{n} [xt] fine"
                   for n in range(4)},
            }
    path = os.path.join(str(root), "data-st.json")
    with open(path, "w") as f:
        json.dump(data, f)
    return path


def test_whisper_translate_end_to_end(tiny_whisper, fixture_manifest,
                                      tmp_path):
    summary = run_whisper_baseline(
        fixture_manifest, tiny_whisper, task="translate", language="es",
        out_dir=str(tmp_path),
    )
    assert "BLEU" in summary and np.isfinite(summary["BLEU"])
    assert len(summary["per_conversation"]) == 2  # one score per conversation
    report = json.load(open(
        tmp_path / "whisper_translate_data-st.json"
    ))
    assert len(report["outputs"]) == 4
    # references were detokenized and [xt] stripped
    assert "[xt]" not in report["outputs"][0][1]


def test_whisper_transcribe_end_to_end(tiny_whisper, fixture_manifest,
                                       tmp_path):
    summary = run_whisper_baseline(
        fixture_manifest, tiny_whisper, task="transcribe", language="es",
        out_dir=str(tmp_path),
    )
    # random model => garbage hyps => every utterance is a >125% WER
    # outlier and is skipped, exactly the reference's skip path — or, if
    # any short hyp sneaks under, WER is finite
    assert "WER" in summary


def test_whisper_missing_checkpoint_raises(fixture_manifest):
    with pytest.raises(FileNotFoundError):
        run_whisper_baseline(fixture_manifest, "/nonexistent/whisper")
