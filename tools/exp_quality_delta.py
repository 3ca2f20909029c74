#!/usr/bin/env python3
"""Greedy-vs-beam serving quality delta on a trained fixture model.

The continuous (in-flight) batching engine decodes greedily; the batch
front end runs the reference test protocol (beam 10, eos threshold,
length normalization, temperature 1.15 — reference
`stac-st/hparams/transformer_multitask.yaml:240-251`). This experiment
bounds the quality trade between the two serving engines with numbers:
train a tiny multitask model on a synthetic Fisher-style corpus, decode
the SAME utterances through both engines, and report corpus BLEU (ST)
and WER (ASR) per engine on (a) the training set (memorization regime —
isolates pure search quality) and (b) a held-out set drawn from the same
distribution (generalization regime).

Usage: python tools/exp_quality_delta.py  (CPU, a few minutes)
Env: STAC_QD_EPOCHS (default 60), STAC_QD_UTTS (default 32).
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VOCAB = 200


def train_fixture(workdir, epochs, n_utts):
    import jax
    from fixtures import make_corpus, train_fixture_tokenizer

    from stac_st_tpu.data.dataset import SpeechDataset
    from stac_st_tpu.data.loader import BatchLoader
    from stac_st_tpu.decoding.beam_search import MultiTaskBeamSearch
    from stac_st_tpu.models import (
        ConvolutionFrontEnd,
        LinearHead,
        TransformerMultiTask,
    )
    from stac_st_tpu.ops import Fbank, InputNormalization
    from stac_st_tpu.training.optim import AdamW
    from stac_st_tpu.training.schedulers import WarmCoolDecayLRSchedule
    from stac_st_tpu.training.trainer import STTrainer
    from stac_st_tpu.utils.metrics import (
        AccuracyStats,
        BLEUStats,
        ErrorRateStats,
    )

    asr_json, st_json, joint_json = make_corpus(
        workdir, n_utts=n_utts, seconds=0.5, seconds_jitter=0.4, seed=0,
        multi_turn_every=3,
    )
    sp, _ = train_fixture_tokenizer(workdir, joint_json, vocab=VOCAB)

    # the reference trains on the ASR+ST MIXTURE (both prompts seen);
    # merge the two manifests with distinct ids, as the jq-merge
    # mixture cascade does
    import json as _json

    mixed = {}
    for tag, path in (("asr", asr_json), ("st", st_json)):
        with open(path) as f:
            for uid, entry in _json.load(f).items():
                if tag == "asr":
                    # ASR rows prompt [src][src] (the real Fisher prep
                    # sets target_lang == source_lang for transcription
                    # rows; the test fixture leaves base target_lang)
                    entry = dict(entry, target_lang=entry["source_lang"])
                mixed[f"{uid}-{tag}"] = entry
    mixed_json = os.path.join(workdir, "data-mixed.json")
    with open(mixed_json, "w") as f:
        _json.dump(mixed, f)
    st_json = mixed_json

    cnn = ConvolutionFrontEnd(out_channels=(16, 16))
    transformer = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=20 * 16, d_model=48, nhead=4,
        num_encoder_layers=2, num_decoder_layers=2, d_ffn=96, dropout=0.1,
        normalize_before=True,
    )
    seq_lin = LinearHead(input_size=48, n_neurons=VOCAB)
    ctc_lin = LinearHead(input_size=48, n_neurons=VOCAB)
    searcher = MultiTaskBeamSearch(
        [transformer, seq_lin, ctc_lin], bos_index=1, eos_index=2,
        blank_index=0, beam_size=3,
    )
    hparams = {
        "compute_features": Fbank(),
        "ctc_weight": 0.3, "label_smoothing": 0.1,
        "loss_reduction": "batchmean", "pad_index": 0, "blank_index": 0,
        "turn": sp.piece_to_id("[turn]"), "xt": sp.piece_to_id("[xt]"),
        "grad_accumulation_factor": 1, "max_grad_norm": 5.0,
        "lr_adam": 3e-3, "seed": 0, "optimizer_step_limit": 10_000,
        "valid_search_interval": 10_000,
        "lr_scheduler": WarmCoolDecayLRSchedule(3e-3, 10, 10, 4000,
                                                decay_every=400),
        "Adam": AdamW(lr=3e-3),
        "tokenizer": sp,
        "valid_search": searcher, "test_search": searcher,
        "acc_computer": AccuracyStats, "bleu_computer": BLEUStats,
        "error_rate_computer": ErrorRateStats,
    }
    modules = {"CNN": cnn, "Transformer": transformer, "seq_lin": seq_lin,
               "ctc_lin": ctc_lin, "normalize": InputNormalization()}
    dataset = SpeechDataset(st_json, tokenizer=sp,
                            replacements={"data_root": workdir})
    loader = BatchLoader(dataset, batch_size=8, token_pad_multiple=16)
    trainer = STTrainer(modules=modules, opt_class=hparams["Adam"],
                        hparams=hparams, run_opts={})
    rng = jax.random.PRNGKey(0)
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        losses = []
        for batch in loader:
            dev = trainer._device_batch(batch)
            trainer.ensure_state(dev)
            rng, k = jax.random.split(rng)
            trainer.state, m = trainer.train_step(
                trainer.state, dev, k, update_cmvn=(epoch < 2)
            )
            losses.append(float(m["loss"]))
        if epoch % 10 == 0 or epoch == epochs - 1:
            print(f"# epoch {epoch}: loss {np.mean(losses):.3f}",
                  flush=True)
    return dict(sp=sp, cnn=cnn, transformer=transformer, seq_lin=seq_lin,
                ctc_lin=ctc_lin, params=trainer.state.params,
                cmvn=trainer.state.cmvn)


def _load_split(workdir, n_utts, seed):
    """Wavs + (es, en) references, reusing the fixture generator."""
    import io
    import json as _json
    import wave

    from fixtures import make_corpus

    d = os.path.join(workdir, f"split_{seed}")
    os.makedirs(d, exist_ok=True)
    _, st_json, _ = make_corpus(d, n_utts=n_utts, seconds=0.5,
                                seconds_jitter=0.4, seed=seed,
                                multi_turn_every=3)
    with io.open(st_json) as f:
        meta = _json.load(f)
    wavs, refs_es, refs_en = [], [], []
    for utt in sorted(meta):
        path = meta[utt]["wav"].replace("{data_root}", d)
        with wave.open(path, "rb") as w:
            pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        wavs.append(pcm.astype(np.float32) / 32768.0)
        refs_es.append(meta[utt]["transcription"])
        refs_en.append(meta[utt]["translation_0"])
    return wavs, refs_es, refs_en


def _score(name, split, asr_hyp, st_hyp, refs_es, refs_en):
    from stac_st_tpu.utils.metrics import BLEUStats, ErrorRateStats

    def strip_markers(t):
        return " ".join(w for w in t.split() if w not in ("[turn]", "[xt]"))

    bleu = BLEUStats()
    ids = [f"u{i}" for i in range(len(st_hyp))]
    # markers are stripped from hyps AND refs (the reference's "no_turn"
    # scoring variant) so multi-turn utterances aren't charged guaranteed
    # deletions — ADVICE r4 item 1
    bleu.append(ids, [strip_markers(t) for t in st_hyp],
                [[strip_markers(r) for r in refs_en]])
    wer = ErrorRateStats()
    wer.append(ids, [strip_markers(t).split() for t in asr_hyp],
               [strip_markers(r).split() for r in refs_es])
    row = {
        "engine": name, "split": split,
        "st_bleu": round(float(bleu.summarize("BLEU")), 2),
        "asr_wer": round(float(wer.summarize("WER")), 2),
        "n_utts": len(ids),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    # quality is hardware-independent; run on CPU so the experiment does
    # not pay ~100 tunnel compiles (STAC_QD_TPU=1 keeps the default chip)
    if os.environ.get("STAC_QD_TPU") != "1":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    epochs = int(os.environ.get("STAC_QD_EPOCHS", "60"))
    n_utts = int(os.environ.get("STAC_QD_UTTS", "32"))
    workdir = tempfile.mkdtemp(prefix="stac_qd_")

    from stac_st_tpu.serving import STEngine
    from stac_st_tpu.serving_continuous import ContinuousBatchingEngine

    parts = train_fixture(workdir, epochs, n_utts)

    def build_engine():
        return STEngine(
            parts["transformer"], parts["cnn"], parts["seq_lin"],
            parts["ctc_lin"], parts["params"], parts["cmvn"], parts["sp"],
            beam_size=10, bucket_seconds=(0.5, 1.0), bf16=False,
            max_decode_tokens=48,
            turn_id=parts["sp"].piece_to_id("[turn]"),
            xt_id=parts["sp"].piece_to_id("[xt]"),
        )

    beam_engine = build_engine()
    cont = ContinuousBatchingEngine(build_engine(), slots=8, chunk=8)

    rows = []
    try:
        for split, seed in (("train", 0), ("heldout", 1)):
            wavs, refs_es, refs_en = _load_split(workdir, n_utts, seed)
            asr_b, st_b = (beam_engine.transcribe(wavs),
                           beam_engine.translate(wavs))
            rows.append(_score("batch_beam10", split, asr_b, st_b,
                               refs_es, refs_en))
            asr_g, st_g = cont.transcribe(wavs), cont.translate(wavs)
            rows.append(_score("continuous_greedy", split, asr_g, st_g,
                               refs_es, refs_en))
    finally:
        cont.close()

    print(json.dumps({"metric": "quality_delta", "epochs": epochs,
                      "rows": rows}))


if __name__ == "__main__":
    main()
