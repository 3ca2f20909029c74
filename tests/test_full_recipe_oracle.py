"""Full-recipe differential fidelity gate (VERDICT r2 item 2).

Drives BOTH stacks end-to-end on the same synthetic corpus with the same
imported weights and asserts byte-level agreement of every recipe artifact:

  wav -> fbank -> CMVN -> CNN -> floor-mask encode -> CTC [turn]/[xt]
  RTTM at 25 fps -> dual prompted beam decode (ASR + ST, SB test-search
  semantics: eos-threshold, length norm, temperature 1.15) -> special-token
  strip -> SentencePiece decode -> Moses detok -> per-conversation merged
  bleu/wer/gt CSV files.

The torch side is a reference-faithful reimplementation
(``tests/sb_oracle.py``: SB-named modules + the S2SBeamSearcher loop of
``stac-st/modules/mutitask_decoder.py`` + the recipe glue of
``stac-st/inference.py:53-82,88-201`` and
``stac-st/dataio_and_utils.py:290-419``). The TPU side is the real
``recipes/inference.py`` driven through an ``STTrainer`` whose state holds
the imported weights. Any semantic drift anywhere in the pipeline fails
this test.
"""

import csv
import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax.numpy as jnp

from fixtures import make_corpus, train_fixture_tokenizer
from sb_oracle import (
    OracleDims,
    SBBeamSearcher,
    build_oracle,
    torch_fbank,
    torch_normalize,
)

from stac_st_tpu.data.dataset import SpeechDataset
from stac_st_tpu.data.loader import BatchLoader
from stac_st_tpu.decoding.beam_search import MultiTaskBeamSearch
from stac_st_tpu.interop.sb_import import import_model_state_dict
from stac_st_tpu.models import (
    ConvolutionFrontEnd,
    LinearHead,
    TransformerMultiTask,
)
from stac_st_tpu.ops import Fbank, InputNormalization
from stac_st_tpu.ops.cmvn import CmvnState
from stac_st_tpu.training.trainer import STTrainer
from stac_st_tpu.utils.recipe_io import get_detokenizer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "recipes"))

N_MELS, CH = 80, 16
D, H, ENC_L, DEC_L, FFN = 32, 4, 2, 2, 64
BEAM = 5


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("oracle_corpus"))
    asr_json, st_json, joint_json = make_corpus(
        root, n_utts=12, seconds=0.45, seconds_jitter=0.2
    )
    sp, _ = train_fixture_tokenizer(root, joint_json, vocab=150)
    vocab = sp.get_piece_size()

    dims = OracleDims(d_model=D, nhead=H, n_enc=ENC_L, n_dec=DEC_L,
                      d_ffn=FFN, vocab=vocab, n_mels=N_MELS, ch=CH)
    oracle = build_oracle(dims, seed=3)
    params = import_model_state_dict(oracle.state_dict())

    rng = np.random.default_rng(7)
    mean = rng.standard_normal(N_MELS).astype(np.float32)
    std = (0.5 + rng.random(N_MELS)).astype(np.float32)
    cmvn = CmvnState(
        mean=jnp.asarray(mean), std=jnp.asarray(std),
        count=jnp.asarray(100.0),
    )
    return dict(root=root, st_json=st_json, sp=sp, vocab=vocab,
                oracle=oracle, params=params, mean=mean, std=std,
                cmvn=cmvn)


def _my_trainer(setup, out_dir):
    sp = setup["sp"]
    vocab = setup["vocab"]
    cnn = ConvolutionFrontEnd(out_channels=(CH, CH))
    transformer = TransformerMultiTask(
        tgt_vocab=vocab, input_size=(N_MELS // 4) * CH, d_model=D, nhead=H,
        num_encoder_layers=ENC_L, num_decoder_layers=DEC_L, d_ffn=FFN,
        dropout=0.0, normalize_before=True, causal=False, max_length=512,
    )
    seq_lin = LinearHead(input_size=D, n_neurons=vocab)
    ctc_lin = LinearHead(input_size=D, n_neurons=vocab)
    searcher = MultiTaskBeamSearch(
        [transformer, seq_lin, ctc_lin], bos_index=1, eos_index=2,
        blank_index=0, min_decode_ratio=0.0, max_decode_ratio=1.0,
        beam_size=BEAM, using_eos_threshold=True,
        length_normalization=True, temperature=1.15,
    )
    hparams = {
        "compute_features": Fbank(n_mels=N_MELS),
        "ctc_weight": 0.3,
        "label_smoothing": 0.1,
        "loss_reduction": "batchmean",
        "pad_index": 0,
        "blank_index": 0,
        "bos_index": 1,
        "eos_index": 2,
        "turn": sp.piece_to_id("[turn]"),
        "xt": sp.piece_to_id("[xt]"),
        "n_mels": N_MELS,
        "seed": 0,
        "tokenizer": sp,
        "test_search": searcher,
        "number_of_tasks": 2,
        "get_rttm_files": True,
        "test_batch_size": 4,
        "output_folder": out_dir,
        "data_folder": setup["root"],
        "sample_rate": 16000,
    }
    modules = {"CNN": cnn, "Transformer": transformer, "seq_lin": seq_lin,
               "ctc_lin": ctc_lin, "normalize": InputNormalization()}
    trainer = STTrainer(
        modules=modules, hparams=hparams,
        run_opts={"data_parallel_count": 1, "rng_impl": "threefry"},
    )
    # seed the state with the imported reference weights + fixed CMVN
    dataset = SpeechDataset(
        setup["st_json"], tokenizer=sp,
        replacements={"data_root": setup["root"]},
    )
    loader = BatchLoader(dataset, batch_size=4)
    first = next(iter(loader))
    dev = trainer._device_batch(first)
    trainer.ensure_state(dev)
    trainer.state = trainer.state._replace(
        params=setup["params"], cmvn=setup["cmvn"]
    )
    return trainer, hparams


# --------------------------------------------------------------------------
# reference recipe glue, torch side (inference.py / dataio_and_utils.py)
# --------------------------------------------------------------------------
def _ref_append_gt_preds(ids, refs, hyps, target_lang, sp, chars_dict):
    """dataio_and_utils.py:366-419 (strip specials, SP decode, Moses)."""
    detok = get_detokenizer(target_lang)
    ids_list, preds = [], []
    for utt_id, tgts, utt_seq in zip(ids, refs, hyps):
        for key, value in chars_dict.items():
            tgts = tgts.replace(key, "").replace("  ", " ")
            utt_seq = [i for i in utt_seq if i != value]
        text = detok.detokenize(sp.decode_ids(list(utt_seq)).split(" "))
        ids_list.append(utt_id)
        preds.append(text)
    return ids_list, preds


def _ref_print_inference_output(ids, ground_truth, predictions, filepath):
    """dataio_and_utils.py:290-363 byte-faithfully."""
    is_translation = "bleu_" in filepath
    assert len(ids) == len(predictions)
    with open(ground_truth) as f:
        gt_data = json.load(f)
    gt_dict, pred_dict = {}, {}
    for utt_id, pred in zip(ids, predictions):
        utt_id = utt_id.split("-")[0]
        if utt_id not in pred_dict:
            pred_dict[utt_id] = f"{pred}"
            continue
        pred_dict[utt_id] = f"{pred_dict[utt_id]} [turn] {pred}"
    for utt_id, value in gt_data.items():
        utt_id = utt_id.split("-")[0]
        value = (value["translation_0"] if is_translation
                 else value["transcription"])
        if utt_id not in gt_dict:
            gt_dict[utt_id] = f"{value}"
            continue
        gt_dict[utt_id] = f"{gt_dict[utt_id]} [turn] {value}"
    csv_lines = [[u, "", p] for u, p in pred_dict.items()]
    filepath = filepath.replace(".txt", ".csv")
    csv_lines.insert(0, ["ID", "gt", "prediction"])
    with open(filepath, "w") as f:
        w = csv.writer(f, delimiter="|", quotechar='"',
                       quoting=csv.QUOTE_MINIMAL)
        for line in csv_lines:
            w.writerow(line)
    csv_lines = [[u, t, ""] for u, t in gt_dict.items()]
    gt_path = (filepath.replace(".txt", ".csv")
               .replace("-asr.csv", "-gt.csv")
               .replace("-st.csv", "-gt.csv"))
    csv_lines.insert(0, ["ID", "gt", "prediction"])
    with open(gt_path, "w") as f:
        w = csv.writer(f, delimiter="|", quotechar='"',
                       quoting=csv.QUOTE_MINIMAL)
        for line in csv_lines:
            w.writerow(line)


def _oracle_run_split(setup, out_dir):
    """The reference inference recipe, torch end to end.

    Returns token streams keyed (utt_id, task) for cross-stack assert."""
    sp = setup["sp"]
    oracle = setup["oracle"]
    turn_id, xt_id = sp.piece_to_id("[turn]"), sp.piece_to_id("[xt]")
    chars_dict = {"[turn]": turn_id, "[xt]": xt_id}

    dataset = SpeechDataset(
        setup["st_json"], tokenizer=sp,
        replacements={"data_root": setup["root"]},
    )
    loader = BatchLoader(dataset, batch_size=4)
    searcher = SBBeamSearcher(
        oracle[1], oracle[2], bos_index=1, eos_index=2, beam_size=BEAM,
        using_eos_threshold=True, length_normalization=True,
        temperature=1.15,
    )

    def lang_id(lang):
        return sp.encode_as_ids(f"[{lang}]")[-1]

    ids_list, asr_list, st_list = [], [], []
    turn_rttm, xt_rttm = [], []
    streams = {}
    for batch in loader:
        sig = np.asarray(batch.sig.data)
        sig_len = np.asarray(batch.sig.lengths)
        n = len(batch.id)
        feats = torch_fbank(sig, n_mels=N_MELS)
        feats = torch_normalize(feats, setup["mean"], setup["std"])
        with torch.no_grad():
            src = oracle[0](feats)
            enc = oracle[1].encode(src, torch.from_numpy(sig_len))
            p_ctc = F.log_softmax(oracle[3](enc), dim=-1)
        # append_speaker_turns (inference.py:53-82)
        am = p_ctc.argmax(-1).numpy()
        for b, utt_id in enumerate(batch.id):
            abs_start = int(utt_id.split("-")[2]) / 100.0
            for cnt in range(am.shape[1]):
                start = cnt * (1 / 25)
                if am[b, cnt] == turn_id:
                    turn_rttm.append(
                        f"SPEAKER {utt_id} 1 {abs_start + start:.3f} "
                        f"{(1/25)} <NA> <NA> SPK1 <NA> <NA>"
                    )
                if am[b, cnt] == xt_id:
                    xt_rttm.append(
                        f"SPEAKER {utt_id} 1 {abs_start + start:.3f} "
                        f"{(1/25)} <NA> <NA> SPK1 <NA> <NA>"
                    )
        src_lang = batch.source_lang[0]
        tgt_lang = batch.target_lang[0]
        for task, s, t in (("transcription", src_lang, src_lang),
                           ("translation", src_lang, tgt_lang)):
            searcher.set_decoder_prefix_tokens(lang_id(s), lang_id(t))
            hyps, _scores = searcher(enc[:n], sig_len[:n])
            for utt_id, hyp in zip(batch.id, hyps):
                streams[(utt_id, task)] = list(hyp)
            refs = (batch.extras["translation_0"] if task == "translation"
                    else batch.extras["transcription"])
            ids, preds = _ref_append_gt_preds(
                batch.id, refs, hyps, t, sp, chars_dict
            )
            for utt_id, pred in zip(ids, preds):
                if utt_id not in ids_list:
                    ids_list.append(utt_id)
                (st_list if task == "translation" else asr_list).append(pred)

    dataset_id = setup["st_json"].split("/")[-2]
    ground_truth = setup["st_json"]
    _ref_print_inference_output(
        ids_list, ground_truth, asr_list,
        os.path.join(out_dir, f"wer_{dataset_id}-asr.csv"),
    )
    _ref_print_inference_output(
        ids_list, ground_truth, st_list,
        os.path.join(out_dir, f"bleu_{dataset_id}-st.csv"),
    )
    for name, lines in (("turn", turn_rttm), ("xt", xt_rttm)):
        with open(os.path.join(out_dir,
                               f"RTTM_{dataset_id}_{name}.csv"), "w") as f:
            for line in lines:
                f.write(line + "\n")
    return streams


@pytest.fixture(scope="module")
def ran(setup, tmp_path_factory):
    my_dir = str(tmp_path_factory.mktemp("my_out"))
    ref_dir = str(tmp_path_factory.mktemp("ref_out"))

    trainer, hparams = _my_trainer(setup, my_dir)
    from inference import run_split  # recipes/inference.py

    json_base = setup["st_json"][: -len(".json")]
    run_split(trainer, hparams, json_base)

    streams = _oracle_run_split(setup, ref_dir)
    return dict(my_dir=my_dir, ref_dir=ref_dir, trainer=trainer,
                hparams=hparams, streams=streams)


class TestFullRecipeParity:
    def test_token_streams_identical(self, setup, ran):
        """Every decoded hypothesis token stream matches SB's beam search."""
        trainer = ran["trainer"]
        searcher = ran["hparams"]["test_search"]
        sp = setup["sp"]
        dataset = SpeechDataset(
            setup["st_json"], tokenizer=sp,
            replacements={"data_root": setup["root"]},
        )
        loader = BatchLoader(dataset, batch_size=4)
        checked = 0
        for batch in loader:
            dev = trainer._device_batch(batch)
            _p_ctc, enc_out = trainer.encode_forward(
                trainer.state.params, trainer.state.cmvn, dev
            )
            n = len(batch.id)
            for task, s, t in (("transcription", "es", "es"),
                               ("translation", "es", "en")):
                hyps = trainer._run_search(
                    searcher, enc_out, dev["sig_len"], s, t
                )[:n]
                for utt_id, hyp in zip(batch.id, hyps):
                    want = ran["streams"][(utt_id, task)]
                    assert list(hyp) == want, (
                        f"{utt_id}/{task}: {list(hyp)} != {want}"
                    )
                    checked += 1
        assert checked == 24  # 12 utts x 2 tasks

    @pytest.mark.parametrize("name", ["bleu_{d}-st.csv", "wer_{d}-asr.csv",
                                      "bleu_{d}-gt.csv",
                                      "RTTM_{d}_turn.csv",
                                      "RTTM_{d}_xt.csv"])
    def test_artifacts_byte_identical(self, setup, ran, name):
        dataset_id = setup["st_json"].split("/")[-2]
        fname = name.format(d=dataset_id)
        mine = os.path.join(ran["my_dir"], fname)
        ref = os.path.join(ran["ref_dir"], fname)
        assert os.path.isfile(mine), f"recipe did not write {fname}"
        assert os.path.isfile(ref)
        with open(mine, "rb") as f1, open(ref, "rb") as f2:
            a, b = f1.read(), f2.read()
        assert a == b, f"{fname} differs:\nmine: {a[:400]}\nref:  {b[:400]}"

    def test_rttm_not_trivially_empty_everywhere(self, setup, ran):
        """Guard against vacuous agreement: with random weights the CTC
        argmax should produce at least one RTTM event OR non-empty decodes;
        assert the bleu csv actually carries hypothesis text."""
        dataset_id = setup["st_json"].split("/")[-2]
        with open(os.path.join(ran["my_dir"],
                               f"bleu_{dataset_id}-st.csv")) as f:
            rows = list(csv.reader(f, delimiter="|"))
        assert len(rows) > 1
        assert any(r[2].strip() for r in rows[1:])
