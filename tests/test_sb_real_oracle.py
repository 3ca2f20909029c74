"""Certify the torch mirror (tests/sb_oracle.py) against REAL SpeechBrain.

The model/search/train differential oracles in this suite gate the JAX
stack against ``sb_oracle`` — a builder-authored torch mirror of
SpeechBrain v0.5.14 semantics — because speechbrain is not installable in
the build image (VERDICT r4 "weak" item 4: a shared misreading of SB
would pass both sides). This module closes that loop the moment any host
HAS speechbrain: it certifies the mirror itself, piece by piece, against

* real SB modules (``Fbank``, ``InputNormalization``, ``nll_loss``,
  ``ctc_loss``, ``WarmCoolDecayLRSchedule``), and
* the REFERENCE'S OWN beam searcher
  (``/root/reference/stac-st/modules/mutitask_decoder.py``, which imports
  speechbrain internally) driving the same torch model the mirror's
  ``SBBeamSearcher`` drives.

In-image it skips (``pytest.importorskip``); on a speechbrain-capable
host it runs with no extra setup beyond the reference checkout (same
pattern as test_cleaning_oracle's direct reference imports).
docs/PARITY_RUNBOOK.md step "mirror certification" points here.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest
import torch

sb = pytest.importorskip("speechbrain")

sys.path.insert(0, os.path.dirname(__file__))

from sb_oracle import (  # noqa: E402
    OracleDims,
    SBBeamSearcher,
    build_oracle,
    sb_ctc_loss,
    sb_nll_loss,
    torch_fbank,
    torch_normalize,
    warm_cool_decay_lr,
)

REF_DECODER = "/root/reference/stac-st/modules/mutitask_decoder.py"

torch.manual_seed(0)


def test_fbank_matches_real_sb():
    from speechbrain.lobes.features import Fbank

    wavs = torch.randn(3, 16000) * 0.1
    real = Fbank(n_mels=80, n_fft=400, sample_rate=16000)(wavs)
    ours = torch_fbank(wavs, n_mels=80, sample_rate=16000, n_fft=400)
    assert real.shape == ours.shape
    torch.testing.assert_close(ours, real, rtol=1e-4, atol=1e-3)


def test_input_normalization_frozen_matches_real_sb():
    from speechbrain.processing.features import InputNormalization

    norm = InputNormalization(norm_type="global", update_until_epoch=4)
    feats = torch.randn(4, 20, 80)
    lens = torch.ones(4)
    # drive real SB's running stats for a few "epochs", then frozen
    for epoch in range(6):
        out = norm(feats, lens, epoch=epoch)
    ours = torch_normalize(feats, norm.glob_mean, norm.glob_std)
    torch.testing.assert_close(ours, out, rtol=1e-5, atol=1e-5)


def test_nll_loss_matches_real_sb():
    from speechbrain.nnet.losses import nll_loss

    logp = torch.log_softmax(torch.randn(3, 7, 50), dim=-1)
    targets = torch.randint(0, 50, (3, 7))
    length = torch.tensor([1.0, 0.8, 0.6])
    real = nll_loss(logp, targets, length=length, label_smoothing=0.1,
                    reduction="batchmean")
    ours = sb_nll_loss(logp, targets, length, label_smoothing=0.1,
                       reduction="batchmean")
    torch.testing.assert_close(ours, real, rtol=1e-5, atol=1e-6)


def test_ctc_loss_matches_real_sb():
    from speechbrain.nnet.losses import ctc_loss

    logp = torch.log_softmax(torch.randn(2, 30, 20), dim=-1)
    targets = torch.randint(1, 20, (2, 8))
    in_lens = torch.tensor([1.0, 0.9])
    tgt_lens = torch.tensor([1.0, 0.75])
    real = ctc_loss(logp, targets, in_lens, tgt_lens, blank_index=0,
                    reduction="batchmean")
    ours = sb_ctc_loss(logp, targets, in_lens, tgt_lens, blank_index=0,
                       reduction="batchmean")
    torch.testing.assert_close(ours, real, rtol=1e-5, atol=1e-6)


def test_warm_cool_decay_matches_real_sb():
    from speechbrain.nnet.schedulers import WarmCoolDecayLRSchedule

    lr, total = 1e-3, 1000
    sched = WarmCoolDecayLRSchedule(
        lr=lr, warmup=100, cooldown=100, total_steps=total,
        decay_every=100,
    )
    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    for step in (1, 50, 100, 101, 400, 899, 900, 950, 999):
        sched(opt, step)
        real_lr = opt.param_groups[0]["lr"]
        ours = warm_cool_decay_lr(step, lr, warmup=100, cooldown=100,
                                  total_steps=total, decay_every=100)
        assert real_lr == pytest.approx(ours, rel=1e-6), (step, real_lr,
                                                          ours)


@pytest.mark.skipif(not os.path.isfile(REF_DECODER),
                    reason="reference checkout not available")
def test_beam_search_matches_reference_own_searcher():
    """The mirror's SBBeamSearcher vs the reference's
    S2SMultiTaskTransformerBeamSearch (real S2SBeamSearcher loop) on the
    SAME torch model — test-protocol config (eos-threshold, length norm,
    temperature 1.15)."""
    spec = importlib.util.spec_from_file_location(
        "ref_mutitask_decoder", REF_DECODER)
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    dims = OracleDims()
    model = build_oracle(dims, seed=3)
    cnn, tfm, seq_lin, ctc_lin = model

    class DecodeAdapter(torch.nn.Module):
        """The reference searcher expects decode() -> (pred, attn)."""

        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def decode(self, memory, enc_states):
            return self.inner.decode(memory, enc_states), None

    B, S = 3, 9
    enc = torch.randn(B, S, dims.d_model)
    wav_len = torch.ones(B)

    common = dict(bos_index=1, eos_index=2, min_decode_ratio=0.0,
                  max_decode_ratio=1.0, using_eos_threshold=True,
                  length_normalization=True)
    for beam in (3, 5):
        real = ref_mod.S2SMultiTaskTransformerBeamSearch(
            modules=[DecodeAdapter(tfm), seq_lin, ctc_lin],
            temperature=1.15, beam_size=beam, **common)
        real.set_decoder_prefix_tokens(3, 4)
        out = real(enc, wav_len)
        real_hyps = out[0] if isinstance(out, tuple) else out

        ours = SBBeamSearcher(
            tfm, seq_lin, beam_size=beam, temperature=1.15, **common)
        ours.set_decoder_prefix_tokens(3, 4)
        our_hyps, _scores = ours(enc, wav_len)

        for b in range(B):
            assert list(map(int, real_hyps[b])) == list(
                map(int, our_hyps[b])), (beam, b)


@pytest.mark.skipif(
    not os.path.isfile(
        "/root/reference/stac-st/modules/TransformerMultiTask.py"),
    reason="reference checkout not available")
def test_transformer_forward_matches_reference_own_model():
    """The mirror's SB-named state_dict loads into the reference's OWN
    TransformerMultiTask (strict=True — key layout is part of the
    contract export_sb_ckpt relies on) and forward/encode/decode agree."""
    spec = importlib.util.spec_from_file_location(
        "ref_tmt", "/root/reference/stac-st/modules/TransformerMultiTask.py")
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    dims = OracleDims()
    model = build_oracle(dims, seed=1)
    _cnn, tfm, _seq, _ctc = model

    ref_model = ref_mod.TransformerMultiTask(
        tgt_vocab=dims.vocab, input_size=dims.input_size,
        d_model=dims.d_model, nhead=dims.nhead,
        num_encoder_layers=dims.n_enc, num_decoder_layers=dims.n_dec,
        d_ffn=dims.d_ffn, dropout=0.0,
        activation=torch.nn.GELU, normalize_before=True, causal=False,
    ).eval()
    tfm = tfm.eval()
    missing, unexpected = ref_model.load_state_dict(
        tfm.state_dict(), strict=False)
    assert not missing, f"mirror state_dict missing keys: {missing[:8]}"
    assert not unexpected, f"unexpected keys: {unexpected[:8]}"

    B, T, U = 2, 12, 6
    src = torch.randn(B, T, dims.input_size)
    tgt = torch.randint(3, dims.vocab, (B, U))
    wav_len = torch.tensor([1.0, 0.7])
    with torch.no_grad():
        ref_enc, ref_dec = ref_model(src, tgt, wav_len, pad_idx=0)
        our_enc, our_dec = tfm(src, tgt, wav_len, pad_idx=0)
    torch.testing.assert_close(our_enc, ref_enc, rtol=1e-4, atol=1e-5)
    torch.testing.assert_close(our_dec, ref_dec, rtol=1e-4, atol=1e-5)
