"""Reference-faithful torch oracle of the SB/reference stack (test-only).

One shared implementation of the reference architecture with the exact SB
state_dict naming, plus the recipe-level pieces needed for end-to-end
differential testing against the TPU stack:

* model modules (``ModuleList[CNN, Transformer, seq_lin, ctc_lin]``) with
  ``forward`` (train semantics, round-based padding — reference
  ``TransformerMultiTask.py:144-209``), ``encode`` (inference semantics,
  floor-based padding — ``TransformerMultiTask.py:273-309``) and ``decode``
  (no cross padding mask — ``TransformerMultiTask.py:235-271``);
* ``torch_fbank`` — SB ``Fbank`` via ``torch.stft`` (hamming window,
  power spectrum, mel projection, amplitude_to_DB with top_db clamp);
* ``SBBeamSearcher`` — SpeechBrain's ``S2SBeamSearcher`` loop with the
  reference's multitask prompt seeding
  (``stac-st/modules/mutitask_decoder.py``): full-prefix re-decode each
  step, temperature before log-softmax, eos-threshold gating, length
  normalization, min/max decode ratios, forced-eos finalization.

Used by ``test_weight_import.py`` (module-level parity) and
``test_full_recipe_oracle.py`` (whole-recipe differential gate).
"""

import math
from dataclasses import dataclass

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F


@dataclass(frozen=True)
class OracleDims:
    d_model: int = 32
    nhead: int = 4
    n_enc: int = 2
    n_dec: int = 2
    d_ffn: int = 64
    vocab: int = 50
    n_mels: int = 16
    ch: int = 8
    max_len: int = 512

    @property
    def input_size(self):
        return (self.n_mels // 4) * self.ch


# --------------------------------------------------------------------------
# torch modules, SB-named
# --------------------------------------------------------------------------
class SBLinear(tnn.Module):
    def __init__(self, n_in, n_out, bias=True):
        super().__init__()
        self.w = tnn.Linear(n_in, n_out, bias=bias)

    def forward(self, x):
        return self.w(x)


class SBLayerNorm(tnn.Module):
    def __init__(self, shape, eps=1e-5):
        super().__init__()
        self.norm = tnn.LayerNorm(shape, eps=eps)

    def forward(self, x):
        return self.norm(x)


class SBConv2d(tnn.Module):
    """SB nnet.CNN.Conv2d: (B,T,F,C) -> transpose -> (B,C,F,T), symmetric
    k//2 'same' padding, nn.Conv2d, transpose back."""

    def __init__(self, in_ch, out_ch, k, stride):
        super().__init__()
        self.conv = tnn.Conv2d(in_ch, out_ch, k, stride)
        self.k = k

    def forward(self, x):  # (B, T, F, C)
        unsqueeze = x.ndim == 3
        x = x.transpose(1, -1)  # (B, C, F, T) / (B, F, T)
        if unsqueeze:
            x = x.unsqueeze(1)
        p = self.k // 2
        x = F.pad(x, (p, p, p, p))
        x = self.conv(x)
        return x.transpose(1, -1)  # (B, T', F', C')


class SBConvBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, k, stride, norm_shape):
        super().__init__()
        self.convs = tnn.Module()
        self.convs.add_module("conv_0", SBConv2d(in_ch, out_ch, k, stride))
        self.convs.add_module("norm_0", SBLayerNorm(norm_shape))
        self.act = tnn.LeakyReLU()

    def forward(self, x):
        x = self.convs.conv_0(x)
        x = self.convs.norm_0(x)
        return self.act(x)


class SBConvFrontEnd(tnn.Module):
    def __init__(self, dims: OracleDims):
        super().__init__()
        self.add_module(
            "convblock_0",
            SBConvBlock(1, dims.ch, 3, 2, (dims.n_mels // 2, dims.ch)),
        )
        self.add_module(
            "convblock_1",
            SBConvBlock(dims.ch, dims.ch, 3, 2, (dims.n_mels // 4, dims.ch)),
        )

    def forward(self, x):  # (B, T, F)
        x = self.convblock_0(x)
        return self.convblock_1(x)


class SBMHA(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.att = tnn.MultiheadAttention(d, h, batch_first=True)

    def forward(self, q, k, v, attn_mask=None, key_padding_mask=None):
        out, _ = self.att(
            q, k, v, attn_mask=attn_mask,
            key_padding_mask=key_padding_mask, need_weights=False,
        )
        return out


class SBFFN(tnn.Module):
    def __init__(self, d, d_ffn):
        super().__init__()
        self.ffn = tnn.Sequential(
            tnn.Linear(d, d_ffn), tnn.GELU(), tnn.Dropout(0.0),
            tnn.Linear(d_ffn, d),
        )

    def forward(self, x):
        return self.ffn(x)


class SBEncoderLayer(tnn.Module):
    def __init__(self, d, h, d_ffn):
        super().__init__()
        self.self_att = SBMHA(d, h)
        self.pos_ffn = SBFFN(d, d_ffn)
        self.norm1 = SBLayerNorm(d, eps=1e-6)
        self.norm2 = SBLayerNorm(d, eps=1e-6)

    def forward(self, x, key_padding_mask=None):  # pre-LN
        h = self.norm1(x)
        x = x + self.self_att(h, h, h, key_padding_mask=key_padding_mask)
        x = x + self.pos_ffn(self.norm2(x))
        return x


class SBEncoder(tnn.Module):
    def __init__(self, dims: OracleDims):
        super().__init__()
        self.layers = tnn.ModuleList(
            SBEncoderLayer(dims.d_model, dims.nhead, dims.d_ffn)
            for _ in range(dims.n_enc)
        )
        self.norm = SBLayerNorm(dims.d_model, eps=1e-6)

    def forward(self, x, key_padding_mask=None):
        for layer in self.layers:
            x = layer(x, key_padding_mask)
        return self.norm(x)


class SBDecoderLayer(tnn.Module):
    def __init__(self, d, h, d_ffn):
        super().__init__()
        self.self_attn = SBMHA(d, h)
        self.mutihead_attn = SBMHA(d, h)  # SB's historical spelling
        self.pos_ffn = SBFFN(d, d_ffn)
        self.norm1 = SBLayerNorm(d, eps=1e-6)
        self.norm2 = SBLayerNorm(d, eps=1e-6)
        self.norm3 = SBLayerNorm(d, eps=1e-6)

    def forward(self, x, memory, tgt_mask, tgt_kpm, mem_kpm):
        h = self.norm1(x)
        x = x + self.self_attn(
            h, h, h, attn_mask=tgt_mask, key_padding_mask=tgt_kpm
        )
        h = self.norm2(x)
        x = x + self.mutihead_attn(
            h, memory, memory, key_padding_mask=mem_kpm
        )
        x = x + self.pos_ffn(self.norm3(x))
        return x


class SBDecoder(tnn.Module):
    def __init__(self, dims: OracleDims):
        super().__init__()
        self.layers = tnn.ModuleList(
            SBDecoderLayer(dims.d_model, dims.nhead, dims.d_ffn)
            for _ in range(dims.n_dec)
        )
        self.norm = SBLayerNorm(dims.d_model, eps=1e-6)

    def forward(self, x, memory, tgt_mask, tgt_kpm, mem_kpm):
        for layer in self.layers:
            x = layer(x, memory, tgt_mask, tgt_kpm, mem_kpm)
        return self.norm(x)


class SBNormalizedEmbedding(tnn.Module):
    def __init__(self, d, vocab):
        super().__init__()
        self.emb = tnn.Module()
        self.emb.add_module("Embedding", tnn.Embedding(vocab, d))
        self.d = d

    def forward(self, x):
        return self.emb.Embedding(x) * math.sqrt(self.d)


def sinusoid_pe(max_len, d):
    pos = torch.arange(max_len, dtype=torch.float64)[:, None]
    i = torch.arange(0, d, 2, dtype=torch.float64)[None, :]
    denom = torch.pow(10000.0, i / d)
    pe = torch.zeros(max_len, d, dtype=torch.float64)
    pe[:, 0::2] = torch.sin(pos / denom)
    pe[:, 1::2] = torch.cos(pos / denom)
    return pe.float()


class SBTransformerMultiTask(tnn.Module):
    def __init__(self, dims: OracleDims):
        super().__init__()
        self.dims = dims
        self.custom_src_module = tnn.Sequential(
            SBLinear(dims.input_size, dims.d_model), tnn.Dropout(0.0)
        )
        self.custom_tgt_module = tnn.Sequential(
            SBNormalizedEmbedding(dims.d_model, dims.vocab)
        )
        self.encoder = SBEncoder(dims)
        self.decoder = SBDecoder(dims)
        self.pe = sinusoid_pe(dims.max_len, dims.d_model)

    def forward(self, src, tgt, wav_len=None, pad_idx=0):
        """Train-time forward (round-based padding masks)."""
        if src.ndim == 4:
            b, t, c1, c2 = src.shape
            src = src.reshape(b, t, c1 * c2)
        src_kpm = None
        if wav_len is not None:
            abs_len = torch.round(wav_len * src.shape[1])
            src_kpm = (
                torch.arange(src.shape[1])[None, :] >= abs_len[:, None]
            )
        tgt_kpm = tgt == pad_idx
        T = tgt.shape[1]
        tgt_mask = torch.triu(torch.ones(T, T, dtype=torch.bool), 1)

        src = self.custom_src_module(src) + self.pe[None, : src.shape[1]]
        enc = self.encoder(src, src_kpm)
        d = self.custom_tgt_module(tgt) + self.pe[None, :T]
        dec = self.decoder(d, enc, tgt_mask, tgt_kpm, src_kpm)
        return enc, dec

    def encode(self, src, wav_len=None):
        """Inference encoder pass — the reference's FLOOR-based padding
        mask with strict ``>`` (``TransformerMultiTask.py:289-295``)."""
        if src.ndim == 4:
            b, t, c1, c2 = src.shape
            src = src.reshape(b, t, c1 * c2)
        src_kpm = None
        if wav_len is not None:
            abs_len = torch.floor(wav_len * src.shape[1])
            src_kpm = (
                torch.arange(src.shape[1])[None, :].to(abs_len)
                > abs_len[:, None]
            )
        src = self.custom_src_module(src) + self.pe[None, : src.shape[1]]
        return self.encoder(src, src_kpm)

    def decode(self, tgt, encoder_out, enc_len=None):
        """Decode step: lookahead mask only; NO cross padding mask when
        ``enc_len`` is None — the shipped path
        (``mutitask_decoder.py:126``)."""
        assert enc_len is None, "reference decode path passes no enc_len"
        T = tgt.shape[1]
        tgt_mask = torch.triu(torch.ones(T, T, dtype=torch.bool), 1)
        d = self.custom_tgt_module(tgt) + self.pe[None, :T]
        return self.decoder(d, encoder_out, tgt_mask, None, None)


def build_oracle(dims: OracleDims, seed=0):
    """ModuleList[CNN, Transformer, seq_lin, ctc_lin], randomly initialized
    the way the reference does (_init_params xavier + random biases)."""
    torch.manual_seed(seed)
    cnn = SBConvFrontEnd(dims)
    tfm = SBTransformerMultiTask(dims)
    seq_lin = SBLinear(dims.d_model, dims.vocab)
    ctc_lin = SBLinear(dims.d_model, dims.vocab)
    model = tnn.ModuleList([cnn, tfm, seq_lin, ctc_lin]).eval()
    for p in model.parameters():  # mimic reference _init_params + rand biases
        if p.dim() > 1:
            tnn.init.xavier_normal_(p)
        else:
            with torch.no_grad():
                p.uniform_(-0.1, 0.1)
    return model


# --------------------------------------------------------------------------
# feature extraction (SB Fbank / InputNormalization, eval semantics)
# --------------------------------------------------------------------------
def torch_fbank(wavs, n_mels=80, sample_rate=16000, n_fft=400,
                hop_length=160, win_length=400, top_db=80.0):
    """SB ``Fbank``: torch.stft (hamming, center/constant pad) -> power ->
    mel -> amplitude_to_DB with a GLOBAL top_db clamp over the tensor."""
    from stac_st_tpu.ops.fbank import mel_filterbank

    wavs = torch.as_tensor(np.asarray(wavs), dtype=torch.float32)
    window = torch.hamming_window(win_length)
    stft = torch.stft(
        wavs, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=True, pad_mode="constant",
        return_complex=True,
    )  # (B, n_bins, T)
    power = stft.real ** 2 + stft.imag ** 2
    mel = torch.from_numpy(
        mel_filterbank(n_mels, n_fft, sample_rate).astype(np.float32)
    )
    fb = torch.einsum("bft,fm->btm", power, mel)
    amin = 1e-10
    x_db = 10.0 * torch.log10(torch.clamp(fb, min=amin))
    return torch.clamp(x_db, min=float(x_db.max()) - top_db)


def torch_normalize(feats, mean, std):
    """InputNormalization global stats at eval: (x - mean) / std."""
    mean = torch.as_tensor(np.asarray(mean), dtype=torch.float32)
    std = torch.as_tensor(np.asarray(std), dtype=torch.float32)
    return (feats - mean) / std


# --------------------------------------------------------------------------
# SpeechBrain S2SBeamSearcher (full-prefix decode, multitask prompts)
# --------------------------------------------------------------------------
class SBBeamSearcher:
    """Faithful S2SBeamSearcher loop + the reference's multitask seeding.

    ``reset_mem`` seeds the decoder prefix ``[bos, source_lang,
    target_lang]`` and ``forward_step`` skips appending the first bos
    (``mutitask_decoder.py:95-128``); the searcher then follows
    SpeechBrain's ``S2SBeamSearcher.forward`` step for step: temperature
    applied to logits before log-softmax, optional eos-threshold, optional
    length normalization (selection on score/(t+1), stored scores
    un-normalized, final scores normalized), eos hyps collected per batch
    until ``beam_size`` are found, forced-eos finalization after the step
    budget, best hyp cut at the first eos.
    """

    minus_inf = -1e20

    def __init__(self, model, seq_lin, bos_index=1, eos_index=2,
                 beam_size=5, min_decode_ratio=0.0, max_decode_ratio=1.0,
                 using_eos_threshold=False, eos_threshold=1.5,
                 length_normalization=False, temperature=1.0):
        self.model = model
        self.fc = seq_lin
        self.bos_index = bos_index
        self.eos_index = eos_index
        self.beam_size = beam_size
        self.min_decode_ratio = min_decode_ratio
        self.max_decode_ratio = max_decode_ratio
        self.using_eos_threshold = using_eos_threshold
        self.eos_threshold = eos_threshold
        self.length_normalization = length_normalization
        self.temperature = temperature
        self.decoder_input_tokens = None

    def set_decoder_prefix_tokens(self, source_lang, target_lang):
        self.decoder_input_tokens = [
            self.bos_index, int(source_lang), int(target_lang)
        ]

    # -- searcher internals (S2SBeamSearcher semantics) --------------------
    def _forward_step(self, inp_tokens, memory, enc_states):
        if not torch.all(inp_tokens == self.bos_index):
            memory = torch.cat([memory, inp_tokens[:, None]], dim=-1)
        pred = self.model.decode(memory, enc_states)
        prob_dist = F.log_softmax(self.fc(pred) / self.temperature, dim=-1)
        return prob_dist[:, -1, :], memory

    def _check_eos_threshold(self, log_probs):
        max_probs, _ = torch.max(log_probs, dim=-1)
        eos_probs = log_probs[:, self.eos_index]
        return eos_probs > (self.eos_threshold * max_probs)

    @torch.no_grad()
    def __call__(self, enc_states, wav_len):
        beam = self.beam_size
        batch_size = enc_states.shape[0]
        memory = torch.tensor(
            [self.decoder_input_tokens] * (batch_size * beam),
            dtype=torch.long,
        )
        enc_states = torch.repeat_interleave(enc_states, beam, dim=0)
        inp_tokens = torch.full((batch_size * beam,), self.bos_index,
                                dtype=torch.long)
        beam_offset = torch.arange(batch_size) * beam
        sequence_scores = torch.full((batch_size * beam,), float("-inf"))
        sequence_scores.index_fill_(0, beam_offset, 0.0)
        hyps_and_scores = [[] for _ in range(batch_size)]
        alived_seq = torch.empty(batch_size * beam, 0, dtype=torch.long)

        S = enc_states.shape[1]
        min_decode_steps = int(S * self.min_decode_ratio)
        max_decode_steps = int(S * self.max_decode_ratio)

        def check_full_beams():
            return all(len(h) == beam for h in hyps_and_scores)

        def update_hyps(inp_toks, seqs, scores, t):
            is_eos = inp_toks.eq(self.eos_index)
            for index in torch.nonzero(is_eos, as_tuple=True)[0]:
                index = int(index)
                b = index // beam
                if len(hyps_and_scores[b]) == beam:
                    continue
                hyps_and_scores[b].append(
                    (seqs[index, :].clone(), float(scores[index]))
                )
            return is_eos

        scores = sequence_scores  # for the forced-eos epilogue
        for t in range(max_decode_steps):
            if check_full_beams():
                break
            log_probs, memory = self._forward_step(
                inp_tokens, memory, enc_states
            )
            vocab_size = log_probs.shape[-1]
            if t < min_decode_steps:
                log_probs[:, self.eos_index] = self.minus_inf
            if self.using_eos_threshold:
                cond = self._check_eos_threshold(log_probs)
                log_probs[:, self.eos_index] = torch.where(
                    cond, log_probs[:, self.eos_index],
                    torch.tensor(self.minus_inf),
                )
            scores = sequence_scores.unsqueeze(1) + log_probs
            if self.length_normalization:
                scores = scores / (t + 1)
            scores, candidates = scores.view(batch_size, -1).topk(
                beam, dim=-1
            )
            inp_tokens = (candidates % vocab_size).view(batch_size * beam)
            scores = scores.view(batch_size * beam)
            sequence_scores = scores
            if self.length_normalization:
                sequence_scores = sequence_scores * (t + 1)
            predecessors = (
                torch.div(candidates, vocab_size, rounding_mode="floor")
                + beam_offset.unsqueeze(1).expand_as(candidates)
            ).view(batch_size * beam)
            memory = torch.index_select(memory, 0, predecessors)
            alived_seq = torch.cat([
                torch.index_select(alived_seq, 0, predecessors),
                inp_tokens.unsqueeze(1),
            ], dim=-1)
            is_eos = update_hyps(inp_tokens, alived_seq, scores, t)
            sequence_scores = sequence_scores.masked_fill(
                is_eos, float("-inf")
            )

        if not check_full_beams():
            eos = torch.full((batch_size * beam,), self.eos_index,
                             dtype=torch.long)
            update_hyps(eos, alived_seq, scores, max_decode_steps)

        predictions, top_scores = [], []
        for b in range(batch_size):
            hyps, final = zip(*hyps_and_scores[b])
            best = int(np.argmax(np.asarray(final)))
            hyp = hyps[best].tolist()
            if self.eos_index in hyp:  # cut at first eos
                hyp = hyp[: hyp.index(self.eos_index)]
            predictions.append(hyp)
            top_scores.append(final[best])
        return predictions, top_scores


# --------------------------------------------------------------------------
# training-side mirror (reference fit_batch semantics)
# --------------------------------------------------------------------------
def _round_mask(length, max_len):
    """Round-based length mask (reference ``TransformerMultiTask.py:225``)."""
    abs_len = torch.round(torch.as_tensor(length) * max_len)
    return (torch.arange(max_len)[None, :] < abs_len[:, None]).float()


def sb_nll_loss(log_probs, targets, length=None, label_smoothing=0.0,
                reduction="batchmean"):
    """SpeechBrain ``nnet.losses.nll_loss`` in torch (yaml:260-262):
    masked per-token NLL + label smoothing ``ls*reg + (1-ls)*nll`` where the
    reg term is token-normalized even under batchmean (preserved quirk)."""
    B, T, _ = log_probs.shape
    targets = targets[:, :T].long()
    mask = (
        _round_mask(length, T) if length is not None
        else torch.ones(B, T)
    )
    picked = log_probs.gather(-1, targets.unsqueeze(-1)).squeeze(-1)
    per_token = -picked * mask
    if reduction == "mean":
        nll = per_token.sum() / mask.sum()
    elif reduction == "batchmean":
        nll = per_token.sum() / B
    else:
        raise ValueError(reduction)
    if label_smoothing > 0.0:
        reg = -(log_probs.mean(-1) * mask).sum() / mask.sum()
        return label_smoothing * reg + (1.0 - label_smoothing) * nll
    return nll


def sb_ctc_loss(log_probs, targets, input_lens, target_lens, blank_index=0,
                reduction="batchmean"):
    """SpeechBrain ``nnet.losses.ctc_loss`` (yaml:256-258): relative lens
    rounded to absolute, ``F.ctc_loss`` sum / batch for batchmean."""
    B, T, _ = log_probs.shape
    U = targets.shape[1]
    abs_in = torch.round(torch.as_tensor(input_lens) * T).long()
    abs_tgt = torch.round(torch.as_tensor(target_lens) * U).long()
    loss = F.ctc_loss(
        log_probs.transpose(0, 1), targets.long(), abs_in, abs_tgt,
        blank=blank_index, reduction="sum", zero_infinity=True,
    )
    if reduction == "batchmean":
        return loss / B
    raise ValueError(reduction)


def warm_cool_decay_lr(step, lr, warmup, cooldown, total_steps,
                       decay_factor=0.75, decay_every=100000.0):
    """SB ``WarmCoolDecayLRSchedule`` value at optimizer step ``step``
    (yaml:264-269): linear warmup -> exp decay -> linear cooldown to 0."""
    step = float(step)
    if step < warmup:
        return lr * step / warmup
    cool_start = total_steps - cooldown
    if step < cool_start:
        return lr * decay_factor ** (step / decay_every)
    lr_at_cool = lr * decay_factor ** (cool_start / decay_every)
    return lr_at_cool * max(total_steps - step, 0.0) / cooldown


class TorchTrainMirror:
    """Reference training loop mirror (``train_multitask.py:316-368``,
    non-AMP branch, no augmentation, fixed normalization stats):

    forward (train semantics: round masks, teacher forcing) ->
    ``0.3*CTC + 0.7*NLL(ls=0.1)`` batchmean -> ``(loss/accum).backward()``;
    at ``should_step`` (``step % accum == 0``): ``check_loss_isfinite`` (NO
    gradient clipping — the reference commented out ``check_gradients``,
    :331-332), ``optimizer.step()`` at the CURRENT param-group lr,
    ``zero_grad``, ``optimizer_step += 1``, then the scheduler sets the lr
    for the NEXT attempt from the incremented count (:334-337). The very
    first update therefore runs at the AdamW construction lr (yaml:223-224).
    """

    def __init__(self, model, mean, std, *, n_mels, lr=5e-4,
                 grad_accumulation_factor=1, ctc_weight=0.3,
                 label_smoothing=0.1, pad_index=0, blank_index=0,
                 schedule_kwargs=None):
        self.model = model.train()
        self.cnn, self.tfm, self.seq_lin, self.ctc_lin = model
        self.mean, self.std = mean, std
        self.n_mels = n_mels
        self.opt = torch.optim.AdamW(model.parameters(), lr=lr)
        self.lr = lr
        self.schedule_kwargs = schedule_kwargs
        self.accum = grad_accumulation_factor
        self.ctc_weight = ctc_weight
        self.label_smoothing = label_smoothing
        self.pad_index = pad_index
        self.blank_index = blank_index
        self.step = 0
        self.optimizer_step = 0

    def compute_loss(self, batch):
        wavs = torch.as_tensor(np.asarray(batch["sig"]), dtype=torch.float32)
        wav_lens = torch.as_tensor(np.asarray(batch["sig_len"]),
                                   dtype=torch.float32)
        tokens_bos = torch.as_tensor(np.asarray(batch["tokens_bos"])).long()
        feats = torch_fbank(wavs, n_mels=self.n_mels)
        feats = torch_normalize(feats, self.mean, self.std)
        src = self.cnn(feats)
        enc, dec = self.tfm(src, tokens_bos, wav_lens,
                            pad_idx=self.pad_index)
        p_ctc = F.log_softmax(self.ctc_lin(enc), dim=-1)
        p_seq = F.log_softmax(self.seq_lin(dec), dim=-1)
        att = sb_nll_loss(
            p_seq, torch.as_tensor(np.asarray(batch["tokens_eos"])).long(),
            torch.as_tensor(np.asarray(batch["tokens_eos_len"])),
            label_smoothing=self.label_smoothing, reduction="batchmean",
        )
        ctc = sb_ctc_loss(
            p_ctc, torch.as_tensor(np.asarray(batch["tokens"])).long(),
            wav_lens, torch.as_tensor(np.asarray(batch["tokens_len"])),
            blank_index=self.blank_index, reduction="batchmean",
        )
        return self.ctc_weight * ctc + (1.0 - self.ctc_weight) * att

    def current_lr(self):
        return float(self.opt.param_groups[0]["lr"])

    def fit_batch(self, batch):
        self.step += 1
        should_step = self.step % self.accum == 0
        loss = self.compute_loss(batch)
        (loss / self.accum).backward()
        if should_step:
            if torch.isfinite(loss):
                self.opt.step()
            self.opt.zero_grad()
            self.optimizer_step += 1
            if self.schedule_kwargs is not None:
                new_lr = warm_cool_decay_lr(
                    self.optimizer_step, self.lr, **self.schedule_kwargs
                )
                for pg in self.opt.param_groups:
                    pg["lr"] = new_lr
        return float(loss.detach())
