"""Reference-checkpoint weight import + forward parity.

Builds a torch oracle with the reference architecture and the exact SB
state_dict naming (ModuleList[CNN, Transformer, seq_lin, ctc_lin];
``0.convblock_0.convs.conv_0.conv.weight``,
``1.encoder.layers.0.self_att.att.in_proj_weight``,
``1.decoder.layers.0.mutihead_attn…``, ``2.w.weight`` …), randomly
initializes it, imports the state_dict through
``stac_st_tpu.interop.sb_import``, and asserts forward parity of the full
pipeline (conv frontend → encoder → decoder → seq/ctc heads) to atol 1e-4.

The oracle reimplements the SB forward semantics the reference relies on
(``TransformerMultiTask.py:144-209``): SB Conv2d's (B,T,F,C)→(B,C,F,T)
transpose with symmetric k//2 padding, LayerNorm over trailing (F,C),
pre-LN transformer with eps=1e-6 norms and final encoder/decoder norm,
NormalizedEmbedding × sqrt(d), sinusoidal PE, round-based padding masks.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from stac_st_tpu.interop.sb_import import (
    import_model_state_dict,
    import_normalizer_dict,
)

# ---- small preset dims ----
D_MODEL, NHEAD, N_ENC, N_DEC, D_FFN = 32, 4, 2, 2, 64
VOCAB, N_MELS, CH = 50, 16, 8  # F'=4 after two stride-2 blocks; input 4*8=32
INPUT_SIZE = (N_MELS // 4) * CH


# --------------------------------------------------------------------------
# torch oracle, SB-named
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
    def __init__(self):
        super().__init__()
        self.add_module(
            "convblock_0", SBConvBlock(1, CH, 3, 2, (N_MELS // 2, CH))
        )
        self.add_module(
            "convblock_1", SBConvBlock(CH, CH, 3, 2, (N_MELS // 4, CH))
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
    def __init__(self):
        super().__init__()
        self.layers = tnn.ModuleList(
            SBEncoderLayer(D_MODEL, NHEAD, D_FFN) for _ in range(N_ENC)
        )
        self.norm = SBLayerNorm(D_MODEL, eps=1e-6)

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
    def __init__(self):
        super().__init__()
        self.layers = tnn.ModuleList(
            SBDecoderLayer(D_MODEL, NHEAD, D_FFN) for _ in range(N_DEC)
        )
        self.norm = SBLayerNorm(D_MODEL, eps=1e-6)

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


def _sinusoid(max_len, d):
    pos = torch.arange(max_len, dtype=torch.float64)[:, None]
    i = torch.arange(0, d, 2, dtype=torch.float64)[None, :]
    denom = torch.pow(10000.0, i / d)
    pe = torch.zeros(max_len, d, dtype=torch.float64)
    pe[:, 0::2] = torch.sin(pos / denom)
    pe[:, 1::2] = torch.cos(pos / denom)
    return pe.float()


class SBTransformerMultiTask(tnn.Module):
    def __init__(self):
        super().__init__()
        self.custom_src_module = tnn.Sequential(
            SBLinear(INPUT_SIZE, D_MODEL), tnn.Dropout(0.0)
        )
        self.custom_tgt_module = tnn.Sequential(
            SBNormalizedEmbedding(D_MODEL, VOCAB)
        )
        self.encoder = SBEncoder()
        self.decoder = SBDecoder()
        self.pe = _sinusoid(512, D_MODEL)

    def forward(self, src, tgt, wav_len=None, pad_idx=0):
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


def _build_oracle(seed=0):
    torch.manual_seed(seed)
    cnn = SBConvFrontEnd()
    tfm = SBTransformerMultiTask()
    seq_lin = SBLinear(D_MODEL, VOCAB)
    ctc_lin = SBLinear(D_MODEL, VOCAB)
    model = tnn.ModuleList([cnn, tfm, seq_lin, ctc_lin]).eval()
    for p in model.parameters():  # mimic reference _init_params + rand biases
        if p.dim() > 1:
            tnn.init.xavier_normal_(p)
        else:
            with torch.no_grad():
                p.uniform_(-0.1, 0.1)
    return model


def _build_mine():
    from stac_st_tpu.models.frontend import ConvolutionFrontEnd
    from stac_st_tpu.models.multitask import LinearHead, TransformerMultiTask

    cnn = ConvolutionFrontEnd(
        num_blocks=2, out_channels=(CH, CH), kernel_sizes=(3, 3),
        strides=(2, 2), residuals=(False, False), dropout=0.0,
    )
    tfm = TransformerMultiTask(
        tgt_vocab=VOCAB, input_size=INPUT_SIZE, d_model=D_MODEL,
        nhead=NHEAD, num_encoder_layers=N_ENC, num_decoder_layers=N_DEC,
        d_ffn=D_FFN, dropout=0.0, normalize_before=True, causal=False,
        max_length=512,
    )
    seq_lin = LinearHead(input_size=D_MODEL, n_neurons=VOCAB)
    ctc_lin = LinearHead(input_size=D_MODEL, n_neurons=VOCAB)
    return cnn, tfm, seq_lin, ctc_lin


@pytest.fixture(scope="module")
def imported():
    model = _build_oracle()
    params = import_model_state_dict(model.state_dict())
    return model, params


def test_import_covers_all_parameters(imported):
    model, params = imported
    n_torch = sum(p.numel() for p in model.parameters())
    import jax

    n_flax = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params)
    )
    assert n_torch == n_flax


def test_frontend_parity(imported):
    model, params = imported
    cnn, *_ = _build_mine()
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((3, 17, N_MELS)).astype(np.float32)

    with torch.no_grad():
        expected = model[0](torch.from_numpy(feats)).numpy()
    got = np.asarray(cnn.apply(params["CNN"], jnp.asarray(feats)))
    assert expected.shape == got.shape
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_full_forward_parity(imported):
    model, params = imported
    cnn, tfm, seq_lin, ctc_lin = _build_mine()
    rng = np.random.default_rng(1)
    B, T_in, T_tgt = 3, 21, 7
    feats = rng.standard_normal((B, T_in, N_MELS)).astype(np.float32)
    tgt = rng.integers(1, VOCAB, size=(B, T_tgt)).astype(np.int64)
    tgt[-1, -2:] = 0  # padding
    wav_len = np.asarray([1.0, 0.8, 0.55], np.float32)

    with torch.no_grad():
        src_t = model[0](torch.from_numpy(feats))
        enc_t, dec_t = model[1](
            src_t, torch.from_numpy(tgt), torch.from_numpy(wav_len)
        )
        seq_t = model[2](dec_t).numpy()
        ctc_t = model[3](enc_t).numpy()

    src_j = cnn.apply(params["CNN"], jnp.asarray(feats))
    enc_j, dec_j = tfm.apply(
        params["Transformer"], src_j, jnp.asarray(tgt),
        jnp.asarray(wav_len),
    )
    seq_j = np.asarray(seq_lin.apply(params["seq_lin"], dec_j))
    ctc_j = np.asarray(ctc_lin.apply(params["ctc_lin"], enc_j))

    # compare valid (unpadded) region; padded positions are don't-care
    S = enc_j.shape[1]
    valid_s = np.round(wav_len * S).astype(int)
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(enc_j)[b, : valid_s[b]],
            enc_t.numpy()[b, : valid_s[b]], atol=1e-4,
        )
        np.testing.assert_allclose(ctc_j[b, : valid_s[b]],
                                   ctc_t[b, : valid_s[b]], atol=1e-4)
    np.testing.assert_allclose(seq_j[:, :-2], seq_t[:, :-2], atol=1e-4)


def test_decode_path_parity_after_import(imported):
    """Imported weights drive my KV-cached decode_step == oracle decode."""
    model, params = imported
    _, tfm, seq_lin, _ = _build_mine()
    rng = np.random.default_rng(2)
    B, S = 2, 9
    enc = rng.standard_normal((B, S, D_MODEL)).astype(np.float32)
    tgt = rng.integers(1, VOCAB, size=(B, 5)).astype(np.int64)

    with torch.no_grad():
        T = tgt.shape[1]
        tgt_mask = torch.triu(torch.ones(T, T, dtype=torch.bool), 1)
        d = model[1].custom_tgt_module(torch.from_numpy(tgt)) + \
            model[1].pe[None, :T]
        dec_t = model[1].decoder(
            d, torch.from_numpy(enc), tgt_mask, None, None
        ).numpy()

    dec_j, _ = tfm.apply(
        params["Transformer"], jnp.asarray(tgt), jnp.asarray(enc),
        method="decode",
    )
    np.testing.assert_allclose(np.asarray(dec_j), dec_t, atol=1e-4)


def test_normalizer_import():
    stats = {
        "glob_mean": torch.arange(N_MELS, dtype=torch.float32),
        "glob_std": torch.ones(N_MELS) * 2.0,
        "count": torch.tensor(1234.0),
    }
    st = import_normalizer_dict(stats)
    np.testing.assert_allclose(np.asarray(st.mean), np.arange(N_MELS))
    np.testing.assert_allclose(np.asarray(st.std), 2.0)
    assert float(st.count) == 1234.0


def test_unmapped_parameter_raises(imported):
    model, _ = imported
    sd = dict(model.state_dict())
    sd["1.encoder.layers.0.bogus.weight"] = torch.zeros(3, 3)
    with pytest.raises(ValueError, match="unmapped"):
        import_model_state_dict(sd)
