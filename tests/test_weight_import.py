"""Reference-checkpoint weight import + forward parity.

Builds a torch oracle with the reference architecture and the exact SB
state_dict naming (``tests/sb_oracle.py``), randomly initializes it,
imports the state_dict through ``stac_st_tpu.interop.sb_import``, and
asserts forward parity of the full pipeline (conv frontend -> encoder ->
decoder -> seq/ctc heads) to atol 1e-4.

The oracle reimplements the SB forward semantics the reference relies on
(``TransformerMultiTask.py:144-209``); see ``sb_oracle.py``.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from sb_oracle import OracleDims, build_oracle

from stac_st_tpu.interop.sb_import import (
    import_model_state_dict,
    import_normalizer_dict,
)

# ---- small preset dims ----
D_MODEL, NHEAD, N_ENC, N_DEC, D_FFN = 32, 4, 2, 2, 64
VOCAB, N_MELS, CH = 50, 16, 8  # F'=4 after two stride-2 blocks; input 4*8=32
INPUT_SIZE = (N_MELS // 4) * CH
DIMS = OracleDims(d_model=D_MODEL, nhead=NHEAD, n_enc=N_ENC, n_dec=N_DEC,
                  d_ffn=D_FFN, vocab=VOCAB, n_mels=N_MELS, ch=CH)


def _build_oracle(seed=0):
    return build_oracle(DIMS, seed)


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


def test_save_imported_is_first_class_checkpoint(imported, tmp_path):
    """save_imported must emit the framework's CKPT layout (model.msgpack
    + normalizer.msgpack + meta.json) so recipes/inference.py and
    STEngine.from_experiment consume reference weights with no extra
    wiring (the on-site parity runbook path)."""
    import jax
    import numpy as np

    from stac_st_tpu.interop.sb_import import save_imported
    from stac_st_tpu.ops.cmvn import cmvn_init
    from stac_st_tpu.training.checkpoint import Checkpointer

    model, params = imported
    save_dir = str(tmp_path / "save")
    ckpt_path = save_imported(
        params, save_dir, cmvn=cmvn_init(N_MELS), source="oracle"
    )
    ckpts = Checkpointer(save_dir).list_checkpoints()
    assert len(ckpts) == 1 and ckpts[0].path == ckpt_path
    assert ckpts[0].meta["ACC"] == 1.1  # wins any top-k selection
    assert set(ckpts[0].names()) == {"model", "normalizer"}

    restored = ckpts[0].load("model")
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestExportRoundTrip:
    """sb_export is the exact inverse of sb_import (interop both ways)."""

    def test_export_import_identity(self, imported):
        """import(export(params)) == params, leaf for leaf."""
        import jax

        from stac_st_tpu.interop.sb_export import export_model_state_dict

        _model, params = imported
        sd = export_model_state_dict(params)
        back = import_model_state_dict(sd)
        flat_a, tree_a = jax.tree_util.tree_flatten(params)
        flat_b, tree_b = jax.tree_util.tree_flatten(back)
        assert tree_a == tree_b
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_import_export_matches_oracle_state_dict(self, imported):
        """export(import(sd)) reproduces the SB oracle's state_dict —
        every parameter key present with identical values (buffers like
        .pe are regenerated by the reference and excluded)."""
        from stac_st_tpu.interop.sb_export import export_model_state_dict
        from stac_st_tpu.interop.sb_import import _is_buffer

        model, params = imported
        sd_ref = {k: v.detach().numpy() for k, v in model.state_dict().items()
                  if not _is_buffer(k)}
        sd_out = export_model_state_dict(params)
        assert set(sd_out) == set(sd_ref)
        for k in sd_ref:
            np.testing.assert_array_equal(sd_out[k], sd_ref[k], err_msg=k)

    def test_normalizer_round_trip(self):
        from stac_st_tpu.interop.sb_export import export_normalizer_dict
        from stac_st_tpu.interop.sb_import import import_normalizer_dict
        from stac_st_tpu.ops.cmvn import cmvn_init, cmvn_update

        import jax.numpy as jnp

        state = cmvn_update(
            cmvn_init(N_MELS),
            jnp.ones((2, 5, N_MELS)) * 3.0, jnp.ones((2,)),
        )
        back = import_normalizer_dict(export_normalizer_dict(state))
        np.testing.assert_allclose(np.asarray(back.mean),
                                   np.asarray(state.mean), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(back.std),
                                   np.asarray(state.std), rtol=1e-6)
        assert float(back.count) == float(state.count)

    def test_cli_round_trip(self, imported, tmp_path):
        """export_sb_ckpt.py output loads back through load_sb_experiment."""
        import subprocess
        import sys as _sys

        import jax

        from stac_st_tpu.interop.sb_import import (
            load_sb_experiment,
            save_imported,
        )
        from stac_st_tpu.ops.cmvn import cmvn_init

        _model, params = imported
        save_dir = str(tmp_path / "save")
        ckpt = save_imported(params, save_dir, cmvn=cmvn_init(N_MELS))
        out = str(tmp_path / "sb")
        r = subprocess.run(
            [_sys.executable, "tools/export_sb_ckpt.py", ckpt, out],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 0, r.stderr
        loaded = load_sb_experiment(out)
        flat_a = jax.tree_util.tree_leaves(params)
        flat_b = jax.tree_util.tree_leaves(loaded["params"])
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert loaded["cmvn"] is not None
