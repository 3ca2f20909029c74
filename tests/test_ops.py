"""Numerical tests for device ops against reference formulas."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stac_st_tpu.ops import (
    CmvnState,
    Fbank,
    cmvn_apply,
    cmvn_init,
    cmvn_update,
    ctc_loss,
    length_mask,
    lookahead_mask,
    nll_loss,
    spec_augment,
    src_key_padding_mask,
    tgt_key_padding_mask,
)
from stac_st_tpu.ops.speed_perturb import SpeedPerturb


class TestFbank:
    def test_stft_matches_torch(self, rng):
        """DFT-matmul STFT == torch.stft (the SB Fbank core)."""
        torch = pytest.importorskip("torch")
        wav = rng.standard_normal(16000).astype(np.float32)
        fb = Fbank(log_mel=False)
        ours = np.asarray(fb(wav[None, :]))  # (1, T, 80) mel power

        t_wav = torch.tensor(wav)
        window = torch.hamming_window(400)
        stft = torch.stft(
            t_wav, n_fft=400, hop_length=160, win_length=400, window=window,
            center=True, pad_mode="constant", return_complex=True,
        )
        power = (stft.real ** 2 + stft.imag ** 2).numpy()  # (201, T)
        from stac_st_tpu.ops.fbank import mel_filterbank

        mel = mel_filterbank(80, 400, 16000)
        ref = power.T @ mel  # (T, 80)
        assert ours.shape[1] == ref.shape[0]
        np.testing.assert_allclose(ours[0], ref, rtol=1e-3, atol=1e-2)

    def test_frame_count_contract(self):
        fb = Fbank()
        for sec in (1.0, 2.5, 7.3):
            n = int(16000 * sec)
            out = fb(np.zeros((2, n), np.float32))
            assert out.shape == (2, 1 + n // 160, 80)

    def test_log_clamp(self, rng):
        fb = Fbank()
        out = np.asarray(fb(rng.standard_normal((1, 8000)).astype(np.float32)))
        assert out.max() - out.min() <= 80.0 + 1e-3


class TestCmvn:
    def test_running_mean_of_utterance_stats(self, rng):
        """Closed-form batch update == reference per-utterance recursion."""
        D = 8
        state = cmvn_init(D)
        feats1 = rng.standard_normal((4, 20, D)).astype(np.float32)
        lens = np.ones(4, np.float32)
        state = cmvn_update(state, jnp.asarray(feats1), jnp.asarray(lens))
        # reference recursion: running arithmetic mean over utterances
        means = feats1.mean(axis=1)
        np.testing.assert_allclose(
            np.asarray(state.mean), means.mean(0), rtol=1e-5, atol=1e-5
        )
        assert float(state.count) == 4.0

        feats2 = rng.standard_normal((2, 20, D)).astype(np.float32)
        state = cmvn_update(
            state, jnp.asarray(feats2), jnp.asarray(np.ones(2, np.float32))
        )
        all_means = np.concatenate([means, feats2.mean(axis=1)])
        np.testing.assert_allclose(
            np.asarray(state.mean), all_means.mean(0), rtol=1e-5, atol=1e-5
        )

    def test_masked_lengths(self, rng):
        D = 4
        feats = np.zeros((1, 10, D), np.float32)
        feats[0, :5] = 3.0
        feats[0, 5:] = 999.0  # padding must not contribute
        state = cmvn_update(
            cmvn_init(D), jnp.asarray(feats), jnp.asarray([0.5], np.float32)
        )
        np.testing.assert_allclose(np.asarray(state.mean), 3.0, atol=1e-5)

    def test_apply_normalizes(self, rng):
        D = 6
        feats = rng.standard_normal((3, 15, D)).astype(np.float32) * 5 + 2
        state = cmvn_update(
            cmvn_init(D), jnp.asarray(feats),
            jnp.asarray(np.ones(3, np.float32)),
        )
        out = np.asarray(cmvn_apply(state, jnp.asarray(feats)))
        assert abs(out.mean()) < 0.5


class TestLosses:
    def test_nll_matches_manual(self, rng):
        B, T, C = 3, 5, 10
        logits = rng.standard_normal((B, T, C)).astype(np.float32)
        logp = jax.nn.log_softmax(jnp.asarray(logits))
        tgt = rng.integers(0, C, (B, T))
        lens = np.array([1.0, 0.6, 0.8], np.float32)
        loss = nll_loss(logp, jnp.asarray(tgt), jnp.asarray(lens),
                        reduction="batchmean")
        # manual
        mask = np.asarray(length_mask(lens, T))
        picked = np.take_along_axis(np.asarray(logp), tgt[..., None], -1)[..., 0]
        ref = -(picked * mask).sum() / B
        np.testing.assert_allclose(float(loss), ref, rtol=1e-5)

    def test_label_smoothing_direction(self, rng):
        B, T, C = 2, 4, 8
        logp = jax.nn.log_softmax(
            jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
        )
        tgt = jnp.asarray(rng.integers(0, C, (B, T)))
        l0 = nll_loss(logp, tgt, reduction="mean")
        l1 = nll_loss(logp, tgt, label_smoothing=0.1, reduction="mean")
        assert float(l0) != float(l1)

    def test_ctc_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        B, T, C, U = 2, 30, 12, 8
        logits = rng.standard_normal((B, T, C)).astype(np.float32)
        logp = jax.nn.log_softmax(jnp.asarray(logits))
        targets = rng.integers(1, C, (B, U))
        in_lens = np.array([1.0, 0.8], np.float32)
        tgt_lens = np.array([1.0, 0.75], np.float32)

        ours = float(ctc_loss(logp, jnp.asarray(targets),
                              jnp.asarray(in_lens), jnp.asarray(tgt_lens),
                              blank_index=0, reduction="batchmean"))

        t_logp = torch.log_softmax(torch.tensor(logits), dim=-1)
        abs_in = torch.tensor(np.round(in_lens * T), dtype=torch.long)
        abs_tgt = torch.tensor(np.round(tgt_lens * U), dtype=torch.long)
        ref = torch.nn.functional.ctc_loss(
            t_logp.transpose(0, 1), torch.tensor(targets), abs_in, abs_tgt,
            blank=0, reduction="sum", zero_infinity=True,
        ) / B
        np.testing.assert_allclose(ours, float(ref), rtol=1e-4)


class TestMasks:
    def test_src_padding_round(self):
        m = np.asarray(src_key_padding_mask(jnp.asarray([1.0, 0.5]), 10))
        assert (~m[0]).sum() == 10
        assert (~m[1]).sum() == 5

    def test_lookahead(self):
        m = np.asarray(lookahead_mask(4))
        assert not m[3, 3] and m[0, 1] and not m[1, 0]

    def test_tgt_padding(self):
        m = np.asarray(tgt_key_padding_mask(jnp.asarray([[5, 3, 0, 0]]), 0))
        assert list(m[0]) == [False, False, True, True]


class TestSpecAugment:
    def test_bicubic_warp_matches_torch(self, rng):
        """_warp_to == the reference's F.interpolate(bicubic, align_corners)
        applied per segment (speechbrain SpecAugment.time_warp semantics)."""
        torch = pytest.importorskip("torch")
        from stac_st_tpu.ops.specaugment import _warp_to

        B, T, D = 3, 57, 13
        feats = rng.standard_normal((B, T, D)).astype(np.float32)
        for c, w in [(17, 21), (17, 13), (5, 6), (50, 45), (28, 28)]:
            ours = np.asarray(
                _warp_to(jnp.asarray(feats), jnp.asarray(c), jnp.asarray(w),
                         "bicubic")
            )
            x = torch.from_numpy(feats).unsqueeze(1)  # (B,1,T,D)
            left = torch.nn.functional.interpolate(
                x[:, :, :c], (w, D), mode="bicubic", align_corners=True)
            right = torch.nn.functional.interpolate(
                x[:, :, c:], (T - w, D), mode="bicubic", align_corners=True)
            ref = torch.cat([left, right], dim=2).squeeze(1).numpy()
            np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5,
                                       err_msg=f"c={c} w={w}")

    def test_linear_warp_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        from stac_st_tpu.ops.specaugment import _warp_to

        B, T, D = 2, 41, 9
        feats = rng.standard_normal((B, T, D)).astype(np.float32)
        c, w = 15, 19
        ours = np.asarray(
            _warp_to(jnp.asarray(feats), jnp.asarray(c), jnp.asarray(w),
                     "bilinear")
        )
        x = torch.from_numpy(feats).unsqueeze(1)
        left = torch.nn.functional.interpolate(
            x[:, :, :c], (w, D), mode="bilinear", align_corners=True)
        right = torch.nn.functional.interpolate(
            x[:, :, c:], (T - w, D), mode="bilinear", align_corners=True)
        ref = torch.cat([left, right], dim=2).squeeze(1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)

    def test_shapes_and_masking(self, rng):
        feats = jnp.asarray(rng.standard_normal((2, 100, 80)).astype(np.float32))
        out = spec_augment(feats, jax.random.PRNGKey(0))
        assert out.shape == feats.shape
        assert not np.allclose(np.asarray(out), np.asarray(feats))

    def test_deterministic_per_key(self, rng):
        feats = jnp.asarray(rng.standard_normal((1, 60, 80)).astype(np.float32))
        a = spec_augment(feats, jax.random.PRNGKey(7))
        b = spec_augment(feats, jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSpeedPerturb:
    def test_seeded_from_global_seed(self, rng):
        """Two instances built under the same global seed draw the same
        speed sequence (reference: speeds come from the torch global RNG,
        seeded by the yaml's manual_seed) — training runs are reproducible."""
        from stac_st_tpu.utils.seeding import manual_seed

        wav = rng.standard_normal(8000).astype(np.float32)
        manual_seed(1234)
        a = SpeedPerturb(16000, [90, 100, 110])
        lens_a = [len(a(wav)) for _ in range(8)]
        manual_seed(1234)
        b = SpeedPerturb(16000, [90, 100, 110])
        lens_b = [len(b(wav)) for _ in range(8)]
        assert lens_a == lens_b
        assert len(set(lens_a)) > 1  # actually perturbs

    def test_lengths(self, rng):
        sp = SpeedPerturb(16000, [90, 100, 110])
        wav = rng.standard_normal(16000).astype(np.float32)
        assert len(sp(wav, speed=100)) == 16000
        assert abs(len(sp(wav, speed=90)) - 16000 * 100 / 90) < 3
        assert abs(len(sp(wav, speed=110)) - 16000 * 100 / 110) < 3


class TestMeshPaddingNeutrality:
    def test_zero_length_rows_contribute_nothing(self, rng):
        """Rows added by pad_batch_rows (mesh divisibility) carry zero
        relative lengths and must contribute exactly zero loss."""
        B, T, C, U = 3, 20, 10, 8
        logp = jax.nn.log_softmax(
            jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
        )
        tokens = jnp.asarray(rng.integers(1, C, (B, U)))
        in_lens = jnp.asarray([1.0, 0.8, 0.0])
        tgt_lens = jnp.asarray([1.0, 0.5, 0.0])
        full = ctc_loss(logp, tokens, in_lens, tgt_lens, 0, "batchmean")
        ref = ctc_loss(logp[:2], tokens[:2], in_lens[:2], tgt_lens[:2], 0,
                       "batchmean")
        assert np.isfinite(float(full))
        # batchmean: padded row only changes the divisor, adds no mass
        np.testing.assert_allclose(float(full) * B, float(ref) * 2, atol=1e-4)

        tgt_full = jnp.asarray(rng.integers(1, C, (B, T)))
        nll = nll_loss(logp, tgt_full, jnp.asarray([1.0, 0.5, 0.0]),
                       reduction="batchmean")
        nll_ref = nll_loss(logp[:2], tgt_full[:2], jnp.asarray([1.0, 0.5]),
                           reduction="batchmean")
        np.testing.assert_allclose(
            float(nll) * B, float(nll_ref) * 2, rtol=1e-5
        )


class TestDeviceSpeedPerturb:
    def test_matches_host_resample_per_row(self, rng):
        from stac_st_tpu.ops.speed_perturb import (
            DeviceSpeedPerturb,
            device_resample,
        )
        from stac_st_tpu.data.resample import fast_resample_poly

        x = rng.standard_normal((2, 8000)).astype(np.float32)
        for s in (90, 100, 110):
            import math

            g = math.gcd(100, s)
            n_out = 8000 * (100 // g) // (s // g)
            n_out += bool((8000 * (100 // g)) % (s // g))
            y = np.asarray(device_resample(jnp.asarray(x), 100, s, n_out))
            for b in range(2):
                ref = fast_resample_poly(x[b], 100, s)
                np.testing.assert_allclose(
                    y[b, : len(ref)], ref, atol=1e-4
                )

    def test_apply_selects_per_row_and_rescales_lengths(self, rng):
        from stac_st_tpu.ops.speed_perturb import DeviceSpeedPerturb
        from stac_st_tpu.data.resample import fast_resample_poly

        sp = DeviceSpeedPerturb(16000, [90, 100, 110])
        W = 8000
        sig = rng.standard_normal((3, W)).astype(np.float32)
        lens = np.asarray([1.0, 0.5, 0.75], np.float32)
        idx = np.asarray([0, 1, 2], np.int32)  # 90, 100, 110
        out, new_lens = sp.apply(
            jnp.asarray(sig), jnp.asarray(lens), jnp.asarray(idx)
        )
        W_out = sp.out_width(W)
        assert out.shape == (3, W_out)
        # row 0: 90% speed -> longer content
        ref0 = fast_resample_poly(sig[0], 100, 90)
        np.testing.assert_allclose(
            np.asarray(out)[0, : len(ref0)], ref0, atol=1e-4
        )
        # row 1: identity content, padded
        np.testing.assert_allclose(np.asarray(out)[1, :W], sig[1], atol=1e-5)
        # lengths: content_samples * (100/speed) / W_out
        expect = [
            min(1.0, 1.0 * W * (100 / 90) / W_out),
            0.5 * W / W_out,
            0.75 * W * (100 / 110) / W_out,
        ]
        np.testing.assert_allclose(np.asarray(new_lens), expect, rtol=1e-5)

    def test_train_step_with_device_speed(self, rng):
        """Full jitted train step with on-device perturbation: runs, loss
        finite, and the speed column actually changes the features."""
        import jax

        from stac_st_tpu.models import (
            ConvolutionFrontEnd,
            LinearHead,
            TransformerMultiTask,
        )
        from stac_st_tpu.ops import Fbank
        from stac_st_tpu.ops.speed_perturb import DeviceSpeedPerturb
        from stac_st_tpu.training.optim import AdamW
        from stac_st_tpu.training.step import (
            StepConfig,
            _forward,
            init_train_state,
            make_optimizer,
            make_train_step,
        )

        vocab, ch, d = 50, 8, 32
        cfg = StepConfig(
            fbank=Fbank(),
            cnn=ConvolutionFrontEnd(out_channels=(ch, ch)),
            transformer=TransformerMultiTask(
                tgt_vocab=vocab, input_size=20 * ch, d_model=d, nhead=4,
                num_encoder_layers=1, num_decoder_layers=1, d_ffn=64,
                dropout=0.0, normalize_before=True,
            ),
            seq_lin=LinearHead(input_size=d, n_neurons=vocab),
            ctc_lin=LinearHead(input_size=d, n_neurons=vocab),
            specaug_opts=None, ctc_weight=0.3, label_smoothing=0.1,
            loss_reduction="batchmean", pad_index=0, blank_index=0,
            device_speed=DeviceSpeedPerturb(16000, [90, 100, 110]),
        )
        tx = make_optimizer(AdamW(lr=1e-3), lambda s: 1e-3)
        B, L, U = 2, 4000, 8
        batch = {
            "sig": jnp.asarray(rng.standard_normal((B, L)), jnp.float32),
            "sig_len": jnp.ones((B,), jnp.float32),
            "tokens": jnp.asarray(rng.integers(3, vocab, (B, U)), jnp.int32),
            "tokens_len": jnp.full((B,), 0.8, jnp.float32),
            "tokens_bos": jnp.asarray(
                rng.integers(3, vocab, (B, U)), jnp.int32
            ),
            "tokens_eos": jnp.asarray(
                rng.integers(3, vocab, (B, U)), jnp.int32
            ),
            "tokens_eos_len": jnp.full((B,), 0.8, jnp.float32),
            "speed_idx": jnp.asarray([0, 2], jnp.int32),
        }
        state = init_train_state(cfg, tx, jax.random.PRNGKey(0), batch)
        step = make_train_step(cfg, tx)
        state, metrics = step(state, batch, jax.random.PRNGKey(1),
                              update_cmvn=True)
        assert np.isfinite(float(metrics["loss"]))
        # different speeds -> different forward outputs
        b2 = dict(batch, speed_idx=jnp.asarray([1, 1], jnp.int32))
        p1, *_ = _forward(state.params, state.cmvn, batch, cfg, True,
                          False, jax.random.PRNGKey(2))
        p2, *_ = _forward(state.params, state.cmvn, b2, cfg, True,
                          False, jax.random.PRNGKey(2))
        assert not np.allclose(np.asarray(p1), np.asarray(p2))
