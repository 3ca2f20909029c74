"""Pallas kernel parity tests (interpret mode — runs on the CPU mesh)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stac_st_tpu.ops.pallas.attention import flash_attention


def _reference_attention(q, k, v, bias=None):
    Dh = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (Dh ** 0.5)
    if bias is not None:
        logits = logits + bias[:, None, None, :]
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


class TestFlashAttention:
    @pytest.mark.parametrize("B,T,H,Dh", [(2, 64, 4, 64), (1, 200, 2, 64)])
    def test_matches_reference(self, rng, B, T, H, Dh):
        q = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        out = flash_attention(q, k, v, interpret=True)
        ref = _reference_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_padding_bias(self, rng):
        B, T, H, Dh = 2, 96, 2, 64
        q = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, T, H, Dh)).astype(np.float32))
        bias = jnp.where(
            jnp.arange(T)[None, :] < 60, 0.0, -1e9
        ).astype(jnp.float32).repeat(B, axis=0).reshape(B, T)
        out = flash_attention(q, k, v, bias, interpret=True)
        ref = _reference_attention(q, k, v, bias)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


class TestDecodeAttentionKernels:
    def test_self_attention_parity(self, rng):
        from stac_st_tpu.ops.pallas.decode_attention import (
            decode_self_attention,
        )

        BB, H, Dh, S = 6, 4, 64, 40
        q = jnp.asarray(rng.standard_normal((BB, H, Dh)).astype(np.float32))
        kT = jnp.asarray(
            rng.standard_normal((BB, H, Dh, S)).astype(np.float32)
        )
        v = jnp.asarray(rng.standard_normal((BB, H, S, Dh)).astype(np.float32))
        idx = jnp.asarray(17, jnp.int32)
        out = decode_self_attention(q, kT, v, idx, interpret=True)
        # reference
        logits = jnp.einsum("bhd,bhds->bhs", q, kT)
        mask = jnp.where(jnp.arange(S)[None, None, :] > 17, -1e9, 0.0)
        w = jax.nn.softmax(logits + mask, axis=-1)
        ref = jnp.einsum("bhs,bhsd->bhd", w, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_cross_attention_parity_with_beams(self, rng):
        from stac_st_tpu.ops.pallas.decode_attention import (
            decode_cross_attention,
        )

        B, beam, H, Dh, S = 3, 4, 2, 64, 30
        q = jnp.asarray(
            rng.standard_normal((B * beam, H, Dh)).astype(np.float32)
        )
        kT = jnp.asarray(rng.standard_normal((B, H, Dh, S)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, H, S, Dh)).astype(np.float32))
        bias = jnp.where(
            jnp.arange(S)[None, :] < 20, 0.0, -1e9
        ) * jnp.ones((B, S))
        out = decode_cross_attention(q, kT, v, bias, beam, interpret=True)
        qg = q.reshape(B, beam, H, Dh)
        logits = jnp.einsum("bqhd,bhds->bqhs", qg, kT)
        w = jax.nn.softmax(logits + bias[:, None, None, :], axis=-1)
        ref = jnp.einsum("bqhs,bhsd->bqhd", w, v).reshape(B * beam, H, Dh)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_anc_attention_parity(self, rng):
        """Gather-free ancestor-select kernel == explicit-gather oracle."""
        from stac_st_tpu.ops.pallas.decode_attention import (
            decode_self_attention_anc,
        )

        B, beam, H, Dh, S = 2, 3, 2, 64, 24
        BB = B * beam
        q = jnp.asarray(rng.standard_normal((BB, H, Dh)).astype(np.float32))
        k = jnp.asarray(
            rng.standard_normal((BB, H, S, Dh)).astype(np.float32)
        )
        v = jnp.asarray(
            rng.standard_normal((BB, H, S, Dh)).astype(np.float32)
        )
        anc = jnp.asarray(rng.integers(0, beam, (B, beam, S)), jnp.int32)
        idx = jnp.asarray(13, jnp.int32)
        out = decode_self_attention_anc(q, k, v, anc, idx, beam,
                                        interpret=True)
        # oracle: physically gather each beam's ancestral K/V per position
        k5 = np.asarray(k).reshape(B, beam, H, S, Dh)
        v5 = np.asarray(v).reshape(B, beam, H, S, Dh)
        anc_np = np.asarray(anc)
        ref = np.zeros((B, beam, H, Dh), np.float32)
        for b in range(B):
            for r in range(beam):
                kg = np.stack(
                    [k5[b, anc_np[b, r, s], :, s, :] for s in range(S)], 1
                )  # (H, S, Dh)
                vg = np.stack(
                    [v5[b, anc_np[b, r, s], :, s, :] for s in range(S)], 1
                )
                logits = np.einsum(
                    "hd,hsd->hs", np.asarray(q).reshape(B, beam, H, Dh)[b, r],
                    kg,
                )
                logits[:, 14:] = -1e9
                w = np.exp(logits - logits.max(-1, keepdims=True))
                w = w / w.sum(-1, keepdims=True)
                ref[b, r] = np.einsum("hs,hsd->hd", w, vg)
        np.testing.assert_allclose(
            np.asarray(out).reshape(B, beam, H, Dh), ref,
            rtol=2e-4, atol=2e-4,
        )

    def test_beam_search_anc_mode_equals_gather_mode(self, rng):
        """Full searcher in gather-free (anc) mode == physical-gather mode."""
        import stac_st_tpu.ops.pallas as pallas_mod
        from stac_st_tpu.decoding.beam_search import MultiTaskBeamSearch
        from stac_st_tpu.models import LinearHead, TransformerMultiTask

        model = TransformerMultiTask(
            tgt_vocab=40, input_size=16, d_model=64, nhead=2,
            num_encoder_layers=1, num_decoder_layers=2, d_ffn=64,
            dropout=0.0, normalize_before=True,
        )
        head = LinearHead(input_size=64, n_neurons=40)
        src = jnp.asarray(rng.standard_normal((2, 12, 16)).astype(np.float32))
        tgt = jnp.asarray(rng.integers(1, 40, (2, 5)))
        params = model.init(jax.random.PRNGKey(0), src, tgt)
        enc = model.apply(params, src, method=model.encode)
        hp = head.init(jax.random.PRNGKey(1), enc)

        def run():
            s = MultiTaskBeamSearch(
                [model, head, None], bos_index=1, eos_index=2,
                min_decode_ratio=0.0, max_decode_ratio=1.0, beam_size=3,
                using_eos_threshold=True, length_normalization=True,
                temperature=1.2,
            )
            s.bind(params, hp)
            s.set_decoder_prefix_tokens(3, 4)
            return s(enc)

        base_hyps, base_scores = run()
        try:
            pallas_mod.enable(interpret=True)
            anc_hyps, anc_scores = run()
        finally:
            pallas_mod.disable()
        assert anc_hyps == base_hyps
        np.testing.assert_allclose(anc_scores, base_scores, rtol=1e-4,
                                   atol=1e-4)

    def test_model_step_parity_with_kernels(self, rng):
        """MHA.step with pallas enabled == XLA path (interpret mode)."""
        import stac_st_tpu.ops.pallas as pallas_mod
        from stac_st_tpu.models import TransformerMultiTask

        model = TransformerMultiTask(
            tgt_vocab=30, input_size=16, d_model=64, nhead=1,
            num_encoder_layers=1, num_decoder_layers=1, d_ffn=32,
            dropout=0.0, normalize_before=True,
        )
        src = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32))
        tgt = jnp.asarray(rng.integers(1, 30, (2, 4)))
        params = model.init(jax.random.PRNGKey(0), src, tgt)
        enc = model.apply(params, src, method=model.encode)

        def roll(n_steps=4):
            cache = model.apply(
                params, enc, n_steps,
                method=TransformerMultiTask.init_decode_cache,
            )
            outs = []
            for t in range(n_steps):
                o, cache = model.apply(
                    params, tgt[:, t], jnp.asarray(t), cache,
                    method=TransformerMultiTask.decode_step,
                )
                outs.append(np.asarray(o))
            return np.stack(outs)

        base = roll()
        try:
            pallas_mod.enable(interpret=True)
            fast = roll()
        finally:
            pallas_mod.disable()
        np.testing.assert_allclose(fast, base, rtol=5e-4, atol=5e-4)


class TestFlashAttentionTrain:
    """flash_attention_train: custom-VJP flash attention with in-kernel
    counter-based dropout (stac_st_tpu/ops/pallas/train_attention.py)."""

    def _inputs(self, rng, B=2, Tq=150, Tk=150, H=4, Dh=64):
        q = jnp.asarray(rng.standard_normal((B, Tq, H, Dh)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, Tk, H, Dh)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, Tk, H, Dh)), jnp.float32)
        lens = np.linspace(Tk, Tk // 2, B).astype(int)
        bias = jnp.asarray(
            np.where(np.arange(Tk)[None, :] < lens[:, None], 0.0, -1e9),
            jnp.float32,
        )
        return q, k, v, bias

    def test_forward_matches_reference(self, rng):
        from stac_st_tpu.ops.pallas.train_attention import (
            flash_attention_train,
        )

        q, k, v, bias = self._inputs(rng)
        out = flash_attention_train(q, k, v, bias, jnp.int32(0), 0.0, True)
        ref = _reference_attention(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_grads_match_reference(self, rng):
        from stac_st_tpu.ops.pallas.train_attention import (
            flash_attention_train,
        )

        q, k, v, bias = self._inputs(rng)

        def loss_f(q, k, v):
            return jnp.sum(
                flash_attention_train(q, k, v, bias, jnp.int32(0), 0.0,
                                      True) ** 2)

        def loss_r(q, k, v):
            return jnp.sum(_reference_attention(q, k, v, bias) ** 2)

        gf = jax.grad(loss_f, (0, 1, 2))(q, k, v)
        gr = jax.grad(loss_r, (0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)

    def test_cross_shape_grads(self, rng):
        """Tq != Tk (decoder cross-attention shapes)."""
        from stac_st_tpu.ops.pallas.train_attention import (
            flash_attention_train,
        )

        q, k, v, bias = self._inputs(rng, Tq=70, Tk=150)

        def loss_f(q, k, v):
            return jnp.sum(
                flash_attention_train(q, k, v, bias, jnp.int32(0), 0.0,
                                      True) ** 2)

        def loss_r(q, k, v):
            return jnp.sum(_reference_attention(q, k, v, bias) ** 2)

        out = flash_attention_train(q, k, v, bias, jnp.int32(0), 0.0, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_reference_attention(q, k, v, bias)),
            rtol=2e-4, atol=2e-4)
        gf = jax.grad(loss_f, (0, 1, 2))(q, k, v)
        gr = jax.grad(loss_r, (0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)

    def test_dropout_deterministic_and_seeded(self, rng):
        from stac_st_tpu.ops.pallas.train_attention import (
            flash_attention_train,
        )

        q, k, v, bias = self._inputs(rng)
        o1 = flash_attention_train(q, k, v, bias, jnp.int32(7), 0.25, True)
        o2 = flash_attention_train(q, k, v, bias, jnp.int32(7), 0.25, True)
        o3 = flash_attention_train(q, k, v, bias, jnp.int32(8), 0.25, True)
        assert bool(jnp.all(o1 == o2))
        assert not bool(jnp.all(o1 == o3))

    def test_dropout_fwd_bwd_mask_consistency(self, rng):
        """AD gradient == central finite difference with the SAME seed:
        only holds if forward and backward regenerate identical masks."""
        from stac_st_tpu.ops.pallas.train_attention import (
            flash_attention_train,
        )

        q, k, v, bias = self._inputs(rng)

        def el(qq, kk, vv):
            return flash_attention_train(
                qq, kk, vv, bias, jnp.int32(7), 0.25, True)[0, 3, 1, 5]

        eps = 1e-2
        for which, arg, idx in ((0, q, (0, 3, 1, 5)), (1, k, (0, 40, 1, 9)),
                                (2, v, (0, 41, 1, 9))):
            def f(a):
                args = [q, k, v]
                args[which] = a
                return el(*args)

            ad = float(jax.grad(f)(arg)[idx])
            d = jnp.zeros_like(arg).at[idx].set(1.0)
            fd = float((f(arg + eps * d) - f(arg - eps * d)) / (2 * eps))
            assert abs(ad - fd) < 5e-3 + 0.05 * abs(fd), (which, ad, fd)

    def test_dropout_mask_statistics(self):
        """Counter-based hash: keep-rate ~= 1-p per tile; tiles decorrelated."""
        from stac_st_tpu.ops.pallas.train_attention import _dropout_mask

        class _Seed:
            def __getitem__(self, i):
                return jnp.int32(3)

        rates = []
        for bh in range(4):
            for kt in range(3):
                m = _dropout_mask(_Seed(), jnp.int32(bh), jnp.int32(0),
                                  jnp.int32(kt), 0.25, (128, 128))
                rates.append(float(jnp.mean(m > 0)))
        assert abs(np.mean(rates) - 0.75) < 0.01, rates
        m1 = np.asarray(_dropout_mask(_Seed(), jnp.int32(0), jnp.int32(0),
                                      jnp.int32(0), 0.25, (128, 128))) > 0
        m2 = np.asarray(_dropout_mask(_Seed(), jnp.int32(0), jnp.int32(0),
                                      jnp.int32(1), 0.25, (128, 128))) > 0
        corr = np.corrcoef(m1.ravel(), m2.ravel())[0, 1]
        assert abs(corr) < 0.05

    def test_encoder_training_parity_no_dropout(self, rng):
        """Full encoder fwd+grads, pallas-enabled vs XLA, dropout off."""
        import stac_st_tpu.ops.pallas as pallas_mod
        from stac_st_tpu.models import TransformerMultiTask

        model = TransformerMultiTask(
            tgt_vocab=30, input_size=16, d_model=64, nhead=2,
            num_encoder_layers=2, num_decoder_layers=1, d_ffn=128,
            dropout=0.0, normalize_before=True,
        )
        src = jnp.asarray(rng.standard_normal((2, 150, 16)), jnp.float32)
        tgt = jnp.asarray(rng.integers(1, 30, (2, 12)))
        wav_len = jnp.asarray([1.0, 0.6], jnp.float32)
        params = model.init(jax.random.PRNGKey(0), src, tgt)

        def loss(p):
            enc, dec = model.apply(p, src, tgt, wav_len, 0, True)
            return jnp.sum(enc ** 2) + jnp.sum(dec ** 2)

        base_l, base_g = jax.value_and_grad(loss)(params)
        try:
            pallas_mod.enable(interpret=True)
            fast_l, fast_g = jax.value_and_grad(loss)(params)
        finally:
            pallas_mod.disable()
        np.testing.assert_allclose(float(fast_l), float(base_l), rtol=1e-4)
        flat_b = jax.tree_util.tree_leaves(base_g)
        flat_f = jax.tree_util.tree_leaves(fast_g)
        for a, b in zip(flat_f, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-4)

    def test_train_step_runs_with_kernel_dropout(self, rng):
        """Training forward with dropout>0 routes through the kernel and
        produces finite loss + grads (interpret mode)."""
        import stac_st_tpu.ops.pallas as pallas_mod
        from stac_st_tpu.models import TransformerMultiTask

        model = TransformerMultiTask(
            tgt_vocab=30, input_size=16, d_model=64, nhead=2,
            num_encoder_layers=1, num_decoder_layers=1, d_ffn=128,
            dropout=0.1, normalize_before=True,
        )
        src = jnp.asarray(rng.standard_normal((2, 64, 16)), jnp.float32)
        tgt = jnp.asarray(rng.integers(1, 30, (2, 8)))
        wav_len = jnp.asarray([1.0, 0.8], jnp.float32)
        params = model.init(jax.random.PRNGKey(0), src, tgt)

        def loss(p, key):
            enc, dec = model.apply(
                p, src, tgt, wav_len, 0, False,
                rngs={"dropout": key})
            return jnp.sum(enc ** 2) + jnp.sum(dec ** 2)

        try:
            pallas_mod.enable(interpret=True)
            l, g = jax.value_and_grad(loss)(params, jax.random.PRNGKey(1))
        finally:
            pallas_mod.disable()
        assert np.isfinite(float(l))
        assert all(np.all(np.isfinite(np.asarray(x)))
                   for x in jax.tree_util.tree_leaves(g))

    def test_enable_train_gates_only_training_path(self, rng):
        """enable_train turns on the flash TRAIN kernel without enabling
        the decode kernels (is_enabled stays False), and matches XLA."""
        import stac_st_tpu.ops.pallas as pallas_mod
        from stac_st_tpu.models import TransformerMultiTask

        model = TransformerMultiTask(
            tgt_vocab=30, input_size=16, d_model=64, nhead=2,
            num_encoder_layers=2, num_decoder_layers=1, d_ffn=128,
            dropout=0.0, normalize_before=True,
        )
        src = jnp.asarray(rng.standard_normal((2, 150, 16)), jnp.float32)
        tgt = jnp.asarray(rng.integers(1, 30, (2, 12)))
        wav_len = jnp.asarray([1.0, 0.6], jnp.float32)
        params = model.init(jax.random.PRNGKey(0), src, tgt)

        def loss(p):
            enc, dec = model.apply(p, src, tgt, wav_len, 0, True)
            return jnp.sum(enc ** 2) + jnp.sum(dec ** 2)

        base_l = float(loss(params))
        try:
            pallas_mod.enable_train(interpret=True)
            assert pallas_mod.train_enabled()
            assert not pallas_mod.is_enabled()  # decode kernels stay off
            fast_l = float(loss(params))
        finally:
            pallas_mod.disable_train()
            pallas_mod._INTERPRET = False
        assert not pallas_mod.train_enabled()
        np.testing.assert_allclose(fast_l, base_l, rtol=1e-4)
