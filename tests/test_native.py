"""Parity tests: native C++ runtime vs pure-Python reference paths.

Skipped when the extension isn't built (``python setup.py build_ext
--inplace``) — the Python fallbacks are the reference implementations.
"""

import numpy as np
import pytest

from stac_st_tpu.native import get_native

native = get_native()
pytestmark = pytest.mark.skipif(native is None, reason="_stacnative not built")


class TestAudioKernels:
    def test_pcm16_parity(self, rng):
        pcm = (rng.standard_normal(1000) * 20000).astype("<i2")
        out = np.frombuffer(native.pcm16_to_float(pcm.tobytes(), 0), np.float32)
        np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0)

    def test_pcm16_big_endian(self):
        pcm = np.array([1000, -1000, 32000], dtype=">i2")
        out = np.frombuffer(native.pcm16_to_float(pcm.tobytes(), 1), np.float32)
        np.testing.assert_allclose(
            out, pcm.astype(np.float32) / 32768.0
        )

    def test_ulaw_parity(self, rng):
        from stac_st_tpu.data.audio import _pcm_to_float, _ulaw_decode

        raw = rng.integers(0, 256, 500).astype(np.uint8)
        out = np.frombuffer(native.ulaw_to_float(raw.tobytes()), np.float32)
        ref = _pcm_to_float(_ulaw_decode(raw), 16)
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_resample_matches_scipy(self, rng):
        from scipy.signal import resample_poly

        x = np.sin(np.linspace(0, 80, 16000)).astype(np.float32)
        y = np.frombuffer(native.resample_poly(x.tobytes(), 1, 2), np.float32)
        ref = resample_poly(x.astype(np.float64), 1, 2).astype(np.float32)
        n = min(len(y), len(ref))
        corr = np.corrcoef(y[200 : n - 200], ref[200 : n - 200])[0, 1]
        assert corr > 0.9999


class TestEditStats:
    def test_matches_python(self, rng):
        from stac_st_tpu.utils.edit_distance import align_edit_distance

        vocab = ["a", "b", "c", "d", "e"]
        for _ in range(20):
            ref = [vocab[i] for i in rng.integers(0, 5, rng.integers(0, 12))]
            hyp = [vocab[i] for i in rng.integers(0, 5, rng.integers(0, 12))]
            ins, dele, sub = native.edit_stats(ref, hyp)
            pi, pd, ps, _ = align_edit_distance(ref, hyp)
            # total edits must agree (tie-breaking may differ in composition)
            assert ins + dele + sub == pi + pd + ps


class TestBpeNative:
    def test_encode_parity_with_python(self, rng):
        """Native encode == pure-Python encode on a trained model."""
        from stac_st_tpu.tokenizer import BpeEncoder, train_bpe

        corpus = ["hola como estas", "hello how are you",
                  "buenos dias amigo"] * 10
        model = train_bpe(corpus, vocab_size=120,
                          user_defined_symbols=["[es]", "[en]"])
        enc = BpeEncoder(model)
        assert enc._native is not None
        # force python path for comparison
        import copy

        py_enc = BpeEncoder(model)
        py_enc._native = None
        for text in corpus + ["[es] hola [en] hello", "unseen zzz"]:
            assert enc.encode_as_ids(text) == py_enc.encode_as_ids(text), text
