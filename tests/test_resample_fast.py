"""fast_resample_poly == scipy.signal.resample_poly, for every shape/ratio
the data path uses (8 kHz SPHERE → 16 kHz, speed perturb 90-110 %)."""

import numpy as np
import pytest
from scipy.signal import resample_poly

from stac_st_tpu.data.resample import fast_resample_poly

RATIOS = [(2, 1), (1, 2), (20, 19), (10, 11), (100, 95), (100, 110),
          (10, 9), (10, 11), (3, 7), (160, 441), (1, 3), (5, 1)]


@pytest.mark.parametrize("n", [1, 3, 7, 100, 1001, 64000, 128001])
def test_matches_scipy(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal(n).astype(np.float32)
    for up, down in RATIOS:
        got = fast_resample_poly(x, up, down)
        want = resample_poly(x.astype(np.float64), up, down)
        assert got.shape == want.shape, (n, up, down)
        tol = 3e-5 * max(1.0, float(np.abs(want).max()))
        assert np.abs(got - want).max() <= tol, (n, up, down)


def test_identity():
    x = np.arange(100, dtype=np.float32)
    np.testing.assert_array_equal(fast_resample_poly(x, 3, 3), x)


def test_unreduced_ratio():
    x = np.random.default_rng(0).standard_normal(4000).astype(np.float32)
    a = fast_resample_poly(x, 200, 190)
    b = fast_resample_poly(x, 20, 19)
    np.testing.assert_array_equal(a, b)
