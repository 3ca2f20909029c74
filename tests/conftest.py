"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of a fake distributed backend (SURVEY.md §4):
multi-chip sharding tests execute on N virtual CPU devices, so the full
pjit/shard_map path is exercised without TPU hardware.

Note: in this environment a sitecustomize pre-imports jax with the TPU
platform selected, so env vars are too late — we switch platforms through
``jax.config`` before any backend is initialized.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(8886)


@pytest.fixture(autouse=True)
def _stable_prng_impl():
    """STTrainer flips jax_default_prng_impl to 'rbg' globally (the
    measured-2x dropout-RNG fix, docs/PERF.md); restore the default after
    each test so unrelated tests keep threefry-reproducible keys
    regardless of execution order."""
    prev = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != prev:
        jax.config.update("jax_default_prng_impl", prev)


@pytest.fixture(autouse=True)
def _stable_pallas_state():
    """STTrainer may enable the train-only flash-attention kernel
    (run_opt train_attn_kernel); restore the module toggles after each
    test so kernel state never leaks across tests."""
    from stac_st_tpu.ops import pallas as pallas_mod

    prev = (pallas_mod._ENABLED, pallas_mod._TRAIN_ENABLED,
            pallas_mod._INTERPRET)
    yield
    (pallas_mod._ENABLED, pallas_mod._TRAIN_ENABLED,
     pallas_mod._INTERPRET) = prev
