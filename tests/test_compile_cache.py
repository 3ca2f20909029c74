"""Persistent XLA compilation cache wiring (utils/compile_cache.py).

The serving engine compiles a (bucket x rung) grid at startup and the
trainer one step program per bucket; the persistent cache makes a
restarted process (preemption resume, serving redeploy) reload instead
of recompile. These tests pin the wiring — enablement, entry writes,
CLI routing — on the CPU backend; the cross-process reload speedup is
measured on the real chip in docs/PERF.md.
"""

import os

import jax
import jax.numpy as jnp
import pytest


@pytest.fixture()
def _restore_cache_config():
    prev = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", prev)
    import stac_st_tpu.utils.compile_cache as cc

    cc._ENABLED_DIR = prev


def test_enable_writes_entries(tmp_path, _restore_cache_config):
    from stac_st_tpu.utils.compile_cache import (
        compile_cache_dir,
        enable_compile_cache,
    )

    d = tmp_path / "xla_cache"
    assert enable_compile_cache(d, min_compile_seconds=0.0)
    assert compile_cache_dir() == str(d)

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x).sum()

    f(jnp.ones((32, 32))).block_until_ready()
    assert os.listdir(d), "no cache entries written"


def test_serve_cli_flag_default_auto():
    import recipes.serve as serve

    args = serve.build_parser().parse_args(["/tmp/exp"])
    assert args.compile_cache == "auto"
    args = serve.build_parser().parse_args(
        ["/tmp/exp", "--compile-cache", "off"])
    assert args.compile_cache == "off"


def test_trainer_run_opt_routes(tmp_path, _restore_cache_config):
    """compile_cache_dir is a registered run-opt and STTrainer enables it."""
    from stac_st_tpu.config.arguments import (
        RUN_OPT_DEFAULTS,
        parse_arguments,
    )

    assert "compile_cache_dir" in RUN_OPT_DEFAULTS
    d = str(tmp_path / "cc")
    _, run_opts, _ = parse_arguments(
        ["h.yaml", f"--compile_cache_dir={d}"])
    assert run_opts["compile_cache_dir"] == d
