"""Persistent XLA compilation cache: pay each compile once per machine.

The serving engine compiles a (bucket x pad-rung) grid of fused
programs at startup and the trainer one step per bucket; on the dev
tunnel a single fused bucket compile costs ~85 s, and a preempted TPU
VM repays every one of them on restart. JAX's persistent compilation
cache keys executables by (HLO, compile options, platform) fingerprint
and reloads them across processes — measured on this toolchain:
0.48 s -> 0.08 s for a second-process identical jit (docs/PERF.md
"Persistent compilation cache"; `tools/exp_compile_cache.py` measures
the full serving-program unit).

Wired as:
* ``recipes/serve.py --compile-cache auto|off|<dir>`` (default ``auto``
  = ``<experiment_dir>/compile_cache`` — restarting the same serving
  experiment skips the whole compile grid);
* trainer run_opt ``compile_cache_dir`` (preemption-resume restarts
  re-enter the hot loop without repaying the step compiles; pairs with
  the SIGTERM checkpoint trap).

Safe to call any time before (or between) compiles; applies to every
subsequent compilation in the process.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Union

logger = logging.getLogger(__name__)

_ENABLED_DIR: Optional[str] = None


def enable_compile_cache(
    cache_dir: Union[str, "os.PathLike[str]"],
    *,
    min_compile_seconds: float = 1.0,
) -> bool:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Compiles cheaper than ``min_compile_seconds`` are not persisted
    (they are faster to redo than to deserialize; the default skips
    only trivial kernels — every bucketed engine/step program clears
    1 s by orders of magnitude).

    Returns True if the cache is active, False if this JAX build does
    not support it (the framework then simply compiles as before).
    """
    global _ENABLED_DIR
    cache_dir = os.fspath(cache_dir)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(min_compile_seconds),
        )
        # cache even small executables (the decode-step programs are
        # compile-time-expensive but byte-small)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        # JAX initializes its cache singleton at most once per process;
        # if anything compiled before this call (with another dir, or
        # with caching off), the config update above would be silently
        # ignored. Reset so the next compile re-initializes here.
        try:
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:  # pragma: no cover - private API drift
            pass
    except Exception as e:  # pragma: no cover - version-dependent
        logger.warning("persistent compilation cache unavailable: %s", e)
        return False
    _ENABLED_DIR = cache_dir
    logger.info("persistent compilation cache at %s", cache_dir)
    return True


def compile_cache_dir() -> Optional[str]:
    """The active cache directory, or None if not enabled."""
    return _ENABLED_DIR
