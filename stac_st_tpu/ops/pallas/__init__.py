"""Pallas TPU kernels (opt-in fast paths with XLA fallbacks).

``enable()/disable()`` toggles kernel use globally; modules consult
``is_enabled()`` and fall back to the XLA formulation whenever a shape or
platform isn't supported. ``enable(interpret=True)`` runs the kernels in
Pallas interpret mode, so the kernel code paths (including the gather-free
beam decode) execute on CPU — used by the parity tests. Numerical parity is
enforced in tests/test_pallas.py.

NOTE: the beam searcher captures the enabled state when ``bind()`` builds
its step closures — toggle BEFORE constructing/binding searchers or engines.
"""

from .attention import flash_attention

_ENABLED = False
_TRAIN_ENABLED = False
_INTERPRET = False

__all__ = ["flash_attention", "enable", "disable", "is_enabled",
           "enable_train", "disable_train", "train_enabled",
           "interpret_mode"]


def enable(interpret: bool = False) -> None:
    global _ENABLED, _INTERPRET
    _ENABLED = True
    _INTERPRET = bool(interpret)


def disable() -> None:
    global _ENABLED, _TRAIN_ENABLED, _INTERPRET
    _ENABLED = False
    _TRAIN_ENABLED = False
    _INTERPRET = False


def is_enabled() -> bool:
    return _ENABLED


def enable_train(interpret: bool = False) -> None:
    """Enable only the TRAINING flash-attention kernel.

    The decode-time kernels stay off (measured launch-bound on remote-
    Mosaic toolchains — docs/PERF.md), but the training kernel operates
    on large tiles and wins wherever the batch is production-sized: at
    the reference's 450-500 audio-s budget the XLA path falls into a
    spill valley (6.8k audio-s/s) while the kernel holds 9.3k. The
    trainer auto-enables this on TPU (run_opt ``train_attn_kernel``).
    """
    global _TRAIN_ENABLED, _INTERPRET
    _TRAIN_ENABLED = True
    if interpret:
        _INTERPRET = True


def disable_train() -> None:
    global _TRAIN_ENABLED
    _TRAIN_ENABLED = False


def train_enabled() -> bool:
    return _ENABLED or _TRAIN_ENABLED


def interpret_mode() -> bool:
    return _INTERPRET
