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
_INTERPRET = False

__all__ = ["flash_attention", "enable", "disable", "is_enabled",
           "interpret_mode"]


def enable(interpret: bool = False) -> None:
    global _ENABLED, _INTERPRET
    _ENABLED = True
    _INTERPRET = bool(interpret)


def disable() -> None:
    global _ENABLED, _INTERPRET
    _ENABLED = False
    _INTERPRET = False


def is_enabled() -> bool:
    return _ENABLED


def interpret_mode() -> bool:
    return _INTERPRET
