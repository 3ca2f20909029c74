"""Pallas TPU kernels (opt-in fast paths with XLA fallbacks).

``enable()/disable()`` toggles kernel use globally; modules consult
``is_enabled()`` and fall back to the XLA formulation whenever a shape or
platform isn't supported. Numerical parity is enforced in
tests/test_pallas.py (interpret mode on CPU).
"""

from .attention import flash_attention

_ENABLED = False

__all__ = ["flash_attention", "enable", "disable", "is_enabled"]


def enable() -> None:
    global _ENABLED
    _ENABLED = True


def disable() -> None:
    global _ENABLED
    _ENABLED = False


def is_enabled() -> bool:
    return _ENABLED
