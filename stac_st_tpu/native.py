"""Native runtime loader: C++ fast paths with pure-Python fallbacks.

Build with ``python setup.py build_ext --inplace``. Callers use
:func:`get_native` and fall back transparently when the extension is absent
— behavior is identical (the C++ code mirrors the numpy reference
implementations; parity is enforced by tests/test_native.py).
"""

from __future__ import annotations


_native = None
_tried = False


def get_native():
    """Returns the _stacnative module or None."""
    global _native, _tried
    if not _tried:
        _tried = True
        try:
            import _stacnative

            _native = _stacnative
        except ImportError:
            _native = None
    return _native


def has_native() -> bool:
    return get_native() is not None


_audio = None
_audio_tried = False


def get_audio_native():
    """Returns the optional _stacaudio module (in-process compressed-audio
    decode via the system ffmpeg libraries) or None when not built."""
    global _audio, _audio_tried
    if not _audio_tried:
        _audio_tried = True
        try:
            import _stacaudio

            _audio = _stacaudio
        except ImportError:
            _audio = None
    return _audio
