"""Audio conversion for compressed corpora (mp3 → wav for CommonVoice 13).

The reference decodes CV's mp3 clips through torchaudio/sox
(``common_voice_prepare.py:324-336``, ``get_data.sh``). Here the preferred
path is **in-process**: the first-party ``_stacaudio`` extension
(``native/stacaudio.cpp``) links the system ffmpeg libraries
(libavformat/avcodec/swresample) directly — no subprocess per clip, no
temp files, GIL released during decode; its mp3 path is round-trip tested
in-image against real LAME-encoded bytes (``tests/test_stacaudio.py``).
When the extension is not built, the documented fallback chain applies:
the first available of ``ffmpeg`` / ``sox`` / ``mpg123`` on PATH, invoked
per clip to produce mono 16 kHz PCM16 wav. When neither exists,
:func:`default_mp3_converter` returns ``None`` and the prep proceeds
text-only (entries without decodable audio are dropped with a warning).
"""

from __future__ import annotations

import logging
import shutil
import subprocess
from typing import Callable, List, Optional

logger = logging.getLogger(__name__)

__all__ = ["default_mp3_converter", "converter_for", "native_converter"]


def _ffmpeg_cmd(binary: str, src: str, dst: str,
                sample_rate: int) -> List[str]:
    return [binary, "-y", "-hide_banner", "-loglevel", "error", "-i", src,
            "-ac", "1", "-ar", str(sample_rate), "-c:a", "pcm_s16le", dst]


def _sox_cmd(binary: str, src: str, dst: str, sample_rate: int) -> List[str]:
    return [binary, src, "-r", str(sample_rate), "-c", "1", "-b", "16", dst]


def _mpg123_cmd(binary: str, src: str, dst: str,
                sample_rate: int) -> List[str]:
    return [binary, "-q", "-r", str(sample_rate), "-m", "-w", dst, src]


_CANDIDATES = (
    ("ffmpeg", _ffmpeg_cmd),
    ("sox", _sox_cmd),
    ("mpg123", _mpg123_cmd),
)


def converter_for(binary: str, cmd_builder,
                  sample_rate: int = 16000) -> Callable[[str, str], None]:
    def convert(src: str, dst: str) -> None:
        subprocess.run(
            cmd_builder(binary, src, dst, sample_rate),
            check=True, capture_output=True,
        )

    return convert


def native_converter(
    sample_rate: int = 16000,
) -> Optional[Callable[[str, str], None]]:
    """In-process decode via ``_stacaudio`` (linked ffmpeg libs), or None
    when the optional extension is not built."""
    from ..native import get_audio_native

    native = get_audio_native()
    if native is None:
        return None

    from ..data.audio import write_wav

    def convert(src: str, dst: str) -> None:
        raw, sr = native.decode(src, sample_rate)
        import numpy as np

        write_wav(dst, np.frombuffer(raw, np.float32), sr)

    return convert


def default_mp3_converter(
    sample_rate: int = 16000,
) -> Optional[Callable[[str, str], None]]:
    """In-process ``_stacaudio`` decode when built, else the first
    available external decoder on PATH, else None."""
    native = native_converter(sample_rate)
    if native is not None:
        logger.info("mp3 conversion via in-process _stacaudio (libav*)")
        return native
    for name, builder in _CANDIDATES:
        binary = shutil.which(name)
        if binary:
            logger.info("mp3 conversion via %s", binary)
            return converter_for(binary, builder, sample_rate)
    logger.warning(
        "no mp3 decoder available (no _stacaudio build; tried "
        "ffmpeg/sox/mpg123 on PATH): CommonVoice audio entries will be "
        "skipped; build the extension or install a CLI decoder"
    )
    return None
