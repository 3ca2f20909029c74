"""External audio conversion fallback (mp3 → wav for CommonVoice 13).

The reference decodes CV's mp3 clips through torchaudio/sox
(``common_voice_prepare.py:324-336``, ``get_data.sh``). This image ships no
mp3 decoder (no ffmpeg/sox/torchaudio — SURVEY.md §2.2), so the prep takes
a pluggable ``audio_converter``; this module supplies the documented
fallback: the first available of ``ffmpeg`` / ``sox`` / ``mpg123`` on PATH,
invoked per clip to produce mono 16 kHz PCM16 wav. When none is installed,
:func:`default_mp3_converter` returns ``None`` and the prep proceeds
text-only (entries without decodable audio are dropped with a warning).
"""

from __future__ import annotations

import logging
import shutil
import subprocess
from typing import Callable, List, Optional

logger = logging.getLogger(__name__)

__all__ = ["default_mp3_converter", "converter_for"]


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


def default_mp3_converter(
    sample_rate: int = 16000,
) -> Optional[Callable[[str, str], None]]:
    """First available external decoder on PATH, or None."""
    for name, builder in _CANDIDATES:
        binary = shutil.which(name)
        if binary:
            logger.info("mp3 conversion via %s", binary)
            return converter_for(binary, builder, sample_rate)
    logger.warning(
        "no mp3 decoder on PATH (tried ffmpeg/sox/mpg123): CommonVoice "
        "audio entries will be skipped; install one or pre-convert clips"
    )
    return None
