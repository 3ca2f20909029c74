"""Corpus preparation (L1): parsers, cleaning, turn concatenation, manifests.

Host-side CPU code re-owning the reference's ``datasets/`` tree
(SURVEY.md §2.1): Fisher/CALLHOME Spanish (single + multi-turn),
CommonVoice 13, CoVoST2, MSLT, cross-dataset mixers, and VAD segmentation —
all emitting the frozen JSON manifest schema the training stack consumes.
"""

from .records import Utterance, write_manifests
from .turns import concatenate_turns

__all__ = ["Utterance", "write_manifests", "concatenate_turns"]
