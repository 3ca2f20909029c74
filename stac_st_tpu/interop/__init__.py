"""Interop: importing reference (SpeechBrain/PyTorch) artifacts."""

from .sb_import import (  # noqa: F401
    import_model_state_dict,
    import_normalizer_dict,
    load_sb_experiment,
)
