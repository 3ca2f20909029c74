"""Decoding: prompted KV-cached beam search and greedy search."""

from .beam_search import (
    BeamSearchConfig,
    MultiTaskBeamSearch,
    beam_search,
    greedy_search,
)

__all__ = [
    "BeamSearchConfig",
    "MultiTaskBeamSearch",
    "beam_search",
    "greedy_search",
]
