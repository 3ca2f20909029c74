"""Duration-bucketed batching with static shapes (the XLA-friendly sampler).

Replaces SpeechBrain's ``DynamicBatchSampler``
(reference ``dataio_and_utils.py:203-231``, yaml:104-115): batches hold at
most ``max_batch_len`` seconds of audio, drawn from ``num_buckets`` duration
buckets, capped at ``max_batch_ex`` utterances, with per-epoch reshuffling
and random batch ordering.

TPU-native redesign (SURVEY.md §7.1): every bucket has a *fixed* padded
audio length (its upper boundary) and a *fixed* batch size
(``max_batch_len // boundary``), so the compiled train step sees at most
``num_buckets`` distinct shapes — seconds-budget semantics preserved, zero
per-batch recompiles. Boundaries come from empirical duration quantiles
(equivalent intent to SB's warped-quantile boundaries; not bitwise —
documented deviation).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence

import numpy as np

__all__ = ["DynamicBatchSampler", "BucketSpec"]


class BucketSpec:
    __slots__ = ("boundary", "batch_size")

    def __init__(self, boundary: float, batch_size: int):
        self.boundary = float(boundary)
        self.batch_size = int(batch_size)

    def __repr__(self) -> str:  # pragma: no cover
        return f"BucketSpec(≤{self.boundary:.2f}s, bs={self.batch_size})"


class DynamicBatchSampler:
    """Yields lists of dataset indices; exposes static bucket shapes."""

    def __init__(
        self,
        lengths: Sequence[float],
        max_batch_length: float,
        num_buckets: int = 50,
        shuffle: bool = True,
        batch_ordering: str = "random",
        max_batch_ex: int = 128,
        seed: int = 8886,
        drop_last: bool = False,
    ):
        self.lengths = np.asarray(lengths, np.float64)
        self.max_batch_length = float(max_batch_length)
        self.shuffle = bool(shuffle)
        self.batch_ordering = batch_ordering
        self.max_batch_ex = int(max_batch_ex)
        self.seed = int(seed)
        self.drop_last = bool(drop_last)
        self.epoch = 0

        if len(self.lengths) == 0:
            raise ValueError("empty dataset")
        num_buckets = max(1, min(int(num_buckets), len(np.unique(self.lengths))))
        qs = np.quantile(
            self.lengths, np.linspace(0, 1, num_buckets + 1)[1:]
        )
        boundaries = np.unique(qs)
        boundaries[-1] = self.lengths.max()
        self.buckets: List[BucketSpec] = []
        for b in boundaries:
            bs = int(self.max_batch_length // max(b, 1e-6))
            bs = max(1, min(bs, self.max_batch_ex))
            self.buckets.append(BucketSpec(b, bs))
        self._assign = np.searchsorted(
            [b.boundary for b in self.buckets], self.lengths, side="left"
        )
        self._assign = np.minimum(self._assign, len(self.buckets) - 1)

    # ------------------------------------------------------------------ api
    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def bucket_of(self, index: int) -> BucketSpec:
        return self.buckets[self._assign[index]]

    def bucket_shapes(self, sample_rate: int = 16000) -> List[Dict]:
        """Static (batch_size, padded_samples) per bucket — the compile set."""
        return [
            {
                "batch_size": b.batch_size,
                "boundary_sec": b.boundary,
                "padded_samples": int(np.ceil(b.boundary * sample_rate)),
            }
            for b in self.buckets
        ]

    def __iter__(self) -> Iterator[List[int]]:
        rng = np.random.default_rng(self.seed + self.epoch)
        order = np.arange(len(self.lengths))
        if self.shuffle:
            rng.shuffle(order)
        per_bucket: List[List[int]] = [[] for _ in self.buckets]
        batches: List[List[int]] = []
        for idx in order:
            b = self._assign[idx]
            per_bucket[b].append(int(idx))
            if len(per_bucket[b]) == self.buckets[b].batch_size:
                batches.append(per_bucket[b])
                per_bucket[b] = []
        if not self.drop_last:
            for leftover in per_bucket:
                if leftover:
                    batches.append(leftover)
        if self.batch_ordering == "random" and self.shuffle:
            rng.shuffle(batches)
        elif self.batch_ordering == "descending":
            batches.sort(
                key=lambda bb: -max(self.lengths[i] for i in bb)
            )
        elif self.batch_ordering == "ascending":
            batches.sort(key=lambda bb: max(self.lengths[i] for i in bb))
        self._last_num_batches = len(batches)
        return iter(batches)

    def __len__(self) -> int:
        sizes = np.bincount(self._assign, minlength=len(self.buckets))
        total = 0
        for count, spec in zip(sizes, self.buckets):
            full, rem = divmod(int(count), spec.batch_size)
            total += full + (0 if self.drop_last or rem == 0 else 1)
        return total
