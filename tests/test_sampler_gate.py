"""Epoch-composition gate: our DynamicBatchSampler vs SB's algorithm.

SpeechBrain itself is not installed in this image, so the oracle is a
straight-line transcription of SB's ``DynamicBatchSampler`` algorithm
(``speechbrain/dataio/sampler.py`` as configured by the reference at
``dataio_and_utils.py:203-231`` / yaml:104-115): warped lognorm bucket
boundaries, count-based bucket batch sizes, flush-on-full with
``max_batch_ex``, leftovers in bucket order, one torch.Generator seeded
``seed + epoch`` driving the example permutation then the batch
permutation. The gate asserts IDENTICAL epoch composition (the SURVEY
§7.2.3 statistic set: batches/epoch, per-batch members, padding waste,
seconds-per-batch histogram).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from scipy.stats import lognorm

from stac_st_tpu.data.sampler import DynamicBatchSampler, sb_warped_boundaries


# ---------------------------------------------------------------------------
# SB oracle (straight-line transcription of the SB algorithm)
# ---------------------------------------------------------------------------

def _sb_boundaries(max_batch_length, num_quantiles):
    num_boundaries = num_quantiles + 1
    latent = np.linspace(
        1 / num_boundaries, num_quantiles / num_boundaries, num_quantiles
    )
    quantiles = lognorm.ppf(latent, 1)
    bucket_boundaries = quantiles * max_batch_length / quantiles[-1]
    return list(sorted(bucket_boundaries))


def _sb_batches(lengths, max_batch_length, num_buckets, shuffle,
                batch_ordering, max_batch_ex, seed, epoch, drop_last=False):
    boundaries = np.array(_sb_boundaries(max_batch_length, num_buckets))
    bucket_lens = [
        max(1, int(max_batch_length / boundaries[i]))
        for i in range(len(boundaries))
    ] + [1]

    g = torch.Generator()
    g.manual_seed(seed + epoch)
    if shuffle:
        sampler = torch.randperm(len(lengths), generator=g).tolist()
    else:
        sampler = range(len(lengths))

    batches = []
    bucket_batches = [[] for _ in bucket_lens]
    for idx in sampler:
        item_len = lengths[idx]
        bucket_id = np.searchsorted(boundaries, item_len)
        bucket_batches[bucket_id].append(idx)
        if (
            len(bucket_batches[bucket_id]) >= bucket_lens[bucket_id]
            or len(bucket_batches[bucket_id]) >= max_batch_ex
        ):
            batches.append(bucket_batches[bucket_id])
            bucket_batches[bucket_id] = []
    if not drop_last:
        for batch in bucket_batches:
            if batch:
                batches.append(batch)

    if batch_ordering == "random":
        perm = torch.randperm(len(batches), generator=g).tolist()
        batches = [batches[i] for i in perm]
    elif batch_ordering == "ascending":
        batches = sorted(batches, key=lambda b: max(lengths[i] for i in b))
    elif batch_ordering == "descending":
        batches = sorted(
            batches, key=lambda b: max(lengths[i] for i in b), reverse=True
        )
    return batches


def _fixture_lengths(n=600, seed=0):
    """Lognormal-ish conversational durations in (0.5, 35] s."""
    rng = np.random.default_rng(seed)
    return np.clip(rng.lognormal(1.6, 0.7, size=n), 0.5, 35.0)


REF_CFG = dict(max_batch_length=450.0, num_buckets=50, max_batch_ex=128)


def test_boundaries_match_sb():
    ours = sb_warped_boundaries(450.0, 50)
    theirs = _sb_boundaries(450.0, 50)
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)
    assert ours[-1] == pytest.approx(450.0)


@pytest.mark.parametrize("ordering", ["random", "ascending", "descending"])
@pytest.mark.parametrize("shuffle", [True, False])
def test_epoch_composition_identical(shuffle, ordering):
    lengths = _fixture_lengths()
    ours = DynamicBatchSampler(
        lengths, REF_CFG["max_batch_length"],
        num_buckets=REF_CFG["num_buckets"], shuffle=shuffle,
        batch_ordering=ordering, max_batch_ex=REF_CFG["max_batch_ex"],
    )
    for epoch in (0, 1, 5):
        ours.set_epoch(epoch)
        got = list(ours)
        expected = _sb_batches(
            lengths, REF_CFG["max_batch_length"], REF_CFG["num_buckets"],
            shuffle, ordering, REF_CFG["max_batch_ex"], seed=42, epoch=epoch,
        )
        assert got == expected, (shuffle, ordering, epoch)


def test_max_batch_ex_and_stats():
    lengths = _fixture_lengths(300, seed=3)
    ours = DynamicBatchSampler(
        lengths, 450.0, num_buckets=10, shuffle=True,
        batch_ordering="random", max_batch_ex=8,
    )
    got = list(ours)
    expected = _sb_batches(lengths, 450.0, 10, True, "random", 8, 42, 0)
    assert got == expected
    assert all(len(b) <= 8 for b in got)

    # composition statistics (SURVEY §7.2.3): batches/epoch, padding
    # waste, seconds-per-batch histogram
    def stats(batches):
        secs = [sum(lengths[i] for i in b) for b in batches]
        waste = [
            max(lengths[i] for i in b) * len(b) - s
            for b, s in zip(batches, secs)
        ]
        return len(batches), np.histogram(secs, bins=10)[0], np.mean(waste)

    n_got, hist_got, waste_got = stats(got)
    n_exp, hist_exp, waste_exp = stats(expected)
    assert n_got == n_exp
    np.testing.assert_array_equal(hist_got, hist_exp)
    assert waste_got == pytest.approx(waste_exp)


def test_seconds_budget_respected():
    """boundary*count ≤ budget ⇒ every non-overflow batch ≤ max_batch_len."""
    lengths = _fixture_lengths(400, seed=5)
    sampler = DynamicBatchSampler(lengths, 450.0, num_buckets=50,
                                  shuffle=True)
    for batch in sampler:
        total = sum(lengths[i] for i in batch)
        if max(lengths[i] for i in batch) <= 450.0:
            assert total <= 450.0 + 1e-9


def test_every_index_appears_exactly_once():
    lengths = _fixture_lengths(257, seed=9)
    sampler = DynamicBatchSampler(lengths, 450.0, num_buckets=50,
                                  shuffle=True)
    seen = [i for b in sampler for i in b]
    assert sorted(seen) == list(range(257))
    assert len(sampler) == len(list(sampler))


def test_static_shape_compile_set():
    lengths = _fixture_lengths(100, seed=11)
    sampler = DynamicBatchSampler(lengths, 100.0, num_buckets=5)
    shapes = sampler.bucket_shapes()
    assert len(shapes) == 6  # 5 buckets + overflow
    for batch in sampler:
        spec = sampler.bucket_of(batch[0])
        assert len(batch) <= spec.batch_size
        assert all(lengths[i] <= spec.boundary + 1e-9 for i in batch)
