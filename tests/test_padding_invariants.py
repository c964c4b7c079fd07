"""Randomized invariants for the static-shape layer (padding / bucketing /
collate) — the properties every compiled program relies on, checked over many
random lengths instead of a few hand-picked ones."""

import numpy as np

from transmil_deepgraft_tpu.data.datamodule import collate
from transmil_deepgraft_tpu.ops.padding import (
    DEFAULT_BUCKETS,
    bucket_for_length,
    duplicate_pad_square,
    square_pad_length,
)

RNG = np.random.default_rng(0)


def test_bucket_for_length_properties():
    for n in RNG.integers(1, 70000, size=500):
        n = int(n)
        b = bucket_for_length(n)
        assert b in DEFAULT_BUCKETS
        if n <= DEFAULT_BUCKETS[-1]:
            assert b >= n  # never truncates
            smaller = [x for x in DEFAULT_BUCKETS if x < b]
            assert all(x < n for x in smaller)  # minimal qualifying bucket
    # monotone: longer bags never map to a smaller bucket
    lengths = sorted(int(x) for x in RNG.integers(1, 70000, size=100))
    buckets = [bucket_for_length(n) for n in lengths]
    assert buckets == sorted(buckets)


def test_square_pad_reference_semantics():
    for n in RNG.integers(1, 5000, size=200):
        n = int(n)
        side, side2, add = square_pad_length(n)
        assert side == side2
        assert side * side == n + add
        assert (side - 1) ** 2 < n <= side * side  # minimal square
        assert 0 <= add <= 2 * (side - 1)  # tight bound for a minimal square


def test_duplicate_pad_wraps_first_tokens():
    for _ in range(20):
        n = int(RNG.integers(2, 300))
        h = RNG.standard_normal((2, n, 5)).astype(np.float32)
        padded, hh, ww = duplicate_pad_square(h)
        assert hh == ww and padded.shape == (2, hh * ww, 5)
        add = hh * ww - n
        got = np.asarray(padded)
        np.testing.assert_array_equal(got[:, :n], h)
        # the reference's torch.cat([h, h[:, :add]], 1) wrap, exactly
        np.testing.assert_array_equal(got[:, n:], h[:, :add])


def test_collate_padding_invariants():
    for trial in range(25):
        k = int(RNG.integers(1, 5))
        items = []
        for i in range(k):
            n = int(RNG.integers(1, 400))
            bag = RNG.standard_normal((n, 8)).astype(np.float32)
            coords = RNG.integers(0, 100, (n, 2)).astype(np.int32)
            items.append((bag, i % 2, (f"s{i}", coords, f"p{i}")))
        for mode in ("exact", "bucket"):
            batch = collate(items, eval_pad=mode)
            n_max = max(it[0].shape[0] for it in items)
            target = n_max if mode == "exact" else bucket_for_length(n_max)
            assert batch.bags.shape == (k, target, 8)
            for i, (bag, label, (name, coords, patient)) in enumerate(items):
                n = bag.shape[0]
                assert int(batch.lengths[i]) == n
                np.testing.assert_array_equal(batch.bags[i, :n], bag)
                assert (batch.bags[i, n:] == 0).all()  # zero pad, ref policy
                assert batch.labels[i] == label
                assert batch.names[i] == name and batch.patients[i] == patient
