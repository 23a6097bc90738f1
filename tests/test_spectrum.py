"""Spectrum ops: counting, merging (streaming path), hash grouping."""

import collections

import numpy as np

from simka_tpu.ops.spectrum import (
    count_spectrum,
    hash_spectrum,
    merge_spectra,
)


def rand_words(rng, n, space):
    vals = rng.integers(0, space, size=n, dtype=np.uint64)
    return (
        (vals >> np.uint64(32)).astype(np.uint32),
        (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        vals,
    )


def test_count_spectrum():
    rng = np.random.default_rng(0)
    hi, lo, vals = rand_words(rng, 5000, 700)
    (whi, wlo), counts = count_spectrum(hi, lo)
    oracle = collections.Counter(vals.tolist())
    got = {
        (int(h) << 32) | int(l): int(c)
        for h, l, c in zip(whi, wlo, counts)
    }
    assert got == dict(oracle)


def test_merge_spectra_matches_joint():
    rng = np.random.default_rng(1)
    hi, lo, vals = rand_words(rng, 30_000, 4000)
    joint_w, joint_c = count_spectrum(hi, lo)

    parts = []
    for i in range(0, 30_000, 7000):
        parts.append(count_spectrum(hi[i : i + 7000], lo[i : i + 7000]))
    merged_w, merged_c = merge_spectra(parts)

    assert np.array_equal(joint_w[0], merged_w[0])
    assert np.array_equal(joint_w[1], merged_w[1])
    assert np.array_equal(joint_c, merged_c)


def test_hash_spectrum_positions():
    rng = np.random.default_rng(2)
    stream = rng.integers(0, 50, size=2000, dtype=np.uint64)
    hashes, counts, first, second = hash_spectrum(
        (stream >> np.uint64(32)).astype(np.uint32),
        (stream & np.uint64(0xFFFFFFFF)).astype(np.uint32),
    )
    assert np.all(np.diff(hashes.astype(np.int64)) > 0)  # ascending
    for h, c, f, s in zip(hashes, counts, first, second):
        occ = np.nonzero(stream == h)[0]
        assert len(occ) == c
        assert occ[0] == f
        if c >= 2:
            assert occ[1] == s


def test_streaming_count_dataset():
    from simka_tpu.core.pipeline import count_dataset_spectrum

    rng = np.random.default_rng(3)
    seqs = [
        rng.choice(
            np.frombuffer(b"ACGT", np.uint8), size=64
        ).tobytes()
        for _ in range(600)
    ]
    w1, c1, n1 = count_dataset_spectrum(seqs, 21)
    w2, c2, n2 = count_dataset_spectrum(
        seqs, 21, stream_batch_reads=100
    )
    assert n1 == n2 == 600
    for a, b in zip(w1, w2):
        assert np.array_equal(a, b)
    assert np.array_equal(c1, c2)
