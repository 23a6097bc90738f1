"""Opt-in Bloom `-filter` emulation (minhash/bloom.py) vs the exact
>= 2 semantics, and its CLI surface."""

import gzip
import os

import numpy as np
import pytest

from simka_tpu.minhash.bloom import (
    bloom_bits_from_config,
    compute_sketch_bloom,
    replay_sketch_bloom,
)
from simka_tpu.minhash.sketch import compute_sketch


def _random_reads(rng, n_reads=300, length=80):
    return [
        bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=length))
        for _ in range(n_reads)
    ]


def test_bloom_sizing_matches_reference_formula():
    # SimkaMinCount.hpp:1158-1159: max(maxMemory*MB*8/threads, 10000)
    assert bloom_bits_from_config(8000, 1) == 8000 * (1 << 20) * 8
    assert bloom_bits_from_config(8000, 4) == 8000 * (1 << 20) * 8 // 4
    assert bloom_bits_from_config(0, 1) == 10000
    # nb_cores=0 ("all") deterministically maps to 1 thread
    assert bloom_bits_from_config(100, 0) == bloom_bits_from_config(100, 1)


def test_huge_bloom_matches_exact_filter_semantics():
    """With no false positives reachable, the sequential Bloom replay
    must equal the closed-form exact `-filter` path (including the
    h_max heap quirk when the sketch is full)."""
    rng = np.random.default_rng(11)
    reads = _random_reads(rng, n_reads=200, length=60)
    k, seed = 15, 100
    for s in (50, 10**6):  # full heap (evictions) and unbounded
        exact_h, exact_c = compute_sketch(reads, k, s, seed, use_filter=True)
        bloom_h, bloom_c = compute_sketch_bloom(
            reads, k, s, seed, bloom_bits=1 << 28
        )
        np.testing.assert_array_equal(exact_h, bloom_h)
        np.testing.assert_array_equal(exact_c, bloom_c)


def test_tiny_bloom_admits_superset_with_false_positives():
    """At the 10000-bit floor, false positives admit singletons (count
    occurrences+1), reproducing the reference mechanism's approximate
    behavior: admitted set is a superset of the exact >= 2 set and
    per-kmer counts never decrease (unbounded sketch: no heap quirks).
    """
    rng = np.random.default_rng(12)
    reads = _random_reads(rng, n_reads=400, length=80)
    k, seed, s = 21, 100, 10**9
    exact_h, exact_c = compute_sketch(reads, k, s, seed, use_filter=True)
    bloom_h, bloom_c = compute_sketch_bloom(reads, k, s, seed, bloom_bits=10000)
    assert set(exact_h.tolist()) <= set(bloom_h.tolist())
    # ~26k distinct kmers vs 10000 bits fully saturates the Bloom:
    # false positives must exist
    assert len(bloom_h) > len(exact_h)
    exact_map = dict(zip(exact_h.tolist(), exact_c.tolist()))
    for h, c in zip(bloom_h.tolist(), bloom_c.tolist()):
        if h in exact_map:
            assert c in (exact_map[h], exact_map[h] + 1)
        else:
            # FP-admitted: count = occurrences + 1 >= 2
            assert c >= 2


def test_replay_heap_eviction_and_strict_less_than():
    """Direct replay on a hand-built stream: heap evicts the largest,
    equality with the top is dropped, Bloom-missed first occurrences
    are uncounted."""
    # huge bloom -> no FPs; each hash maps to one kmer value
    h = np.array([50, 50, 10, 10, 30, 30, 50, 30, 10], dtype=np.uint64)
    v = np.array([0, 0, 1, 1, 2, 2, 0, 2, 1], dtype=np.uint64)
    out_h, out_c = replay_sketch_bloom(h, v, sketch_size=2, n_bits=1 << 20)
    # 50 enters at 2nd occurrence (count 2); 10 enters (2); 30 enters,
    # evicting 50; then: 50 >= top(30) dropped, 30 == top dropped
    # (strict <, SimkaMinCount.hpp:361), final 10 < top counted -> 3
    np.testing.assert_array_equal(out_h, [10, 30])
    np.testing.assert_array_equal(out_c, [3, 2])


def test_cli_filter_bloom(tmp_path, capsys):
    rng = np.random.default_rng(13)
    fasta = tmp_path / "a.fasta"
    with open(fasta, "wb") as f:
        # write each read twice so every k-mer passes the >=2 filter
        for i, r in enumerate(_random_reads(rng, n_reads=50, length=60)):
            f.write(b">r%da\n%s\n>r%db\n%s\n" % (i, r, i, r))
    inp = tmp_path / "input.txt"
    inp.write_text(f"A: {fasta}\nB: {fasta}\n")
    out = tmp_path / "sketch.bin"

    from simka_tpu.minhash.cli import min_main

    rc = min_main(
        [
            "sketch", "-in", str(inp), "-out", str(out),
            "-kmer-size", "15", "-nb-kmers", "1000",
            "-filter-bloom", "-max-memory", "64",
        ]
    )
    assert rc == 0 and out.exists()
    from simka_tpu.minhash.sketch_file import SketchFile

    sf = SketchFile(str(out))
    assert sf.header().nb_datasets == 2
    h0, c0 = sf.read_slot(0)
    assert len(h0) > 0 and (c0 >= 2).all()
