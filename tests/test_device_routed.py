"""Device-resident sharded ingest: on-device hash routing must be
bit-identical to host routing and to the single-device path.

The reference's count-phase shuffle writes Repartitor-selected
partition files (/root/reference/src/SimkaPotara.hpp:713-723); here the
equivalent is route_packed_batch keeping each device's hash range on
device. Exactness of every accumulator makes all three layouts agree
bit-for-bit (the reference's resource-invariance test,
tests/simple_test.py:78-83).
"""

import jax
import numpy as np
import pytest

from simka_tpu.config import SimkaConfig
from simka_tpu.core.pipeline import (
    _compute_statistics_device,
    _compute_statistics_host_routed,
    _compute_statistics_sharded_device,
    compute_statistics,
)


def random_reads(rng, n_reads, min_len=40, max_len=120, n_frac=0.02):
    reads = []
    for _ in range(n_reads):
        ln = int(rng.integers(min_len, max_len + 1))
        codes = rng.integers(0, 4, size=ln)
        seq = np.frombuffer(b"ACGT", np.uint8)[codes].copy()
        ns = rng.random(ln) < n_frac
        seq[ns] = ord("N")
        reads.append(seq.tobytes())
    return reads


def assert_stats_equal(a, b):
    for name in (
        "nb_distinct_kmers",
        "nb_shared_kmers",
        "dataset_nb_reads",
        "distinct_per_bank",
        "solid_per_bank",
        "chord_n2_per_bank",
        "shared_kmers",
        "shared_distinct",
        "bray_numerator",
        "chord_ninj",
        "hellinger",
        "whittaker",
        "kullback_leibler",
    ):
        x = np.asarray(getattr(a, name))
        y = np.asarray(getattr(b, name))
        np.testing.assert_array_equal(x, y, err_msg=name)


@pytest.mark.parametrize("k", [21, 35])
def test_device_routed_matches_host_and_single(k):
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(11)
    datasets = [random_reads(rng, 300) for _ in range(4)]
    ids = [f"s{i}" for i in range(4)]
    cfg = SimkaConfig(
        input_filename="",
        output_dir="",
        kmer_size=k,
        abundance_min=1,
        simple_dist=True,
        complex_dist=True,
        n_shards=4,
    )
    dev = _compute_statistics_sharded_device(datasets, ids, cfg, 4)
    assert dev is not None, "capacity overflow on a tiny batch"
    host = _compute_statistics_host_routed(datasets, ids, cfg, 4)
    single = _compute_statistics_device(datasets, ids, cfg)
    assert_stats_equal(dev, host)
    assert_stats_equal(dev, single)


def test_device_routed_shannon_filter():
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(5)
    # low-complexity reads so the kmer-shannon filter actually drops
    datasets = [
        random_reads(rng, 150) + [b"A" * 80, b"ACACACACAC" * 8]
        for _ in range(3)
    ]
    ids = ["a", "b", "c"]
    cfg = SimkaConfig(
        input_filename="",
        output_dir="",
        kmer_size=21,
        abundance_min=1,
        min_kmer_shannon_index=1.5,
        n_shards=2,
    )
    dev = _compute_statistics_sharded_device(datasets, ids, cfg, 2)
    assert dev is not None
    single = _compute_statistics_device(datasets, ids, cfg)
    assert_stats_equal(dev, single)


def test_overflow_falls_back_to_host_routing(monkeypatch):
    """A routed batch that overflows its static capacity must be
    detected exactly and recomputed via host routing."""
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    import simka_tpu.parallel.sharded as sharded

    monkeypatch.setattr(
        sharded, "route_capacity", lambda n, s: 1024
    )
    rng = np.random.default_rng(2)
    datasets = [random_reads(rng, 400) for _ in range(3)]
    ids = ["a", "b", "c"]
    cfg = SimkaConfig(
        input_filename="",
        output_dir="",
        kmer_size=21,
        abundance_min=1,
        n_shards=2,
    )
    assert (
        _compute_statistics_sharded_device(datasets, ids, cfg, 2)
        is None
    )
    via_dispatch = compute_statistics(datasets, ids, cfg)
    single = _compute_statistics_device(datasets, ids, cfg)
    assert_stats_equal(via_dispatch, single)
