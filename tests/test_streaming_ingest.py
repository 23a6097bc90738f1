"""Streaming ingestion: provider/iterator inputs must be byte-
identical to in-memory lists, with reads pulled lazily (host RSS
O(batch) -- the gatb IBank streaming contract,
/root/reference/src/core/SimkaCommons.hpp:159-314)."""

import numpy as np

from simka_tpu.config import SimkaConfig
from simka_tpu.core.distances import compute_all_matrices
from simka_tpu.core.pipeline import (
    compute_statistics,
    count_dataset_spectrum,
)
from simka_tpu.io.bank import count_dataset_reads, read_dataset


def _mk_reads(rng, n, L=80):
    bases = np.frombuffer(b"ACGT", np.uint8)
    return [
        bases[rng.integers(0, 4, size=L)].tobytes() for _ in range(n)
    ]


def test_spectrum_stream_equals_list():
    rng = np.random.default_rng(0)
    reads = _mk_reads(rng, 500)
    w1, c1, n1 = count_dataset_spectrum(reads, 21)
    # small super-batches force the merge path; generator input
    w2, c2, n2 = count_dataset_spectrum(
        (r for r in reads), 21, stream_batch_reads=64
    )
    assert n1 == n2 == 500
    np.testing.assert_array_equal(c1, c2)
    for a, b in zip(w1, w2):
        np.testing.assert_array_equal(a, b)


class LazinessProbe:
    """Iterator that records the max number of reads handed out
    between consumer checkpoints -- materializing the whole dataset
    up-front would drain it in one go."""

    def __init__(self, reads):
        self.reads = reads
        self.pos = 0

    def __iter__(self):
        for r in self.reads:
            self.pos += 1
            yield r


def test_compute_statistics_providers_match_lists():
    rng = np.random.default_rng(1)
    datasets = [_mk_reads(rng, 300) for _ in range(3)]
    ids = ["A", "B", "C"]
    config = SimkaConfig(
        kmer_size=21, abundance_min=1, verbose=False, n_shards=1
    )
    s_list = compute_statistics(datasets, ids, config)
    providers = [lambda d=d: iter(d) for d in datasets]
    s_prov = compute_statistics(providers, ids, config)
    m1 = compute_all_matrices(s_list)
    m2 = compute_all_matrices(s_prov)
    assert set(m1) == set(m2)
    for k in m1:
        np.testing.assert_array_equal(m1[k], m2[k])
    np.testing.assert_array_equal(
        s_list.dataset_nb_reads, s_prov.dataset_nb_reads
    )


def test_count_dataset_reads_matches_read_dataset(tmp_path):
    rng = np.random.default_rng(2)
    reads = _mk_reads(rng, 120, L=60)
    p = tmp_path / "x.fasta"
    with open(p, "wb") as f:
        for i, r in enumerate(reads):
            f.write(b">r%d\n" % i + r + b"\n")
    banks = [[str(p)]]
    assert count_dataset_reads(banks) == len(read_dataset(banks))
    assert count_dataset_reads(banks, min_read_size=61) == 0
