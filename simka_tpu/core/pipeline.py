"""End-to-end exact-mode pipeline (the reference's `simka` executable).

Replaces the Potara multi-process orchestration
(src/SimkaPotara.hpp:259-326: parse -> setup -> config -> count ->
merge -> stats) with: host read ingestion -> device k-mer extraction ->
one fused count+join+stats program -> host distance formulas -> csv.gz.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from simka_tpu.config import SimkaConfig
from simka_tpu.core.distances import compute_all_matrices
from simka_tpu.core.output import write_all_matrices
from simka_tpu.core.stats import SimkaStatistics
from simka_tpu.io.bank import encode_batch, read_dataset
from simka_tpu.io.dsl import Dataset, check_input_validity, parse_input_file
from simka_tpu.ops.countjoin import count_join_stats
from simka_tpu.ops.kmers import extract_canonical_kmers


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def resolve_max_reads(read_counts: Sequence[int], max_reads: int) -> int:
    """-1: use all (0 internally); 0: auto-normalize to
    (min + mean) / 2 (reference SimkaAlgorithm::computeMaxReads,
    src/core/SimkaAlgorithm.cpp:376-445, using exact counts where the
    reference uses bank estimates); N: literal cap."""
    if max_reads == -1:
        return 0
    if max_reads == 0:
        counts = np.asarray(read_counts, np.int64)
        mean = int(counts.sum()) // len(counts)
        return (int(counts.min()) + mean) // 2
    return max_reads


def extract_dataset_kmers(
    seqs: List[bytes], k: int, batch_reads: int = 1 << 15
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Encode + extract canonical k-mers for one sample.

    Returns (hi, lo) uint32 arrays of ALL window positions (invalid
    ones hold SENTINEL) plus the read count. Batches are padded to
    stable shape classes to bound recompilation.
    """
    his, los = [], []
    for start in range(0, len(seqs), batch_reads):
        chunk = seqs[start : start + batch_reads]
        max_len = max((len(s) for s in chunk), default=k)
        width = _round_up(max(max_len, k), 32)
        codes, _ = encode_batch(chunk, max_len=width)
        pad_b = _round_up(len(chunk), 256) - len(chunk)
        if pad_b:
            codes = np.concatenate(
                [codes, np.full((pad_b, width), 255, np.uint8)]
            )
        hi, lo, _ = extract_canonical_kmers(jnp.asarray(codes), k)
        his.append(np.asarray(hi).ravel())
        los.append(np.asarray(lo).ravel())
    if not his:
        return (
            np.empty(0, np.uint32),
            np.empty(0, np.uint32),
            0,
        )
    return np.concatenate(his), np.concatenate(los), len(seqs)


def compute_statistics(
    dataset_seqs: List[List[bytes]],
    dataset_ids: List[str],
    config: SimkaConfig,
) -> SimkaStatistics:
    """Full statistics from in-memory per-dataset read lists.

    Runs single-device, or -- when the config requests shards / more
    than one local device exists -- sharded over the k-mer hash space
    with a psum reduction (bit-identical either way; see
    tests/test_sharded.py).
    """
    import jax

    k = config.kmer_size
    his, los, sids = [], [], []
    nb_reads = []
    for s, seqs in enumerate(dataset_seqs):
        hi, lo, n = extract_dataset_kmers(seqs, k)
        his.append(hi)
        los.append(lo)
        sids.append(np.full(hi.shape, s, np.int32))
        nb_reads.append(n)

    hi = np.concatenate(his) if his else np.empty(0, np.uint32)
    lo = np.concatenate(los) if los else np.empty(0, np.uint32)
    sid = np.concatenate(sids) if sids else np.empty(0, np.int32)

    n_shards = config.n_shards or len(jax.devices())
    if n_shards > 1 and len(jax.devices()) >= n_shards:
        from simka_tpu.parallel.sharded import (
            make_mesh,
            shard_instances_by_hash,
            sharded_count_join_stats,
        )

        mesh = make_mesh(n_shards)
        hs, ls, ss = shard_instances_by_hash(hi, lo, sid, n_shards)
        js = sharded_count_join_stats(
            hs,
            ls,
            ss,
            config.abundance_min,
            config.abundance_max,
            mesh=mesh,
            n_banks=len(dataset_ids),
            simple=config.simple_dist,
            complex_=config.complex_dist,
        )
    else:
        # pad the instance stream to a stable size class so repeated
        # runs reuse the compiled program
        E = max(len(hi), 1)
        target = 1 << max(10, (E - 1).bit_length())
        pad = target - len(hi)
        if pad:
            hi = np.concatenate([hi, np.full(pad, 0xFFFFFFFF, np.uint32)])
            lo = np.concatenate([lo, np.full(pad, 0xFFFFFFFF, np.uint32)])
            sid = np.concatenate([sid, np.zeros(pad, np.int32)])

        js = count_join_stats(
            jnp.asarray(hi),
            jnp.asarray(lo),
            jnp.asarray(sid),
            jnp.int32(config.abundance_min),
            jnp.int64(config.abundance_max),
            n_banks=len(dataset_ids),
            simple=config.simple_dist,
            complex_=config.complex_dist,
        )
    return SimkaStatistics.from_join_stats(
        js,
        dataset_ids,
        k,
        np.asarray(nb_reads, np.int64),
        config.simple_dist,
        config.complex_dist,
    )


def run_simka(config: SimkaConfig) -> Dict[str, np.ndarray]:
    """The `simka` tool: input file -> distance matrices on disk."""
    t0 = time.time()
    datasets = parse_input_file(config.input_filename)
    check_input_validity(datasets)
    ids = [d.id for d in datasets]

    if config.max_reads == 0:
        # auto mode: per-GROUP read counts (the reference divides each
        # dataset's read estimate by its ';'-group count,
        # SimkaPotara.hpp:646)
        raw_counts = [
            len(
                read_dataset(
                    d.banks,
                    config.min_read_size,
                    config.min_read_shannon_index,
                )
            )
            // max(len(d.banks), 1)
            for d in datasets
        ]
        cap = resolve_max_reads(raw_counts, 0)
    else:
        cap = resolve_max_reads([], config.max_reads)

    dataset_seqs = [
        read_dataset(
            d.banks,
            config.min_read_size,
            config.min_read_shannon_index,
            max_reads=cap,
        )
        for d in datasets
    ]
    if config.verbose:
        total = sum(len(s) for s in dataset_seqs)
        print(f"[simka-tpu] {len(ids)} datasets, {total} reads")

    stats = compute_statistics(dataset_seqs, ids, config)
    matrices = compute_all_matrices(stats)
    os.makedirs(config.output_dir, exist_ok=True)
    write_all_matrices(config.output_dir, matrices, ids)
    if config.verbose:
        print(stats.summary())
        print(
            f"[simka-tpu] wrote {len(matrices)} matrices to "
            f"{config.output_dir} in {time.time() - t0:.2f}s"
        )
    return matrices
