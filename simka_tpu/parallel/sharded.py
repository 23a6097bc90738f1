"""Multi-chip execution: k-mer-space sharding over a device mesh.

The reference shards the k-mer space into partitions via a minimizer
repartition table and runs one merge process per partition
(src/SimkaPotara.hpp:713-723, 974-1124), synchronizing through the
filesystem. Here each device owns a disjoint hash range of the k-mer
space; every device runs the same fused count/join program on its
shard and the final `SimkaStatistics` reduction is a ``psum`` over ICI
(the reference's `operator+=`, src/core/SimkaDistance.cpp:156-213).

Because every accumulator is an order-independent integer sum
(see ops/countjoin.py), results are bit-identical for any device count
-- the TPU version of the reference's resource-invariance test.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from simka_tpu.ops.countjoin import (
    JoinStats,
    count_join_stats,
    join_stats_from_spectra,
)
from simka_tpu.ops.kmers import SENTINEL


def make_mesh(n_devices: int = 0, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("shards",))


def _mix_hash_np(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """Host copy of ops.kmers.mix_hash (numpy, uint32 wraparound)."""
    with np.errstate(over="ignore"):
        h = (hi ^ np.uint32(0x9E3779B9)) * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(13))
        h = (h ^ lo) * np.uint32(0xC2B2AE35)
        h = h ^ (h >> np.uint32(16))
    return h


def shard_instances_by_hash(
    words,
    sid: np.ndarray,
    n_shards: int,
    pad_multiple: int = 1024,
    hash_words: int = 0,
):
    """Route k-mer instances to shards by hash (host-side, exact).

    All instances of a given k-mer land on the same shard, which is the
    property that makes per-shard counting exact (the reference gets it
    from the shared Repartitor, src/SimkaCount.cpp:218-228).

    Args:
      words: tuple of big-endian uint32 word arrays [E] (2 for k<=31).

    Returns (words_sh, sid_sh): tuple of [n_shards, E_shard] arrays
    padded with SENTINEL rows, plus the shard-major sample ids.
    """
    words = tuple(words)
    first = words[0]
    valid = first != np.uint32(0xFFFFFFFF)
    key_words = words[: hash_words or len(words)]
    h = key_words[0]
    for w in key_words[1:]:
        h = _mix_hash_np(h, w)
    shard = np.where(valid, h % np.uint32(n_shards), n_shards).astype(
        np.int64
    )
    order = np.argsort(shard, kind="stable")
    shard_sorted = shard[order]
    counts = np.bincount(shard_sorted, minlength=n_shards + 1)[:n_shards]
    cap = int(counts.max()) if len(counts) else 0
    cap = max(pad_multiple, -(-cap // pad_multiple) * pad_multiple)

    out_words = tuple(
        np.full((n_shards, cap), 0xFFFFFFFF, np.uint32) for _ in words
    )
    out_sid = np.zeros((n_shards, cap), np.int32)
    start = 0
    for s in range(n_shards):
        n = int(counts[s])
        sel = order[start : start + n]
        for ow, w in zip(out_words, words):
            ow[s, :n] = w[sel]
        out_sid[s, :n] = sid[sel]
        start += n
    return out_words, out_sid


def sharded_count_join_stats(
    words_sh,
    sid_sh,
    abundance_min,
    abundance_max,
    *,
    mesh: Mesh,
    n_banks: int,
    simple: bool = False,
    complex_: bool = False,
) -> JoinStats:
    """Run the fused count/join on every shard and psum-reduce.

    Inputs are tuples of [n_shards, E_shard] word arrays laid out along
    the mesh's 'shards' axis. Every JoinStats field is additive over
    disjoint k-mer sets, so a single psum yields global statistics.
    """
    words_sh = tuple(words_sh)
    nw = len(words_sh)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            tuple(P("shards") for _ in range(nw)),
            P("shards"),
            P(),
            P(),
        ),
        out_specs=jax.tree.map(
            lambda _: P(), JoinStats(*[0] * len(JoinStats._fields))
        ),
    )
    def step(words, sid, amin, amax):
        # psum_axis makes the per-bank totals global BEFORE the pair
        # terms consume them, then reduces every pairwise accumulator
        return count_join_stats(
            tuple(w[0] for w in words[:-1]),
            words[-1][0],
            sid[0],
            amin,
            amax,
            n_banks=n_banks,
            simple=simple,
            complex_=complex_,
            vary_axes=("shards",),
            psum_axis="shards",
        )

    return step(
        tuple(jnp.asarray(w) for w in words_sh),
        jnp.asarray(sid_sh),
        jnp.asarray(abundance_min, jnp.int32),
        jnp.asarray(abundance_max, jnp.int64),
    )


def shard_rows_by_hash(words, sid, counts, n_shards: int):
    """Route pre-counted spectrum rows to shards (same hash routing as
    instances; counts ride along)."""
    words = tuple(words)
    words_sh, sid_sh = shard_instances_by_hash(
        words + (counts.astype(np.uint32),),
        sid,
        n_shards,
        hash_words=len(words),  # hash the KMER only, not the count
    )
    # counts were carried as an extra "word"; peel them off (padding
    # rows got the 0xFFFFFFFF fill -- harmless, their first word is
    # SENTINEL so they are dropped in the kernel)
    return words_sh[:-1], sid_sh, words_sh[-1].astype(np.int32)


def sharded_join_from_spectra(
    words_sh,
    sid_sh,
    counts_sh,
    abundance_min,
    abundance_max,
    *,
    mesh: Mesh,
    n_banks: int,
    simple: bool = False,
    complex_: bool = False,
    count_bits: int = 32,
) -> JoinStats:
    """Sharded variant of join_stats_from_spectra (checkpoint/resume
    path): every shard joins its spectrum rows, psum-reduced."""
    words_sh = tuple(words_sh)
    nw = len(words_sh)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            tuple(P("shards") for _ in range(nw)),
            P("shards"),
            P("shards"),
            P(),
            P(),
        ),
        out_specs=jax.tree.map(
            lambda _: P(), JoinStats(*[0] * len(JoinStats._fields))
        ),
    )
    def step(words, sid, counts, amin, amax):
        return join_stats_from_spectra(
            tuple(w[0] for w in words),
            sid[0],
            counts[0],
            amin,
            amax,
            n_banks=n_banks,
            simple=simple,
            complex_=complex_,
            count_bits=count_bits,
            vary_axes=("shards",),
            psum_axis="shards",
        )

    return step(
        tuple(jnp.asarray(w) for w in words_sh),
        jnp.asarray(sid_sh),
        jnp.asarray(counts_sh),
        jnp.asarray(abundance_min, jnp.int32),
        jnp.asarray(abundance_max, jnp.int64),
    )
