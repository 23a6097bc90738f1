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

from simka_tpu.ops.countjoin import JoinStats, count_join_stats
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
    hi: np.ndarray,
    lo: np.ndarray,
    sid: np.ndarray,
    n_shards: int,
    pad_multiple: int = 1024,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Route k-mer instances to shards by hash (host-side, exact).

    All instances of a given k-mer land on the same shard, which is the
    property that makes per-shard counting exact (the reference gets it
    from the shared Repartitor, src/SimkaCount.cpp:218-228).

    Returns [n_shards, E_shard] arrays padded with SENTINEL rows.
    """
    valid = hi != np.uint32(0xFFFFFFFF)
    shard = np.where(valid, _mix_hash_np(hi, lo) % n_shards, 0).astype(
        np.int64
    )
    # stable bucket sort by shard; invalid rows are dropped here (they
    # carry no information)
    shard = np.where(valid, shard, n_shards)
    order = np.argsort(shard, kind="stable")
    shard_sorted = shard[order]
    counts = np.bincount(shard_sorted, minlength=n_shards + 1)[:n_shards]
    cap = int(counts.max()) if len(counts) else 0
    cap = max(pad_multiple, -(-cap // pad_multiple) * pad_multiple)

    out_hi = np.full((n_shards, cap), 0xFFFFFFFF, np.uint32)
    out_lo = np.full((n_shards, cap), 0xFFFFFFFF, np.uint32)
    out_sid = np.zeros((n_shards, cap), np.int32)
    start = 0
    for s in range(n_shards):
        n = int(counts[s])
        sel = order[start : start + n]
        out_hi[s, :n] = hi[sel]
        out_lo[s, :n] = lo[sel]
        out_sid[s, :n] = sid[sel]
        start += n
    return out_hi, out_lo, out_sid


def sharded_count_join_stats(
    hi_sh,
    lo_sh,
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

    Inputs are [n_shards, E_shard] arrays laid out along the mesh's
    'shards' axis. Every JoinStats field is additive over disjoint
    k-mer sets, so a single psum yields the global statistics.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("shards"), P("shards"), P("shards"), P(), P()),
        out_specs=jax.tree.map(lambda _: P(), JoinStats(*[0] * len(JoinStats._fields))),
    )
    def step(hi, lo, sid, amin, amax):
        # psum_axis makes the per-bank totals global BEFORE the pair
        # terms consume them, then reduces every pairwise accumulator
        return count_join_stats(
            hi[0],
            lo[0],
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
        jnp.asarray(hi_sh),
        jnp.asarray(lo_sh),
        jnp.asarray(sid_sh),
        jnp.asarray(abundance_min, jnp.int32),
        jnp.asarray(abundance_max, jnp.int64),
    )
