"""Fused k-mer counting + cross-sample join + distance statistics.

This single XLA program replaces the reference's entire L2+L3 stack
(SURVEY.md §1): per-sample DSK counting (src/SimkaCount.cpp), the gz
partition files, the k-way merge heap (src/SimkaMerge.cpp:1189-1264)
and the pair-loop accumulators
(SimkaCountProcessorSimple::updateDistance*,
src/core/SimkaAlgorithm.hpp:341-631).

Design:
  1. one global sort of (kmer_hi, kmer_lo, sample) triples groups equal
     (kmer, sample) runs -> per-sample counts by run-length;
  2. the per-sample abundance filter (reference applies it at count
     time, MiniKC.hpp:56 -- order matters!) drops rows *before* the
     cross-sample join;
  3. a second sort over surviving rows groups equal k-mers across
     samples -> the abundance-vector join;
  4. chunked dense [R, n_banks] count blocks feed MXU matmuls
     (C^T@P, P^T@P) and VPU pair reductions.

Exactness: all reference accumulators are (surprisingly) exact integer
sums -- even `_hellinger_SqrtNiNj` and `_canberra` truncate into
u_int64_t on every += (SimkaDistance.hpp:105,111), so
hellinger contributes floor(sqrt(Ni*Nj)) per k-mer and canberra
degenerates to the closed form b+c (only the ratio==1.0 one-sided
events survive truncation). We reproduce those semantics bit-exactly,
which also makes every reduction order-independent -> deterministic
across chip counts (the reference's §4 invariance test).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from simka_tpu.ops.intmatmul import exact_int_matmul
from simka_tpu.ops.kmers import SENTINEL

LOG2 = 0.6931471805599453


class JoinStats(NamedTuple):
    """Raw sufficient statistics, all order-independent reductions.

    Fields mirror SimkaStatistics (src/core/SimkaDistance.hpp:68-139);
    pairwise arrays are kept as full [N, N] matrices here and flattened
    to the reference's symmetric layout only at output time.
    """

    nb_distinct: jnp.ndarray  # scalar: distinct k-mers in the union
    nb_shared: jnp.ndarray  # scalar: distinct k-mers in >= 2 banks
    distinct_per_bank: jnp.ndarray  # [N] i64 (_nbSolidDistinctKmersPerBank)
    solid_per_bank: jnp.ndarray  # [N] i64 (_nbSolidKmersPerBank)
    chord_n2_per_bank: jnp.ndarray  # [N] i64 (sum of count^2)
    shared_kmers: jnp.ndarray  # [N, N] i64 (_matrixNbSharedKmers, asym)
    shared_distinct: jnp.ndarray  # [N, N] i64 (sym; diag = distinct)
    bray_numerator: jnp.ndarray  # [N, N] i64 sum min(Ni, Nj), sym
    chord_ninj: jnp.ndarray  # [N, N] f64 sum Ni*Nj (simple)
    hellinger: jnp.ndarray  # [N, N] i64 sum floor(sqrt(Ni*Nj)) (simple)
    whittaker: jnp.ndarray  # [N, N] i64 int32-wrap emulated (complex)
    kullback_leibler: jnp.ndarray  # [N, N] f64 (complex)


def _suffix_min(x):
    return jnp.flip(jax.lax.cummin(jnp.flip(x)))


def _pair_terms(
    C, K, simple: bool, complex_: bool, sub_rows: int, vary_axes: tuple = ()
):
    """Elementwise per-pair reductions over one dense [R, N] chunk.

    Returns dict of [N, N] accumulators. Upper-triangle semantics are
    applied later; these matrices are computed densely (diag included,
    excluded at finalize).
    """
    R, N = C.shape
    n_sub = -(-R // sub_rows)
    pad = n_sub * sub_rows - R
    if pad:
        C = jnp.pad(C, ((0, pad), (0, 0)))

    def body(s, acc):
        Cs = jax.lax.dynamic_slice_in_dim(C, s * sub_rows, sub_rows, axis=0)
        Ci = Cs[:, :, None].astype(jnp.int64)  # [r, N, 1]
        Cj = Cs[:, None, :].astype(jnp.int64)  # [r, 1, N]
        both = (Ci > 0) & (Cj > 0)

        out = dict(acc)
        mins = jnp.minimum(Ci, Cj)
        out["bray"] = acc["bray"] + jnp.sum(mins, axis=0)

        if simple:
            prod = (Ci * Cj).astype(jnp.float64)
            # floor() matches the reference's per-step truncation of
            # sqrt(double) into u_int64_t (SimkaAlgorithm.hpp:397).
            hell = jnp.floor(jnp.sqrt(prod)).astype(jnp.int64)
            out["hellinger"] = acc["hellinger"] + jnp.sum(
                jnp.where(both, hell, 0), axis=0
            )

        if complex_:
            union = (Ci > 0) | (Cj > 0)
            Ki = K[None, :, None].astype(jnp.float64)
            Kj = K[None, None, :].astype(jnp.float64)
            Cif = Ci.astype(jnp.float64)
            Cjf = Cj.astype(jnp.float64)

            # Whittaker: the reference computes
            # abs((int)((u64)(Ni*Kj) - (u64)(Nj*Ki)))
            # (SimkaAlgorithm.hpp:481) -- i.e. the difference wraps to
            # 32-bit signed. Emulate via low-32-bit arithmetic on the
            # rounded double products.
            p1 = jnp.mod(Cif * Kj, 2.0**32)
            p2 = jnp.mod(Cjf * Ki, 2.0**32)
            low = jnp.mod(p1 - p2, 2.0**32).astype(jnp.int64)
            wrapped = jnp.where(low >= 2**31, low - 2**32, low)
            out["whittaker"] = acc["whittaker"] + jnp.sum(
                jnp.where(union, jnp.abs(wrapped), 0), axis=0
            )

            # Jensen-Shannon sufficient sum (SimkaAlgorithm.hpp:437-506):
            # xY = Ni*Kj, yX = Nj*Ki;
            # d1 = (Ni/Ki) * log(2*xY / (xY + yX)) when Ni > 0
            # d2 = (Nj/Kj) * log(2*yX / (xY + yX)) when Nj > 0
            # (single-presence collapses to (N/K)*log 2).
            xY = Cif * Kj
            yX = Cjf * Ki
            denom = xY + yX
            safe = jnp.where(union, denom, 1.0)
            d1 = jnp.where(
                Ci > 0, (Cif / Ki) * jnp.log(2.0 * xY / safe), 0.0
            )
            d2 = jnp.where(
                Cj > 0, (Cjf / Kj) * jnp.log(2.0 * yX / safe), 0.0
            )
            out["kl"] = acc["kl"] + jnp.sum(
                jnp.where(union, d1 + d2, 0.0), axis=0
            )
        return out

    acc = {
        "bray": jnp.zeros((N, N), jnp.int64),
        "hellinger": jnp.zeros((N, N), jnp.int64),
        "whittaker": jnp.zeros((N, N), jnp.int64),
        "kl": jnp.zeros((N, N), jnp.float64),
    }
    if vary_axes:
        acc = jax.tree.map(lambda x: jax.lax.pvary(x, vary_axes), acc)
    return jax.lax.fori_loop(0, n_sub, body, acc)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_banks",
        "simple",
        "complex_",
        "chunk_rows",
        "sub_rows",
        "vary_axes",
        "psum_axis",
    ),
)
def count_join_stats(
    hi,
    lo,
    sid,
    abundance_min,
    abundance_max,
    *,
    n_banks: int,
    simple: bool = False,
    complex_: bool = False,
    chunk_rows: int = 1 << 18,
    sub_rows: int = 0,
    vary_axes: tuple = (),
    psum_axis: str = "",
) -> JoinStats:
    """Compute all distance sufficient statistics for one k-mer shard.

    Args:
      hi, lo: uint32 [E] canonical k-mer words (SENTINEL = invalid).
      sid: int32 [E] sample index per k-mer instance.
      abundance_min/max: per-sample solidity bounds (traced scalars;
        reference filter at MiniKC.hpp:56: keep amin <= c <= amax).
      n_banks: number of samples N (static).
    """
    E = hi.shape[0]
    if chunk_rows <= n_banks:
        raise ValueError("chunk_rows must exceed n_banks")
    if not sub_rows:
        # bound the [sub, N, N] pair-broadcast to ~4M elements
        sub_rows = max(256, min(chunk_rows, (1 << 22) // (n_banks * n_banks)))
    idx = jnp.arange(E, dtype=jnp.int32)

    # ---- pass 1: group (kmer, sample) -> per-sample counts ----
    hi, lo, sid = jax.lax.sort((hi, lo, sid), num_keys=3)
    prev_same = (
        (hi[1:] == hi[:-1]) & (lo[1:] == lo[:-1]) & (sid[1:] == sid[:-1])
    )
    boundary = jnp.concatenate([jnp.array([True]), ~prev_same])
    real = hi != SENTINEL

    starts_after = jnp.concatenate(
        [jnp.where(boundary, idx, E)[1:], jnp.array([E], jnp.int32)]
    )
    next_start = _suffix_min(starts_after)
    count = next_start - idx  # valid at boundary positions

    kept = (
        boundary
        & real
        & (count >= abundance_min)
        & (count <= abundance_max)
    )

    count64 = count.astype(jnp.int64)
    sid_clip = jnp.where(kept, sid, n_banks)
    distinct_per_bank = jax.ops.segment_sum(
        jnp.where(kept, 1, 0).astype(jnp.int64), sid_clip, n_banks + 1
    )[:n_banks]
    solid_per_bank = jax.ops.segment_sum(
        jnp.where(kept, count64, 0), sid_clip, n_banks + 1
    )[:n_banks]
    chord_n2_per_bank = jax.ops.segment_sum(
        jnp.where(kept, count64 * count64, 0), sid_clip, n_banks + 1
    )[:n_banks]

    if psum_axis:
        # running under shard_map over disjoint k-mer hash ranges:
        # per-bank totals must be GLOBAL before the pair terms use
        # them (the reference's merge reads whole-sample counts from
        # the count_synchro metadata, SimkaDistance.cpp:114-152 --
        # Whittaker and Kullback-Leibler depend on them)
        distinct_per_bank = jax.lax.psum(distinct_per_bank, psum_axis)
        solid_per_bank = jax.lax.psum(solid_per_bank, psum_axis)
        chord_n2_per_bank = jax.lax.psum(chord_n2_per_bank, psum_axis)

    # ---- pass 2: group surviving rows by kmer (the join) ----
    hi2 = jnp.where(kept, hi, SENTINEL)
    lo2 = jnp.where(kept, lo, SENTINEL)
    hi2, lo2, sid2, cnt2 = jax.lax.sort(
        (hi2, lo2, sid, count), num_keys=2
    )
    kept2 = hi2 != SENTINEL
    newk = jnp.concatenate(
        [
            jnp.array([True]),
            (hi2[1:] != hi2[:-1]) | (lo2[1:] != lo2[:-1]),
        ]
    ) & kept2
    seg = jnp.cumsum(newk.astype(jnp.int32)) - 1
    seg_e = jnp.where(kept2, seg, E)
    n_distinct = jnp.max(jnp.where(kept2, seg, -1)) + 1

    seg_len = jax.ops.segment_sum(
        kept2.astype(jnp.int32), jnp.where(kept2, seg, 0), E
    )
    # segment 0 may have absorbed masked rows' zeros only; lengths are
    # exact because masked rows contribute 0.
    n_shared = jnp.sum(seg_len >= 2)

    # ---- pass 3: entry-chunked dense accumulation ----
    # Chunks cover a fixed number of ENTRIES (not segments), truncated
    # to whole segments: the boundary segment (possibly split by the
    # window edge) is deferred to the next chunk. Each segment has
    # <= n_banks entries, so every chunk advances by at least
    # chunk_rows - n_banks entries; with chunk_rows >> n_banks the
    # number of sequential loop steps is ~E/chunk_rows.
    S = chunk_rows
    n_kept = jnp.sum(kept2).astype(jnp.int32)
    padk = jnp.full((S + 1,), E, jnp.int32)
    seg_p = jnp.concatenate([seg_e, padk])
    sid_p = jnp.concatenate([sid2, jnp.zeros((S + 1,), sid2.dtype)])
    cnt_p = jnp.concatenate([cnt2, jnp.zeros((S + 1,), cnt2.dtype)])

    N = n_banks

    def chunk_body(state):
        start, acc = state
        base = jax.lax.dynamic_index_in_dim(
            seg_p, start, keepdims=False
        )
        # first segment NOT fully inside the window
        bound = jax.lax.dynamic_index_in_dim(
            seg_p, start + S, keepdims=False
        )
        e_seg = jax.lax.dynamic_slice_in_dim(seg_p, start, S)
        e_sid = jax.lax.dynamic_slice_in_dim(sid_p, start, S)
        e_cnt = jax.lax.dynamic_slice_in_dim(cnt_p, start, S)
        in_rng = (e_seg >= base) & (e_seg < bound)
        row = jnp.where(in_rng, e_seg - base, 0)
        col = jnp.where(in_rng, e_sid, 0)
        C = jnp.zeros((S, N), jnp.int32).at[row, col].add(
            jnp.where(in_rng, e_cnt, 0)
        )
        P = (C > 0).astype(jnp.int32)

        acc = dict(acc)
        acc["shared_kmers"] = acc["shared_kmers"] + exact_int_matmul(
            C, P, a_bits=32, b_bits=1
        )
        acc["shared_distinct"] = acc["shared_distinct"] + exact_int_matmul(
            P, P, a_bits=1, b_bits=1
        )
        if simple:
            acc["chord"] = acc["chord"] + jnp.einsum(
                "ri,rj->ij",
                C.astype(jnp.float64),
                C.astype(jnp.float64),
            )
        pt = _pair_terms(
            C, solid_per_bank, simple, complex_, sub_rows, vary_axes
        )
        acc["bray"] = acc["bray"] + pt["bray"]
        acc["hellinger"] = acc["hellinger"] + pt["hellinger"]
        acc["whittaker"] = acc["whittaker"] + pt["whittaker"]
        acc["kl"] = acc["kl"] + pt["kl"]

        next_start = jnp.searchsorted(seg_e, bound).astype(jnp.int32)
        return next_start, acc

    def chunk_cond(state):
        start, _ = state
        return start < n_kept

    acc0 = {
        "shared_kmers": jnp.zeros((N, N), jnp.int64),
        "shared_distinct": jnp.zeros((N, N), jnp.int64),
        "bray": jnp.zeros((N, N), jnp.int64),
        "chord": jnp.zeros((N, N), jnp.float64),
        "hellinger": jnp.zeros((N, N), jnp.int64),
        "whittaker": jnp.zeros((N, N), jnp.int64),
        "kl": jnp.zeros((N, N), jnp.float64),
    }
    if vary_axes:
        # under shard_map the loop body mixes in device-varying data;
        # the initial carry must carry the same varying axes
        acc0 = jax.tree.map(
            lambda x: jax.lax.pvary(x, vary_axes), acc0
        )
    start0 = jnp.int32(0)
    if vary_axes:
        start0 = jax.lax.pvary(start0, vary_axes)
    _, acc = jax.lax.while_loop(chunk_cond, chunk_body, (start0, acc0))

    out = JoinStats(
        nb_distinct=n_distinct.astype(jnp.int64),
        nb_shared=n_shared.astype(jnp.int64),
        distinct_per_bank=distinct_per_bank,
        solid_per_bank=solid_per_bank,
        chord_n2_per_bank=chord_n2_per_bank,
        shared_kmers=acc["shared_kmers"],
        shared_distinct=acc["shared_distinct"],
        bray_numerator=acc["bray"],
        chord_ninj=acc["chord"],
        hellinger=acc["hellinger"],
        whittaker=acc["whittaker"],
        kullback_leibler=acc["kl"],
    )
    if psum_axis:
        # per-bank totals are already global (psum'd above); everything
        # else is additive over disjoint shards
        out = out._replace(
            nb_distinct=jax.lax.psum(out.nb_distinct, psum_axis),
            nb_shared=jax.lax.psum(out.nb_shared, psum_axis),
            shared_kmers=jax.lax.psum(out.shared_kmers, psum_axis),
            shared_distinct=jax.lax.psum(out.shared_distinct, psum_axis),
            bray_numerator=jax.lax.psum(out.bray_numerator, psum_axis),
            chord_ninj=jax.lax.psum(out.chord_ninj, psum_axis),
            hellinger=jax.lax.psum(out.hellinger, psum_axis),
            whittaker=jax.lax.psum(out.whittaker, psum_axis),
            kullback_leibler=jax.lax.psum(out.kullback_leibler, psum_axis),
        )
    return out
