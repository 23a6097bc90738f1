"""Batched sketch-intersection distances on device.

The host path (minhash/distance.py) walks one pair at a time; this
module evaluates BATCHES of pairs with vmapped sorted-array ops --
the N x N sketch-distance matrix becomes a few device dispatches.

Semantics are identical to the reference walk
(SimkaMinDistance.hpp:215-258) via the union-rank formulation: the
walk processes exactly the union elements of rank <= processed where
processed = min(min(s1, s2), rank(t_exh)) and t_exh = min(maxA, maxB)
(the walk can only break while consuming the exhausted stream's last
element). For every element its union rank is

    rank(a_i) = (#A <= a_i) + (#B <= a_i) - (#shared <= a_i)

computable with searchsorted + prefix sums -- no merged array needed.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

UINT64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _pair_kernel(hA, cA, lA, hB, cB, lB):
    """One pair: padded ascending u64 hashes (pad = UINT64_MAX),
    counts, valid lengths. Returns (jaccard, braycurtis) float32."""
    s = hA.shape[0]
    idx = jnp.arange(s)
    validA = idx < lA
    validB = idx < lB

    # shared detection from the A side
    posB = jnp.searchsorted(hB, hA)  # [s]
    b_at = hB[jnp.clip(posB, 0, s - 1)]
    sharedA = validA & (posB < lB) & (b_at == hA)
    cB_of_A = cB[jnp.clip(posB, 0, s - 1)]

    # prefix counts of shared elements along A and along B
    pref_sharedA = jnp.cumsum(sharedA.astype(jnp.int32))  # at index i: #shared <= a_i
    # B-side shared flags: an element of B is shared iff found in A
    posA = jnp.searchsorted(hA, hB)
    a_at = hA[jnp.clip(posA, 0, s - 1)]
    sharedB = validB & (posA < lA) & (a_at == hB)
    pref_sharedB = jnp.cumsum(sharedB.astype(jnp.int32))

    # union rank of each element of A: #A<=a + #B<=a - #shared<=a
    # #B <= a_i: number of B elements <= a_i = searchsorted right
    leB_of_A = jnp.searchsorted(hB, hA, side="right")
    leB_of_A = jnp.minimum(leB_of_A, lB)
    rankA = (idx + 1) + leB_of_A - pref_sharedA
    leA_of_B = jnp.searchsorted(hA, hB, side="right")
    leA_of_B = jnp.minimum(leA_of_B, lA)
    rankB = (idx + 1) + leA_of_B - pref_sharedB

    L = jnp.minimum(lA, lB)
    # t_exh element = last valid element of the array with smaller max;
    # its union rank bounds the walk on stream exhaustion
    lastA = hA[jnp.clip(lA - 1, 0, s - 1)]
    lastB = hB[jnp.clip(lB - 1, 0, s - 1)]
    rank_exh = jnp.where(
        lastA <= lastB,
        rankA[jnp.clip(lA - 1, 0, s - 1)],
        rankB[jnp.clip(lB - 1, 0, s - 1)],
    )
    processed = jnp.minimum(L, rank_exh)

    inA = validA & (rankA <= processed)
    inB = validB & (rankB <= processed)
    shared_in = sharedA & (rankA <= processed)

    distinct = processed
    shared_distinct = jnp.sum(shared_in.astype(jnp.int64))
    nb_kmers = jnp.sum(
        jnp.where(inA, cA.astype(jnp.int64), 0)
    ) + jnp.sum(jnp.where(inB, cB.astype(jnp.int64), 0))
    shared_kmers = jnp.sum(
        jnp.where(
            shared_in,
            jnp.minimum(cA, cB_of_A).astype(jnp.int64),
            0,
        )
    )

    jaccard = jnp.where(
        distinct == 0,
        1.0,
        1.0 - shared_distinct.astype(jnp.float64) / jnp.maximum(distinct, 1),
    )
    braycurtis = jnp.where(
        nb_kmers == 0,
        1.0,
        1.0
        - (2.0 * shared_kmers.astype(jnp.float64))
        / jnp.maximum(nb_kmers, 1),
    )
    empty = (lA == 0) | (lB == 0)
    jaccard = jnp.where(empty, 1.0, jaccard)
    braycurtis = jnp.where(empty, 1.0, braycurtis)
    return jaccard.astype(jnp.float32), braycurtis.astype(jnp.float32)


_pair_batch = jax.jit(jax.vmap(_pair_kernel))


def pad_sketches(
    sketches: List[Tuple[np.ndarray, np.ndarray]], s: int
):
    """Left-align trimmed sketches into [N, s] arrays padded with
    UINT64_MAX hashes (greater than any real hash)."""
    n = len(sketches)
    H = np.full((n, s), UINT64_MAX, np.uint64)
    C = np.zeros((n, s), np.int32)
    L = np.zeros(n, np.int32)
    for i, (h, c) in enumerate(sketches):
        m = min(len(h), s)
        H[i, :m] = h[:m]
        C[i, :m] = c[:m]
        L[i] = m
    return H, C, L


def compute_distance_block_device(
    sketches1,
    sketches2,
    symmetric_diag_block: bool,
    pair_batch: int = 256,
):
    """Drop-in device replacement for
    minhash.distance.compute_distance_block."""
    s = max(
        [len(h) for h, _ in sketches1]
        + [len(h) for h, _ in sketches2]
        + [1]
    )
    s = 1 << (s - 1).bit_length()  # stable compile shape classes
    H1, C1, L1 = pad_sketches(sketches1, s)
    H2, C2, L2 = pad_sketches(sketches2, s)
    n1, n2 = len(sketches1), len(sketches2)

    pairs = []
    for i in range(n1):
        j0 = i + 1 if symmetric_diag_block else 0
        for j in range(j0, n2):
            pairs.append((i, j))
    jac = np.zeros((n1, n2), np.float32)
    bc = np.zeros((n1, n2), np.float32)
    for start in range(0, len(pairs), pair_batch):
        chunk = pairs[start : start + pair_batch]
        n_real = len(chunk)
        while len(chunk) < pair_batch and pairs:
            chunk = chunk + [pairs[0]]  # pad batch to a stable shape
        ii = np.array([p[0] for p in chunk])
        jj = np.array([p[1] for p in chunk])
        jv, bv = _pair_batch(
            jnp.asarray(H1[ii]),
            jnp.asarray(C1[ii]),
            jnp.asarray(L1[ii]),
            jnp.asarray(H2[jj]),
            jnp.asarray(C2[jj]),
            jnp.asarray(L2[jj]),
        )
        jv = np.asarray(jv)[:n_real]
        bv = np.asarray(bv)[:n_real]
        ii, jj = ii[:n_real], jj[:n_real]
        jac[ii, jj] = jv
        bc[ii, jj] = bv
        if symmetric_diag_block:
            jac[jj, ii] = jv
            bc[jj, ii] = bv
    return jac, bc
