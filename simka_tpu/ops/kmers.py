"""Canonical k-mer extraction as a fused XLA program.

Replaces gatb-core's ``Kmer<span>::ModelCanonical`` per-sequence
iterators (used by the reference at src/minikc/MiniKC.hpp:150-233 and
via DSK) with a vectorized formulation: every window position of every
read is computed in parallel on the VPU.

K-mers are (hi, lo) uint32 pairs holding the 2k-bit value (k <= 31), so
no 64-bit integer support is needed anywhere on the hot path. The
canonical form is min(forward, revcomp) compared lexicographically on
(hi, lo) -- same equivalence classes as the reference regardless of the
base-encoding convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SENTINEL = jnp.uint32(0xFFFFFFFF)


@functools.partial(jax.jit, static_argnames=("k", "comp_xor"))
def extract_canonical_kmers(codes, k: int, comp_xor: int = 3):
    """Extract all canonical k-mers from a batch of encoded reads.

    Args:
      codes: uint8 [B, L] base codes (0..3; INVALID_CODE=255 for
        non-ACGT and padding).
      k: k-mer size (1..31), static.
      comp_xor: XOR mask realizing base complement in the chosen
        encoding: 3 for A=0,C=1,G=2,T=3 (ours); 2 for gatb-core's
        A=0,C=1,T=2,G=3 (needed when k-mer VALUES must match gatb,
        e.g. SimkaMin murmur hashing).

    Returns:
      (hi, lo, valid): uint32 [B, W], uint32 [B, W], bool [B, W] with
      W = L - k + 1. Windows touching any invalid base are invalid.
      Invalid positions have hi = lo = SENTINEL so that a (hi, lo)
      ascending sort pushes them past every real k-mer (real k-mers
      have hi < 2**30 for k <= 31).
    """
    B, L = codes.shape
    if L < k:
        raise ValueError(f"read window {L} shorter than k={k}")
    W = L - k + 1

    invalid = (codes >= 4).astype(jnp.int32)
    # windows[i] = codes[:, i : i + W]
    c32 = codes.astype(jnp.uint32)

    fwd_hi = jnp.zeros((B, W), jnp.uint32)
    fwd_lo = jnp.zeros((B, W), jnp.uint32)
    rc_hi = jnp.zeros((B, W), jnp.uint32)
    rc_lo = jnp.zeros((B, W), jnp.uint32)
    # Horner over the k window offsets, fully vectorized over [B, W].
    # forward value = sum_i base[i] * 4^(k-1-i); revcomp value
    # = sum_i (3 - base[i]) * 4^i, i.e. the same Horner walked backwards.
    for i in range(k):
        b_f = jax.lax.dynamic_slice_in_dim(c32, i, W, axis=1) & 3
        b_r = (
            jax.lax.dynamic_slice_in_dim(c32, k - 1 - i, W, axis=1) & 3
        ) ^ comp_xor
        fwd_hi = (fwd_hi << 2) | (fwd_lo >> 30)
        fwd_lo = (fwd_lo << 2) | b_f
        rc_hi = (rc_hi << 2) | (rc_lo >> 30)
        rc_lo = (rc_lo << 2) | b_r

    take_fwd = (fwd_hi < rc_hi) | ((fwd_hi == rc_hi) & (fwd_lo <= rc_lo))
    hi = jnp.where(take_fwd, fwd_hi, rc_hi)
    lo = jnp.where(take_fwd, fwd_lo, rc_lo)

    # validity: no invalid base among the k window bases. Prefix sums
    # give the per-window invalid count in O(L).
    cum = jnp.cumsum(invalid, axis=1)
    cum = jnp.pad(cum, ((0, 0), (1, 0)))
    bad_in_window = (
        jax.lax.dynamic_slice_in_dim(cum, k, W, axis=1)
        - jax.lax.dynamic_slice_in_dim(cum, 0, W, axis=1)
    ) > 0
    valid = ~bad_in_window

    hi = jnp.where(valid, hi, SENTINEL)
    lo = jnp.where(valid, lo, SENTINEL)
    return hi, lo, valid


def kmer_shannon_index(hi, lo, k: int):
    """Per-k-mer Shannon index over the 4 base frequencies.

    Mirrors SimkaCountProcessorSimple::getShannonIndex
    (src/core/SimkaAlgorithm.hpp:634-658). Inert in the reference's
    live path (the call site is commented out) but exposed for the
    -kmer-shannon-index option.
    """
    hi = hi.astype(jnp.uint32)
    lo = lo.astype(jnp.uint32)
    counts = []
    for base in range(4):
        cnt = jnp.zeros(hi.shape, jnp.float32)
        for i in range(k):
            bits = 2 * i
            if bits < 32:
                code = (lo >> bits) & 3
            else:
                code = (hi >> (bits - 32)) & 3
            cnt = cnt + (code == base).astype(jnp.float32)
        counts.append(cnt)
    freqs = jnp.stack(counts, axis=-1) / jnp.float32(k)
    logf = jnp.where(freqs > 0, jnp.log(freqs) / jnp.log(2.0), 0.0)
    return jnp.abs(jnp.sum(freqs * logf, axis=-1))


def mix_hash(hi, lo):
    """Cheap 32-bit mix of a (hi, lo) k-mer for shard routing.

    Plays the role of the reference's minimizer->partition Repartitor
    (src/SimkaPotara.hpp:713-723): any fixed hash that all samples
    share yields mergeable shards; uniformity replaces the sampled
    balancing table.
    """
    h = (hi ^ jnp.uint32(0x9E3779B9)) * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = (h ^ lo) * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h
