"""Reference-fidelity Bloom `-filter` emulation (opt-in).

The reference's `-filter` interposes a Bloom filter in front of the
bottom-s heap: a k-mer instance whose Bloom lookup misses only inserts
its bits (it is not counted); the instance that finds all bits set
enters the count table at 2 (SimkaMinCount.hpp:341-382). The Bloom is
sized from `-max-memory`: ``max(maxMemory * MB * 8 / nbThreads,
10000)`` bits with 7 hash functions (SimkaMinCount.hpp:1155-1161).

Our default `-filter` applies the exact total-count >= 2 semantics
(deterministic, no false positives; minhash/sketch.py). This module is
the opt-in escape hatch (`-filter-bloom`) for users who need the
reference's *mechanism* -- approximate admission where a Bloom false
positive admits a singleton (with count occurrences+1) -- e.g. to
reproduce reference behavior on pathological inputs.

Memory: the Bloom is BIT-PACKED (n_bits/8 bytes, like the reference's
BloomCacheCoherent) and the instance stream is consumed in read
batches -- per-batch hash/index buffers are the only transient state,
so host memory stays O(bloom + sketch + batch) for arbitrarily large
samples (the reference's own bound, SimkaMinCount.hpp:311-382).

Fidelity bounds (documented divergence, PARITY.md): the reference's
``BloomCacheCoherent`` lives in the gatb-core submodule, which is
EMPTY in the reference tree -- its exact hash family and cache-line
block layout are not specifiable from the reference source. We
implement a plain Bloom over the same bit count with 7 murmur3-derived
hash functions of the canonical k-mer VALUE (gatb 2-bit encoding), and
replay the reference's exact per-instance control flow (heap-state-
dependent Bloom touches included). Bit-parity with a reference
`-filter` run is therefore not guaranteed -- only the admission
mechanism and its statistics are reproduced.
"""

from __future__ import annotations

import heapq
from typing import Tuple

import numpy as np

from simka_tpu.minhash.murmur import murmur3_u64

# 7 hash functions (SimkaMinCount.hpp:1160); seeds arbitrary-but-fixed
# (gatb-core's seed table is not in the reference tree).
_BLOOM_SEEDS = (
    0x9747B28C,
    0x41C64E6D,
    0x6C078965,
    0x3243F6A8,
    0x1F83D9AB,
    0x5BE0CD19,
    0x452821E6,
)


def bloom_bits_from_config(max_memory_mb: int, nb_cores: int) -> int:
    """Reference Bloom sizing: max(maxMemory*MB*8/threads, 10000)
    (SimkaMinCount.hpp:1158-1159). nb_cores=0 ("all") maps to 1
    thread here -- our sketcher is device-sequential, and dividing by
    a host-dependent core count would make output machine-dependent.
    """
    bits = (max_memory_mb * (1 << 20) * 8) // max(nb_cores, 1)
    return max(bits, 10000)


class BloomReplay:
    """Streaming replay of SelectKmersCommand::processFiltered
    (SimkaMinCount.hpp:341-382): feed instance batches in read order,
    then take the admitted sketch.

    The Bloom is only consulted while the heap is filling, or when the
    instance's hash beats the current heap top -- so which instances
    insert Bloom bits depends on the evolving heap state; the replay
    preserves that exactly. The bit array is packed 8 bits/byte (the
    reference's BloomCacheCoherent is bit-packed too; a bool-per-bit
    array would cost 8x the user's declared -max-memory budget).
    """

    def __init__(self, sketch_size: int, n_bits: int):
        self.sketch_size = sketch_size
        self.n_bits = n_bits
        self._bytes = np.zeros((n_bits + 7) // 8, np.uint8)
        self._counts: dict = {}
        self._heap: list = []  # max-heap of admitted hashes via negation

    def feed(self, hashes: np.ndarray, kmer_values: np.ndarray) -> None:
        """One read batch's instances, in stream order."""
        if len(hashes) == 0:
            return
        # [B, 7] bit positions, vectorized per batch; split into the
        # byte index and the in-byte mask for the packed array
        pos = np.empty((len(kmer_values), len(_BLOOM_SEEDS)), np.uint64)
        for j, s in enumerate(_BLOOM_SEEDS):
            pos[:, j] = murmur3_u64(kmer_values, s) % np.uint64(
                self.n_bits
            )
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit_mask = (
            np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
        )

        bits = self._bytes
        counts = self._counts
        heap = self._heap
        sketch_size = self.sketch_size
        h_list = hashes.tolist()  # python ints: fast loop + exact cmp
        for i, h in enumerate(h_list):
            if len(heap) < sketch_size:
                bi, bm = byte_idx[i], bit_mask[i]
                if ((bits[bi] & bm) == bm).all():
                    if h not in counts:
                        heapq.heappush(heap, -h)
                        counts[h] = 2
                    else:
                        counts[h] += 1
                else:
                    np.bitwise_or.at(bits, bi, bm)
            else:
                # strict <: equality with the top is dropped without
                # touching the Bloom (SimkaMinCount.hpp:361)
                if h < -heap[0]:
                    bi, bm = byte_idx[i], bit_mask[i]
                    if ((bits[bi] & bm) == bm).all():
                        if h not in counts:
                            evicted = -heapq.heappop(heap)
                            del counts[evicted]
                            heapq.heappush(heap, -h)
                            counts[h] = 2
                        else:
                            counts[h] += 1
                    else:
                        np.bitwise_or.at(bits, bi, bm)

    def result(self) -> Tuple[np.ndarray, np.ndarray]:
        """(hashes ascending uint64, counts uint32)."""
        counts = self._counts
        if not counts:
            return np.empty(0, np.uint64), np.empty(0, np.uint32)
        out_h = np.sort(
            np.fromiter(counts.keys(), np.uint64, len(counts))
        )
        out_c = np.array(
            [counts[int(h)] for h in out_h], np.uint32
        )
        return out_h, out_c


def replay_sketch_bloom(
    hashes: np.ndarray,
    kmer_values: np.ndarray,
    sketch_size: int,
    n_bits: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """One-shot replay over a full in-memory instance stream (tests /
    small inputs; the product path feeds batches via BloomReplay)."""
    rp = BloomReplay(sketch_size, n_bits)
    rp.feed(hashes, kmer_values)
    return rp.result()


def compute_sketch_bloom(
    seqs,
    kmer_size: int,
    sketch_size: int,
    seed: int,
    bloom_bits: int,
    batch_reads: int = 1 << 15,
) -> Tuple[np.ndarray, np.ndarray]:
    """Bottom-s sketch with the reference's Bloom admission mechanism.

    Hashing runs vectorized per read batch (murmur of the gatb-encoded
    canonical value, identical stream to the exact path); admission is
    the streaming replay above -- the per-instance stream is never
    materialized whole. k <= 31 only (single-word canonical values;
    the emulation needs the k-mer VALUE, not just its hash).
    """
    from itertools import islice

    import jax.numpy as jnp

    from simka_tpu.minhash.device import hash_kmer_words
    from simka_tpu.minhash.sketch import encode_batch_gatb
    from simka_tpu.ops.kmers import extract_canonical_kmers

    if kmer_size > 31:
        raise ValueError(
            "-filter-bloom emulation supports k <= 31 (needs single-"
            "word canonical k-mer values); use the default exact "
            "-filter for larger k"
        )

    k = kmer_size
    replay = BloomReplay(sketch_size, bloom_bits)
    it = iter(seqs() if callable(seqs) else seqs)
    while True:
        chunk = list(islice(it, batch_reads))
        if not chunk:
            break
        max_len = max((len(s) for s in chunk), default=k)
        width = -(-max(max_len, k) // 32) * 32
        codes, _ = encode_batch_gatb(chunk, max_len=width)
        hi, lo, _ = extract_canonical_kmers(jnp.asarray(codes), k, comp_xor=2)
        h, valid = hash_kmer_words(hi, lo, seed=seed)
        keep = np.asarray(valid).ravel()
        hashes = np.asarray(h).ravel()[keep]
        hi_n = np.asarray(hi).ravel()[keep].astype(np.uint64)
        lo_n = np.asarray(lo).ravel()[keep].astype(np.uint64)
        replay.feed(hashes, (hi_n << np.uint64(32)) | lo_n)
    return replay.result()
