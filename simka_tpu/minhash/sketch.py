"""Sketch computation: seeded bottom-s MinHash with abundances.

Reference: SelectKmersCommand (src/simkaMin/SimkaMinCount.hpp:89-384).
The reference maintains a streaming max-heap of the s smallest murmur
hashes. Analysis of the update rule shows:

- membership is order-independent: any hash in the final sketch
  entered on its first (non-filter) occurrence and was never evicted
  (the heap top only decreases), so the sketch is exactly the s
  smallest distinct hashes;
- counts are total occurrence counts EXCEPT for one element: an
  occurrence is silently dropped when the heap is full and the hash
  equals the current top (the `kmerHashed < top` test at
  SimkaMinCount.hpp:324 excludes equality). Only the final sketch's
  LARGEST member can ever be the top of the full heap (the top
  decreases monotonically to it), so exactly one count needs a
  stream-order correction: occurrences of h_max arriving after every
  smaller member has entered are lost. That correction is a closed
  form over first-occurrence positions -- no sequential replay needed.

`-filter` divergence (documented): the reference interposes a Bloom
filter so only k-mers seen >= 2 times enter the sketch
(SimkaMinCount.hpp:341-382) -- approximately, with false positives
that depend on gatb-core's Bloom internals. We implement the exact
semantics (total count >= 2), which is deterministic and strictly more
accurate; byte parity with reference `-filter` runs is not guaranteed
when a Bloom false positive would have fired.

Hash input parity: the reference hashes the canonical k-mer VALUE in
gatb-core's 2-bit encoding (A=0,C=1,T=2,G=3; canonical = numeric min
under that encoding). We extract with the same encoding so hashes --
and hence sketch contents -- match exactly.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from simka_tpu.io.bank import encode_batch
from simka_tpu.ops.kmers import extract_canonical_kmers

# gatb-core base codes: (ascii >> 1) & 3 => A=0, C=1, T=2, G=3
_GATB_LUT = np.full(256, 255, dtype=np.uint8)
for _b, _c in zip(b"ACTG", range(4)):
    _GATB_LUT[_b] = _c
    _GATB_LUT[_b + 32] = _c


def encode_batch_gatb(seqs, max_len=None):
    codes, lengths = encode_batch(seqs, max_len=max_len)
    # remap our ACGT codes to gatb's ACTG ordering: 0,1,2,3 -> 0,1,3,2
    remap = np.array([0, 1, 3, 2], dtype=np.uint8)
    valid = codes < 4
    out = codes.copy()
    out[valid] = remap[codes[valid]]
    return out, lengths


def compute_sketch(
    seqs,
    kmer_size: int,
    sketch_size: int,
    seed: int,
    use_filter: bool = False,
    batch_reads: int = 1 << 15,
) -> Tuple[np.ndarray, np.ndarray]:
    """Bottom-s sketch of one sample.

    ``seqs``: list, iterator, or zero-arg provider of read byte
    strings (streamed in O(batch) host memory).

    Returns (hashes ascending uint64, counts uint32), length <= s.
    """
    from itertools import islice

    k = kmer_size
    hash_parts = []
    it = iter(seqs() if callable(seqs) else seqs)
    while True:
        chunk = list(islice(it, batch_reads))
        if not chunk:
            break
        max_len = max((len(s) for s in chunk), default=k)
        width = -(-max(max_len, k) // 32) * 32
        codes, _ = encode_batch_gatb(chunk, max_len=width)
        pad_b = -(-len(chunk) // 256) * 256 - len(chunk)
        if pad_b:
            codes = np.concatenate(
                [codes, np.full((pad_b, width), 255, np.uint8)]
            )
        import jax.numpy as jnp

        from simka_tpu.minhash.device import hash_kmer_words

        # comp_xor=2: gatb encoding complements A<->T (0<->2), C<->G (1<->3)
        hi, lo, _ = extract_canonical_kmers(
            jnp.asarray(codes), k, comp_xor=2
        )
        # hash ON DEVICE fused with the extraction output (bit-equal
        # to the host murmur; tests/test_minhash_device.py) -- the
        # round-2 host-numpy hash left the TPU idle for the most
        # parallel stage of the sketch (SimkaMinCount.hpp:248-250)
        h, valid = hash_kmer_words(hi, lo, seed=seed)
        h = np.asarray(h).ravel()
        hash_parts.append(h[np.asarray(valid).ravel()])
    if not hash_parts:
        return np.empty(0, np.uint64), np.empty(0, np.uint32)

    # per-INSTANCE hash stream in read order (the h_max correction
    # below depends on occurrence positions); grouping runs on device
    stream = np.concatenate(hash_parts)
    if len(stream) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint32)
    from simka_tpu.ops.spectrum import hash_spectrum

    uniq, counts, first_idx, second_idx = hash_spectrum(
        (stream >> np.uint64(32)).astype(np.uint32),
        (stream & np.uint64(0xFFFFFFFF)).astype(np.uint32),
    )

    entry_pos = first_idx
    base = 1
    if use_filter:
        # exact >= 2 semantics; a member's heap entry happens at its
        # SECOND occurrence (count initialized to 2,
        # SimkaMinCount.hpp:353)
        keep = counts >= 2
        uniq, counts = uniq[keep], counts[keep]
        entry_pos = second_idx[keep]
        base = 2

    if len(uniq) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint32)

    # uniq is already hash-ascending: the bottom-s sketch is a prefix
    s = min(sketch_size, len(uniq))
    hashes = uniq[:s].copy()
    out_counts = counts[:s].astype(np.int64)

    if len(uniq) >= sketch_size and s >= 1:
        # the largest member stops counting once every smaller member
        # has entered the (full) heap: from then on it IS the top and
        # `hash < top` fails (SimkaMinCount.hpp:324)
        h_max = hashes[s - 1]
        if s >= 2:
            t_last = int(entry_pos[: s - 1].max())
        else:
            t_last = 0
        n_before = int(np.count_nonzero(stream[:t_last] == h_max))
        out_counts[s - 1] = max(base, n_before)

    return hashes, out_counts.astype(np.uint32)
