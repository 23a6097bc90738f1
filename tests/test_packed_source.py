"""PackedReadSource (native parse+pack) must produce the exact window
stream of the Python read path -- including the per-group -max-reads
quirks -- so downstream statistics are byte-identical."""

import numpy as np
import pytest

import jax.numpy as jnp

from simka_tpu.io.bank import iter_dataset_reads
from simka_tpu.io.packed import PackedReadSource, host_pack_chunk
from simka_tpu.ops.kmers import SENTINEL, extract_packed


def _write_fasta(path, reads):
    with open(path, "wb") as f:
        for i, r in enumerate(reads):
            f.write(b">r%d\n%s\n" % (i, r))


@pytest.fixture()
def dataset(tmp_path):
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)

    def reads(n, lo=40, hi=90):
        out = []
        for _ in range(n):
            ln = int(rng.integers(lo, hi))
            r = bytearray(rng.choice(bases, size=ln))
            if rng.random() < 0.2:  # sprinkle Ns
                r[int(rng.integers(0, ln))] = ord("N")
            out.append(bytes(r))
        return out

    f1 = tmp_path / "a1.fasta"
    f2 = tmp_path / "a2.fasta"
    f3 = tmp_path / "b1.fasta"
    _write_fasta(f1, reads(37))
    _write_fasta(f2, reads(23))
    _write_fasta(f3, reads(41))
    # two ';'-groups: [f1, f2] and [f3]
    return [[str(f1), str(f2)], [str(f3)]]


def _kmer_multiset(packed_batches, k):
    """Sorted valid k-mer stream from packed batches; also checks the
    native per-batch valid-window count against extraction."""
    out = []
    for packed, vb, n, n_valid in packed_batches:
        hi, lo = extract_packed(
            jnp.asarray(packed), jnp.asarray(vb), k
        )
        hi = np.asarray(hi).ravel()
        lo = np.asarray(lo).ravel()
        keep = hi != np.uint32(0xFFFFFFFF)
        if n_valid is not None:
            # the native C window counter must agree with extraction
            assert int(keep.sum()) == n_valid
        out.append(
            (hi[keep].astype(np.uint64) << np.uint64(32))
            | lo[keep].astype(np.uint64)
        )
    vals = np.concatenate(out) if out else np.empty(0, np.uint64)
    return np.sort(vals)


@pytest.mark.parametrize("max_reads", [0, 1, 10, 25, 60, 1000])
@pytest.mark.parametrize("filters", [(0, 0.0), (50, 0.0), (0, 1.2)])
def test_native_packed_matches_python_stream(
    dataset, max_reads, filters
):
    min_size, min_shannon = filters
    k = 21
    src = PackedReadSource(
        dataset, min_size, min_shannon, max_reads=max_reads
    )
    native_kmers = _kmer_multiset(src.iter_packed(16, k=k), k)

    # python oracle: same reads -> host pack
    reads = list(
        iter_dataset_reads(dataset, min_size, min_shannon, max_reads)
    )
    batches = []
    for i in range(0, len(reads), 16):
        chunk = reads[i : i + 16]
        p, v = host_pack_chunk(chunk, k)
        batches.append((p, v, len(chunk), None))
    py_kmers = _kmer_multiset(batches, k)
    np.testing.assert_array_equal(native_kmers, py_kmers)

    # and the pure-python fallback of the source itself
    import os

    os.environ["SIMKA_TPU_NO_NATIVE"] = "1"
    try:
        fb_kmers = _kmer_multiset(src.iter_packed(16, k=k), k)
    finally:
        del os.environ["SIMKA_TPU_NO_NATIVE"]
    np.testing.assert_array_equal(fb_kmers, py_kmers)


def test_long_read_width_growth(tmp_path):
    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", np.uint8)
    reads = [
        bytes(rng.choice(bases, size=70)),
        bytes(rng.choice(bases, size=700)),  # forces width growth
        bytes(rng.choice(bases, size=70)),
    ]
    f = tmp_path / "x.fasta"
    _write_fasta(f, reads)
    src = PackedReadSource([[str(f)]])
    k = 21
    got = _kmer_multiset(src.iter_packed(8, k=k), k)
    p, v = host_pack_chunk(reads, k)
    ref = _kmer_multiset([(p, v, len(reads), None)], k)
    np.testing.assert_array_equal(got, ref)
