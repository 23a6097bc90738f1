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


def test_fastq_gz_packed_matches_python(tmp_path):
    """FASTQ and gzip inputs through the native packed reader must
    yield the same k-mer multiset as the Python stream."""
    import gzip

    rng = np.random.default_rng(19)
    bases = np.frombuffer(b"ACGT", np.uint8)
    reads = [
        bytes(rng.choice(bases, size=int(rng.integers(40, 90))))
        for _ in range(60)
    ]
    fq = tmp_path / "x.fastq"
    with open(fq, "wb") as f:
        for i, r in enumerate(reads):
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, r, b"I" * len(r)))
    fqgz = tmp_path / "x.fastq.gz"
    with open(fq, "rb") as src, gzip.open(fqgz, "wb") as dst:
        dst.write(src.read())

    k = 21
    p, v = host_pack_chunk(reads, k)
    ref = _kmer_multiset([(p, v, len(reads), None)], k)
    for path in (fq, fqgz):
        src = PackedReadSource([[str(path)]])
        got = _kmer_multiset(src.iter_packed(16, k=k), k)
        np.testing.assert_array_equal(got, ref, err_msg=str(path))


def test_multiword_k_through_packed_pipeline(tmp_path):
    """k=63 (multi-word) end-to-end through run_simka's default path,
    which now ingests via native packed batches: must match the
    list-based compute_statistics result bit-for-bit."""
    import gzip

    from simka_tpu.config import SimkaConfig
    from simka_tpu.core.pipeline import compute_statistics, run_simka

    rng = np.random.default_rng(29)
    bases = np.frombuffer(b"ACGT", np.uint8)
    samples = []
    paths = []
    for si in range(2):
        reads = [bytes(rng.choice(bases, size=90)) for _ in range(80)]
        samples.append(reads)
        f = tmp_path / f"s{si}.fasta"
        with open(f, "wb") as fh:
            for i, r in enumerate(reads):
                fh.write(b">r%d\n%s\n" % (i, r))
        paths.append(f)
    inp = tmp_path / "input.txt"
    inp.write_text("".join(f"S{i}: {p}\n" for i, p in enumerate(paths)))

    ref_stats = compute_statistics(
        samples,
        ["S0", "S1"],
        SimkaConfig(kmer_size=63, abundance_min=1, verbose=False, n_shards=1),
    )

    out = tmp_path / "out"
    run_simka(
        SimkaConfig(
            input_filename=str(inp),
            output_dir=str(out),
            kmer_size=63,
            abundance_min=1,
            verbose=False,
            n_shards=1,
        )
    )
    # the pipeline's matrices derive from the same accumulators;
    # compare the bray-curtis matrix against one recomputed from the
    # reference stats
    from simka_tpu.core.distances import compute_all_matrices

    ref_mats = compute_all_matrices(ref_stats)
    got = gzip.open(
        out / "mat_abundance_braycurtis.csv.gz", "rt"
    ).read()
    from simka_tpu.core.output import format_matrix_csv

    want = format_matrix_csv(
        ref_mats["mat_abundance_braycurtis"], ["S0", "S1"]
    )
    assert got == want
