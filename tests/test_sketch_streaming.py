"""Streaming (super-batched) SimkaMin sketch must equal the one-shot
device sketch and the host oracle exactly -- including the
streaming-heap count quirk of the largest member (VERDICT r3 weak #3 /
next-step 5)."""

import numpy as np
import pytest

from simka_tpu.minhash.sketch import _compute_sketch_host, compute_sketch


def _reads(rng, n_reads, length=60):
    return [
        bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=length))
        for _ in range(n_reads)
    ]


@pytest.mark.parametrize("s", [50, 500, 10**6])
@pytest.mark.parametrize("threshold", [1, 5000])
def test_streaming_matches_oneshot(s, threshold, monkeypatch):
    """Force tiny super-batches (threshold=1 folds every read batch;
    5000 folds every few) across many small read batches: hashes AND
    counts must match the unstreamed path bit-for-bit. s=50 exercises
    the full-heap h_max correction across batch boundaries; s=1e6
    the not-full path."""
    rng = np.random.default_rng(17)
    # duplicate reads so counts > 1 and h_max occurrences span batches
    base = _reads(rng, 120)
    reads = base + base[::-1] + _reads(rng, 80) + base[::3]
    k, seed = 15, 100

    ref_h, ref_c = compute_sketch(reads, k, s, seed)
    oracle_h, oracle_c = _compute_sketch_host(reads, k, s, seed)
    np.testing.assert_array_equal(ref_h, oracle_h)
    np.testing.assert_array_equal(ref_c, oracle_c)

    monkeypatch.setenv("SIMKA_TPU_SKETCH_STREAM_WINDOWS", str(threshold))
    got_h, got_c = compute_sketch(reads, k, s, seed, batch_reads=16)
    np.testing.assert_array_equal(ref_h, got_h)
    np.testing.assert_array_equal(ref_c, got_c)


def test_streaming_filter_falls_back_to_host(monkeypatch):
    """-filter needs global counts an O(s) state cannot bound: the
    oversized path must route through the host-exact sketcher and
    still match."""
    rng = np.random.default_rng(23)
    base = _reads(rng, 100)
    reads = base + base  # every k-mer passes the >=2 filter
    k, seed, s = 15, 100, 80
    ref_h, ref_c = compute_sketch(reads, k, s, seed, use_filter=True)
    monkeypatch.setenv("SIMKA_TPU_SKETCH_STREAM_WINDOWS", "1")
    got_h, got_c = compute_sketch(
        reads, k, s, seed, use_filter=True, batch_reads=16
    )
    np.testing.assert_array_equal(ref_h, got_h)
    np.testing.assert_array_equal(ref_c, got_c)


def test_streaming_pipeline_truth_parity(tmp_path, monkeypatch):
    """One full simkaMin truth config byte-exact with streaming forced
    (tiny super-batches): the sketch path end-to-end."""
    import os

    from simka_tpu.core.output import format_matrix_csv
    from simka_tpu.minhash.pipeline import run_simka_min

    REF = "/root/reference"
    truth_dir = f"{REF}/tests/simkaMin/truth_simkaMin_symetrical/k21__0-1000_n0"
    if not os.path.isdir(truth_dir):
        pytest.skip("no truth dir")
    monkeypatch.setenv("SIMKA_TPU_SKETCH_STREAM_WINDOWS", "2000")
    out = str(tmp_path / "out")
    run_simka_min(
        f"{REF}/example/simka_input.txt",
        out,
        kmer_size=21,
        sketch_size=1000,
        max_reads=0,
        verbose=False,
    )
    for name in (
        "mat_abundance_braycurtis",
        "mat_presenceAbsence_jaccard",
    ):
        with open(os.path.join(truth_dir, name + ".csv")) as f:
            truth = f.read()
        import gzip

        with gzip.open(
            os.path.join(out, name + ".csv.gz"), "rt"
        ) as f:
            got = f.read()
        assert got == truth, name
