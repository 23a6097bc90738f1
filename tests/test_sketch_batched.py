"""Coalesced multi-sample sketching (minhash/sketch.py
compute_sketches_batched) must equal the per-sample device path --
which is itself byte-parity-tested against the reference truth
(test_simkamin_parity) -- on every sample, including the full-sketch
h_max heap-quirk correction, -filter semantics, read caps and empty
samples."""

import os
import tempfile

import numpy as np
import pytest

from simka_tpu.io.packed import PackedReadSource
from simka_tpu.minhash.sketch import (
    compute_sketch,
    compute_sketches_batched,
)


def _write_sample(tmp, name, n_reads, read_len, rng, shared=None):
    bases = np.frombuffer(b"ACGT", np.uint8)
    path = os.path.join(tmp, name)
    with open(path, "wb") as f:
        for i in range(n_reads):
            if shared is not None and rng.random() < 0.3:
                seq = shared[rng.integers(0, len(shared))]
            else:
                seq = bases[rng.integers(0, 4, read_len)].tobytes()
            f.write(b">r%d\n" % i + seq + b"\n")
    return path


@pytest.fixture(scope="module")
def samples():
    rng = np.random.default_rng(17)
    bases = np.frombuffer(b"ACGT", np.uint8)
    tmp = tempfile.mkdtemp(prefix="sketch_batched_")
    shared = [
        bases[rng.integers(0, 4, 70)].tobytes() for _ in range(40)
    ]
    paths = [
        _write_sample(tmp, f"S{s}.fasta", 400, 70, rng, shared)
        for s in range(6)
    ]
    return paths


@pytest.mark.parametrize("use_filter", [False, True])
@pytest.mark.parametrize("sketch_size", [200, 10_000])
def test_batched_equals_per_sample(samples, use_filter, sketch_size):
    """sketch_size=200 forces FULL sketches (the per-sample h_max
    correction); 10_000 leaves them partial."""
    srcs = [PackedReadSource([[p]], encoding="gatb") for p in samples]
    out = compute_sketches_batched(
        srcs, 21, sketch_size, 100, use_filter=use_filter
    )
    assert out is not None
    for i, src in enumerate(srcs):
        h, c = compute_sketch(src, 21, sketch_size, 100, use_filter)
        assert np.array_equal(h, out[i][0]), i
        assert np.array_equal(c, out[i][1]), i


def test_batched_respects_max_reads(samples):
    srcs = [
        PackedReadSource([[p]], max_reads=100, encoding="gatb")
        for p in samples[:3]
    ]
    out = compute_sketches_batched(srcs, 21, 500, 100)
    assert out is not None
    for i, src in enumerate(srcs):
        h, c = compute_sketch(src, 21, 500, 100)
        assert np.array_equal(h, out[i][0]), i
        assert np.array_equal(c, out[i][1]), i


def test_batched_empty_sample(samples, tmp_path):
    # a sample with no valid k-mer window (reads shorter than k);
    # truly 0-byte files are rejected by the parser in BOTH paths
    empty = tmp_path / "empty.fasta"
    empty.write_bytes(b">r0\nACGT\n>r1\nNNNNN\n")
    srcs = [
        PackedReadSource([[p]], encoding="gatb")
        for p in [samples[0], str(empty), samples[1]]
    ]
    out = compute_sketches_batched(srcs, 21, 300, 100)
    assert out is not None
    assert len(out[1][0]) == 0
    for i in (0, 2):
        h, c = compute_sketch(srcs[i], 21, 300, 100)
        assert np.array_equal(h, out[i][0])
        assert np.array_equal(c, out[i][1])


def test_threshold_prefilter_is_exercised_and_exact(samples):
    """With s << estimated windows the bottom-s hash prefilter
    engages (verified via the internal threshold computation) and
    results must stay bit-identical to the per-sample path."""
    import simka_tpu.minhash.sketch as sk

    srcs = [PackedReadSource([[p]], encoding="gatb") for p in samples]
    est = min(sk._estimate_sample_windows(s) for s in srcs)
    s_small = max(1, int(est * 0.25 / 8) - 1)  # frac < 0.25
    out = compute_sketches_batched(srcs, 21, s_small, 100)
    assert out is not None
    for i, src in enumerate(srcs):
        h, c = compute_sketch(src, 21, s_small, 100)
        assert np.array_equal(h, out[i][0]), i
        assert np.array_equal(c, out[i][1]), i


def test_threshold_underfill_falls_back(samples, monkeypatch):
    """A wildly overestimated sample size shrinks the threshold past
    the true bottom-s; the trust check must detect it and signal the
    exact fallback rather than return a clipped sketch."""
    import simka_tpu.minhash.sketch as sk

    monkeypatch.setattr(
        sk, "_estimate_sample_windows", lambda src: 1 << 40
    )
    srcs = [PackedReadSource([[p]], encoding="gatb") for p in samples]
    assert compute_sketches_batched(srcs, 21, 500, 100) is None


def test_batched_bails_over_budget(samples, monkeypatch):
    """Totals past the HBM plan must signal the per-sample fallback
    (which has the O(s) streaming state) instead of OOMing."""
    import simka_tpu.minhash.sketch as sk

    monkeypatch.setattr(sk, "_batched_instance_limit", lambda: 1000)
    srcs = [PackedReadSource([[p]], encoding="gatb") for p in samples]
    assert compute_sketches_batched(srcs, 21, 300, 100) is None


def test_sketch_command_falls_back_on_bail(samples, monkeypatch, tmp_path):
    """sketch_command must still produce correct sketch files when the
    batched path bails mid-stream (per-sample streaming fallback)."""
    import simka_tpu.minhash.sketch as sk
    from simka_tpu.minhash.pipeline import sketch_command
    from simka_tpu.minhash.sketch_file import SketchFile

    input_txt = tmp_path / "input.txt"
    input_txt.write_text(
        "\n".join(f"S{i}: {p}" for i, p in enumerate(samples[:3]))
        + "\n"
    )
    ref_path = str(tmp_path / "ref.bin")
    sketch_command(str(input_txt), ref_path, 21, 400, 100,
                   verbose=False)

    monkeypatch.setattr(sk, "_batched_instance_limit", lambda: 1000)
    got_path = str(tmp_path / "got.bin")
    sketch_command(str(input_txt), got_path, 21, 400, 100,
                   verbose=False)
    a, b = SketchFile(ref_path), SketchFile(got_path)
    for i in range(3):
        ha, ca = a.read_slot(i)
        hb, cb = b.read_slot(i)
        assert np.array_equal(ha, hb), i
        assert np.array_equal(ca, cb), i
