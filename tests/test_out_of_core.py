"""HBM-budget-aware out-of-core execution (VERDICT r3 missing #1).

A synthetic input whose spectrum rows exceed a forced-small budget
(SIMKA_TPU_HBM_MB) must complete on BOTH the default single-device
path and the 8-shard mesh, identical to the in-memory result
(integer accumulators bit-exact; the double-float chord/KL channels
to the usual ~1e-7 panel-regrouping tolerance).
"""

import numpy as np
import pytest

from simka_tpu.config import SimkaConfig
from simka_tpu.core.pipeline import compute_statistics

FLOAT_ATTRS = ("chord_ninj", "kullback_leibler")
CHECK_ATTRS = (
    "nb_distinct_kmers",
    "nb_shared_kmers",
    "distinct_per_bank",
    "solid_per_bank",
    "chord_n2_per_bank",
    "shared_kmers",
    "shared_distinct",
    "bray_numerator",
    "chord_ninj",
    "hellinger",
    "whittaker",
    "kullback_leibler",
)


def _reads(rng, n_reads, length=80):
    return [
        bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=length))
        for _ in range(n_reads)
    ]


@pytest.fixture(scope="module")
def sample_sets():
    rng = np.random.default_rng(42)
    shared = _reads(rng, 120)
    return [
        shared[:80] + _reads(rng, 150),
        shared[40:] + _reads(rng, 150),
        shared[::2] + _reads(rng, 150),
        _reads(rng, 100),
    ]


def _stats_equal(a, b):
    for attr in CHECK_ATTRS:
        ga = np.asarray(getattr(a, attr))
        gb = np.asarray(getattr(b, attr))
        if attr in FLOAT_ATTRS:
            np.testing.assert_allclose(
                ga, gb, rtol=1e-6, atol=1e-10, err_msg=attr
            )
        else:
            np.testing.assert_array_equal(ga, gb, err_msg=attr)


def _config(n_shards):
    return SimkaConfig(
        kmer_size=21,
        abundance_min=1,
        simple_dist=True,
        complex_dist=True,
        verbose=False,
        n_shards=n_shards,
    )


@pytest.mark.parametrize("n_shards", [1, 8])
def test_forced_budget_matches_in_memory(
    sample_sets, n_shards, monkeypatch
):
    ids = ["A", "B", "C", "D"]
    ref = compute_statistics(sample_sets, ids, _config(n_shards))

    # ~1 MB plan: far below this input's instance stream, so the
    # mid-ingest guard trips and the sweep runs with several ranges
    monkeypatch.setenv("SIMKA_TPU_HBM_MB", "1")
    observer = {}
    log_lines = []
    got = compute_statistics(
        sample_sets, ids, _config(n_shards),
        log=log_lines.append, observer=observer,
    )
    # prove the guard fired and the sweep actually ran multi-range
    assert any("HBM budget" in m for m in log_lines), log_lines
    assert observer.get("sweep_ranges", 0) > 1, observer
    _stats_equal(ref, got)


@pytest.mark.parametrize("tier", ["device", "ram"])
def test_spill_tiers_match_in_memory(
    sample_sets, tier, monkeypatch
):
    """The DEVICE-resident spill tier (spectra stay in HBM; rows
    never cross the host link between count and join -- the round-5
    fix for the transfer-bound sweep) must produce identical
    statistics to the host-RAM tier and the in-memory join.
    Providers here lack .banks, so force the tier explicitly."""
    ids = ["A", "B", "C", "D"]
    ref = compute_statistics(sample_sets, ids, _config(1))

    monkeypatch.setenv("SIMKA_TPU_HBM_MB", "1")
    monkeypatch.setenv("SIMKA_TPU_SPILL", tier)
    log_lines = []
    observer = {}
    got = compute_statistics(
        sample_sets, ids, _config(1),
        log=log_lines.append, observer=observer,
    )
    want = "DeviceSpill" if tier == "device" else "RamSpill"
    assert any(want in m for m in log_lines), log_lines
    assert observer.get("sweep_ranges", 0) > 1, observer
    _stats_equal(ref, got)


def test_device_spill_with_packed_sources(tmp_path, monkeypatch):
    """The device tier's NATIVE count path (count_dataset_spectrum_device
    over PackedReadSource) must match the in-memory join -- the list
    providers above take the host-count branch and once hid a
    shadowed-import bug in the packed branch."""
    from simka_tpu.io.packed import PackedReadSource

    rng = np.random.default_rng(5)
    srcs, ids = [], []
    for name in "ABC":
        f = tmp_path / f"{name}.fasta"
        with open(f, "wb") as fh:
            for i, r in enumerate(_reads(rng, 150)):
                fh.write(b">r%d\n%s\n" % (i, r))
        srcs.append(PackedReadSource([[str(f)]]))
        ids.append(name)
    ref = compute_statistics(srcs, ids, _config(1))
    monkeypatch.setenv("SIMKA_TPU_HBM_MB", "1")
    monkeypatch.setenv("SIMKA_TPU_SPILL", "device")
    log_lines = []
    got = compute_statistics(
        srcs, ids, _config(1), log=log_lines.append
    )
    assert any("DeviceSpill" in m for m in log_lines), log_lines
    _stats_equal(ref, got)


def test_upfront_estimate_routes_out_of_core(tmp_path, monkeypatch):
    """run_simka's file-size estimate must route oversized runs
    straight out-of-core (no wasted ingest) and still byte-match the
    default-path matrices."""
    import gzip

    from simka_tpu.core.pipeline import run_simka

    rng = np.random.default_rng(7)
    inputs = []
    for name in ("a", "b"):
        f = tmp_path / f"{name}.fasta"
        with open(f, "wb") as fh:
            for i, r in enumerate(_reads(rng, 200)):
                fh.write(b">r%d\n%s\n" % (i, r))
        inputs.append(f)
    inp = tmp_path / "input.txt"
    inp.write_text(
        "".join(f"{n}: {f}\n" for n, f in zip("AB", inputs))
    )

    def run(tag):
        out = tmp_path / f"out_{tag}"
        config = SimkaConfig(
            input_filename=str(inp),
            output_dir=str(out),
            kmer_size=21,
            abundance_min=1,
            verbose=True,
            n_shards=1,
        )
        run_simka(config)
        return {
            p.name: gzip.open(p, "rb").read()
            for p in sorted(out.glob("*.csv.gz"))
        }

    ref = run("mem")
    monkeypatch.setenv("SIMKA_TPU_HBM_MB", "0.05")
    got = run("ooc")
    assert set(ref) == set(got)
    for name in ref:
        assert ref[name] == got[name], name


def test_out_of_core_spills_to_disk_with_tmp(
    sample_sets, tmp_path, monkeypatch
):
    """With -out-tmp set the out-of-core fallback spills npz to disk
    (datasets larger than host RAM); without it, host RAM."""
    ids = ["A", "B", "C", "D"]
    ref = compute_statistics(sample_sets, ids, _config(1))
    monkeypatch.setenv("SIMKA_TPU_HBM_MB", "1")
    config = _config(1)
    config.output_tmp_dir = str(tmp_path / "tmp")
    config.keep_tmp = True
    got = compute_statistics(sample_sets, ids, config)
    _stats_equal(ref, got)
    import os

    sweep_dir = tmp_path / "tmp" / "sweep"
    assert sweep_dir.is_dir() and any(os.listdir(sweep_dir))
