"""CLI surface: argument handling and error paths."""

import gzip
import os

import pytest

from simka_tpu.cli import main

REF = "/root/reference"
INPUT = f"{REF}/example/simka_input.txt"


def test_missing_input_clean_error(capsys):
    rc = main(["-in", "/nonexistent/input.txt", "-out", "/tmp/x"])
    assert rc == 1
    assert "error" in capsys.readouterr().err


def test_malformed_input_clean_error(tmp_path, capsys):
    p = tmp_path / "bad.txt"
    p.write_text("no colon here\n")
    rc = main(["-in", str(p), "-out", "/tmp/x"])
    assert rc == 1
    assert "invalid input line" in capsys.readouterr().err


def test_data_info(capsys):
    if not os.path.isdir(REF):
        pytest.skip("no reference")
    rc = main(["-in", INPUT, "-out", "/tmp/x", "-data-info"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "A: 99 reads" in out
    assert "E: 402 reads" in out


def test_end_to_end_default_flags(tmp_path):
    if not os.path.isdir(REF):
        pytest.skip("no reference")
    out = str(tmp_path / "res")
    rc = main(
        ["-in", INPUT, "-out", out, "-verbose", "0", "-n-shards", "1"]
    )
    assert rc == 0
    # default mode emits the 15 always-on matrices
    produced = [f for f in os.listdir(out) if f.endswith(".csv.gz")]
    assert len(produced) == 15
    with gzip.open(
        os.path.join(out, "mat_abundance_braycurtis.csv.gz"), "rt"
    ) as f:
        assert f.read().startswith(";A;B;C;D;E")
    metrics_path = os.path.join(out, "simka_metrics.json")
    assert os.path.exists(metrics_path)
    # the repartition skew diagnostic must appear on the DEFAULT
    # (in-memory) path too, not just -out-tmp (printCountInfo analog,
    # SimkaPotara.hpp:785-811)
    import json

    with open(metrics_path) as f:
        metrics = json.load(f)
    hist = metrics["counters"]["repartition_histogram"]
    assert len(hist) >= 2 and sum(hist) > 0


def test_min_info_roundtrip(tmp_path, capsys):
    if not os.path.isdir(REF):
        pytest.skip("no reference")
    sketch = str(tmp_path / "s.bin")
    rc = main(
        [
            "min",
            "sketch",
            "-in",
            INPUT,
            "-out",
            sketch,
            "-kmer-size",
            "21",
            "-nb-kmers",
            "50",
        ]
    )
    assert rc == 0
    rc = main(["min", "info", "-in", sketch])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Nb datasets: 5" in out
