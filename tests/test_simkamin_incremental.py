"""Incremental SimkaMin contracts: append + matrix-update.

Mirrors /root/reference/tests/simkaMin/test_simkaMin.py::test_append
(161-214: per-sample sketches chained with `append` must equal the
jointly-sketched result) and ::test_matrix_update (219-260: pipeline on
a prefix + update with the rest must equal the all-at-once run).
"""

import gzip
import os

import pytest

from simka_tpu.io.dsl import parse_input_file
from simka_tpu.minhash.pipeline import (
    append_command,
    distance_command,
    export_command,
    run_simka_min,
    run_simka_min_update,
    sketch_command,
)
from simka_tpu.minhash.sketch_file import SketchFile

REF = "/root/reference"
INPUT = f"{REF}/example/simka_input.txt"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def read_gz(path):
    with gzip.open(path, "rt") as f:
        return f.read()


def write_subset_input(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("".join(lines))
    return str(p)


def input_lines():
    # rewrite with absolute paths so subset files work from tmp dirs
    datasets = parse_input_file(INPUT)
    return [
        d.id
        + ": "
        + " ; ".join(" , ".join(g) for g in d.banks)
        + "\n"
        for d in datasets
    ]


def test_append_equals_joint(tmp_path):
    k, s = 21, 100
    joint = str(tmp_path / "joint")
    run_simka_min(INPUT, joint, kmer_size=k, sketch_size=s, verbose=False)

    lines = input_lines()
    paths = []
    for i, line in enumerate(lines):
        inp = write_subset_input(tmp_path, f"in{i}.txt", [line])
        sp = str(tmp_path / f"s{i}.sketch")
        sketch_command(inp, sp, k, s, verbose=False)
        paths.append(sp)
    for p in paths[1:]:
        append_command(paths[0], p)

    merged = SketchFile(paths[0])
    assert merged.header().nb_datasets == len(lines)
    assert merged.ids() == [d.id for d in parse_input_file(INPUT)]

    dist_dir = str(tmp_path / "dist")
    out_dir = str(tmp_path / "out")
    distance_command(paths[0], paths[0], dist_dir)
    export_command(dist_dir, paths[0], paths[0], out_dir)

    for name in ("mat_presenceAbsence_jaccard", "mat_abundance_braycurtis"):
        a = read_gz(os.path.join(joint, name + ".csv.gz"))
        b = read_gz(os.path.join(out_dir, name + ".csv.gz"))
        assert a == b, name


def test_matrix_update_equals_joint(tmp_path):
    k, s = 21, 100
    joint = str(tmp_path / "joint")
    run_simka_min(INPUT, joint, kmer_size=k, sketch_size=s, verbose=False)

    lines = input_lines()
    part1 = write_subset_input(tmp_path, "p1.txt", lines[:2])
    part2 = write_subset_input(tmp_path, "p2.txt", lines[2:])

    inc = str(tmp_path / "inc")
    run_simka_min(part1, inc, kmer_size=k, sketch_size=s, verbose=False)
    run_simka_min_update(inc, part2, verbose=False)

    for name in ("mat_presenceAbsence_jaccard", "mat_abundance_braycurtis"):
        a = read_gz(os.path.join(joint, name + ".csv.gz"))
        b = read_gz(os.path.join(inc, name + ".csv.gz"))
        assert a == b, name
