"""Checkpoint/resume path: spectra-based run must equal the direct run
byte-for-byte, resume must reuse checkpoints, and the tmp-dir pipeline
must match the reference truth."""

import glob
import os

import numpy as np
import pytest

from simka_tpu.config import SimkaConfig
from simka_tpu.core.output import format_matrix_csv
from simka_tpu.core.pipeline import run_simka
from simka_tpu.io.dsl import parse_input_file

REF = "/root/reference"
INPUT = f"{REF}/example/simka_input.txt"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def run(tmp_path, tag, **kw):
    out = str(tmp_path / f"out_{tag}")
    config = SimkaConfig(
        input_filename=INPUT,
        output_dir=out,
        kmer_size=21,
        abundance_min=2,
        simple_dist=True,
        complex_dist=True,
        verbose=False,
        n_shards=1,
        **kw,
    )
    mats = run_simka(config)
    ids = [d.id for d in parse_input_file(INPUT)]
    return {k: format_matrix_csv(v, ids) for k, v in mats.items()}


def test_checkpoint_path_matches_direct_and_truth(tmp_path):
    direct = run(tmp_path, "direct")
    tmpdir = str(tmp_path / "tmp")
    via_ckpt = run(
        tmp_path, "ckpt", output_tmp_dir=tmpdir, keep_tmp=True
    )
    assert direct == via_ckpt

    # checkpoints were written
    ckpts = glob.glob(os.path.join(tmpdir, "count", "*.npz"))
    assert len(ckpts) == 5

    # resume run reuses them (mtimes unchanged)
    mtimes = {p: os.path.getmtime(p) for p in ckpts}
    resumed = run(
        tmp_path, "resume", output_tmp_dir=tmpdir, keep_tmp=True
    )
    assert resumed == direct
    for p in ckpts:
        assert os.path.getmtime(p) == mtimes[p], "checkpoint recounted"

    # matches the committed reference truth
    truth_dir = f"{REF}/tests/truth/results_k21_t2"
    for tf in glob.glob(os.path.join(truth_dir, "*.csv")):
        name = os.path.basename(tf)[:-4]
        with open(tf) as f:
            assert via_ckpt[name] == f.read(), name


def test_tmp_cleanup_without_keep(tmp_path):
    tmpdir = str(tmp_path / "tmp2")
    run(tmp_path, "clean", output_tmp_dir=tmpdir, keep_tmp=False)
    assert not os.path.exists(os.path.join(tmpdir, "count"))
