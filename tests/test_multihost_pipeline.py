"""run_simka_multihost in single-process mode must match the standard
pipeline byte-for-byte (multi-process correctness of the underlying
all_to_all join is covered by test_multihost.py)."""

import gzip
import os

import pytest

from simka_tpu.config import SimkaConfig
from simka_tpu.parallel.multihost import run_simka_multihost

REF = "/root/reference"
INPUT = f"{REF}/example/simka_input.txt"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def test_multihost_single_process_matches_truth(tmp_path):
    out = str(tmp_path / "mh")
    config = SimkaConfig(
        input_filename=INPUT,
        output_dir=out,
        kmer_size=21,
        abundance_min=2,
        simple_dist=True,
        complex_dist=True,
        verbose=False,
    )
    run_simka_multihost(config)
    truth_dir = f"{REF}/tests/truth/results_k21_t2"
    n_checked = 0
    for fn in os.listdir(truth_dir):
        with open(os.path.join(truth_dir, fn)) as f:
            truth = f.read()
        with gzip.open(os.path.join(out, fn + ".gz"), "rt") as f:
            ours = f.read()
        assert ours == truth, fn
        n_checked += 1
    assert n_checked == 20
