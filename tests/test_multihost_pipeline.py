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


def _read_all(outdir):
    out = {}
    for fn in sorted(os.listdir(outdir)):
        if fn.endswith(".csv.gz"):
            with gzip.open(os.path.join(outdir, fn), "rt") as f:
                out[fn] = f.read()
    return out


def test_multihost_auto_maxreads_and_filters_match_single(tmp_path):
    """-max-reads 0 (auto) and the read filters must produce matrices
    byte-identical to run_simka on the multihost path (the round-1 gap:
    auto mode silently became 'no cap' there)."""
    from simka_tpu.core.pipeline import run_simka

    kw = dict(
        input_filename=INPUT,
        kmer_size=21,
        abundance_min=1,
        max_reads=0,  # auto: (min + mean) / 2 per-group reads
        min_read_size=40,
        min_read_shannon_index=1.2,
        verbose=False,
    )
    out_a = str(tmp_path / "single")
    run_simka(SimkaConfig(output_dir=out_a, **kw))
    out_b = str(tmp_path / "mh")
    run_simka_multihost(SimkaConfig(output_dir=out_b, **kw))
    a, b = _read_all(out_a), _read_all(out_b)
    assert a and a == b


def test_multihost_checkpoint_resume(tmp_path):
    """The multihost path honors output_tmp_dir checkpoints: a second
    run resumes every dataset and still writes identical matrices."""
    kw = dict(
        input_filename=INPUT,
        kmer_size=21,
        abundance_min=2,
        verbose=False,
        output_tmp_dir=str(tmp_path / "tmp"),
        keep_tmp=True,
    )
    out_a = str(tmp_path / "run1")
    run_simka_multihost(SimkaConfig(output_dir=out_a, **kw))
    ck = tmp_path / "tmp" / "host0"
    assert ck.is_dir() and any(ck.iterdir())
    out_b = str(tmp_path / "run2")
    run_simka_multihost(SimkaConfig(output_dir=out_b, **kw))
    assert _read_all(out_a) == _read_all(out_b)


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
