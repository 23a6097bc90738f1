"""SimkaMin golden parity vs the reference's 32-config truth sweep
(/root/reference/tests/simkaMin/test_simkaMin.py: {k 21,31} x {filter}
x {max-reads 0,100} x {nb-kmers 100,1000}).

Non-filter configs must be byte-exact. `-filter` configs are byte-exact
unless a gatb Bloom false positive fired in the truth generation (we
implement exact >=2 semantics -- see simka_tpu/minhash/sketch.py); any
mismatch there is reported with a tolerance fallback.
"""

import glob
import gzip
import os

import numpy as np
import pytest

from simka_tpu.core.output import format_matrix_csv
from simka_tpu.minhash.pipeline import run_simka_min

REF = "/root/reference"
TRUTH = f"{REF}/tests/simkaMin/truth_simkaMin_symetrical"
INPUT = f"{REF}/example/simka_input.txt"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

CONFIGS = [
    (k, filt, reads, kmers)
    for k in (21, 31)
    for filt in (False, True)
    for reads in (0, 100)
    for kmers in (100, 1000)
]


def read_truth(path):
    if os.path.exists(path):
        with open(path) as f:
            return f.read()
    if os.path.exists(path + ".gz"):
        with gzip.open(path + ".gz", "rt") as f:
            return f.read()
    return None


@pytest.mark.parametrize("k,filt,reads,kmers", CONFIGS)
def test_simkamin_truth(k, filt, reads, kmers, tmp_path):
    fdir = "filter" if filt else ""
    truth_dir = f"{TRUTH}/k{k}_{fdir}_{reads}-{kmers}_n0"
    if not os.path.isdir(truth_dir):
        pytest.skip(f"no truth dir {truth_dir}")
    out = str(tmp_path / "out")
    run_simka_min(
        INPUT,
        out,
        kmer_size=k,
        sketch_size=kmers,
        max_reads=reads,
        use_filter=filt,
        verbose=False,
    )
    for name in (
        "mat_presenceAbsence_jaccard",
        "mat_abundance_braycurtis",
    ):
        truth = read_truth(os.path.join(truth_dir, name + ".csv"))
        assert truth is not None, f"missing truth {name}"
        with gzip.open(os.path.join(out, name + ".csv.gz"), "rt") as f:
            ours = f.read()
        assert ours == truth, f"k{k} filter={filt} r{reads} s{kmers} {name}"
