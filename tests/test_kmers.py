import jax.numpy as jnp
import numpy as np

from simka_tpu.io.bank import encode_batch
from simka_tpu.ops.kmers import SENTINEL, extract_canonical_kmers


def ref_canonical(seq: str, k: int):
    """Slow python oracle: canonical k-mer integers (None if invalid)."""
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    out = []
    for i in range(len(seq) - k + 1):
        win = seq[i : i + k]
        if any(c not in code for c in win):
            out.append(None)
            continue
        fwd = 0
        for c in win:
            fwd = fwd * 4 + code[c]
        rc = 0
        for c in reversed(win):
            rc = rc * 4 + code[comp[c]]
        out.append(min(fwd, rc))
    return out


def run_extract(seqs, k):
    codes, _ = encode_batch([s.encode() for s in seqs])
    hi, lo, valid = extract_canonical_kmers(jnp.asarray(codes), k)
    hi, lo, valid = np.asarray(hi), np.asarray(lo), np.asarray(valid)
    vals = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    return vals, valid


def test_small_k():
    seqs = ["ACGTACGTAC", "TTTTTTTTTT", "ACGNACGTAC"]
    k = 3
    vals, valid = run_extract(seqs, k)
    for r, s in enumerate(seqs):
        oracle = ref_canonical(s, k)
        for i, o in enumerate(oracle):
            if o is None:
                assert not valid[r, i]
                assert vals[r, i] == 0xFFFFFFFFFFFFFFFF
            else:
                assert valid[r, i]
                assert vals[r, i] == o, (s, i)


def test_k21_crosses_word_boundary():
    rng = np.random.default_rng(0)
    seqs = [
        "".join(rng.choice(list("ACGT"), size=60)) for _ in range(20)
    ]
    for k in (15, 16, 17, 21, 31):
        vals, valid = run_extract(seqs, k)
        for r, s in enumerate(seqs):
            oracle = ref_canonical(s, k)
            got = vals[r, : len(oracle)]
            assert valid[r, : len(oracle)].all()
            assert [int(v) for v in got] == oracle, k


def test_revcomp_invariance():
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    s = "ACGGTTACGGATCCATTGCAAGGCT"
    rc = "".join(comp[c] for c in reversed(s))
    k = 11
    v1, _ = run_extract([s], k)
    v2, _ = run_extract([rc], k)
    assert sorted(v1.ravel().tolist()) == sorted(v2.ravel().tolist())


def test_padding_invalid():
    vals, valid = run_extract(["ACGTACGT", "ACG"], 4)
    # second read only has len 3 < k: everything invalid
    assert not valid[1].any()
    assert valid[0, :5].all()
