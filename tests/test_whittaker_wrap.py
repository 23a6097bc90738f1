"""Whittaker int32-wrap exactness (closes PARITY divergence 3).

The reference accumulates EVERY Whittaker term -- co-present and
single-presence -- as abs((int)((u64)(cI*K_j) - (u64)(cJ*K_i)))
(SimkaAlgorithm.hpp:481, 505), which wraps to signed int32 once a
count times a solid total reaches 2^31. This oracle replays that
per-k-mer arithmetic directly (double product -> u64 -> low 32 bits
-> signed -> abs) and the join's channel assembly
W = A + A^T - (S12 + S12^T) + (w + w^T) must match it bit-for-bit,
deep inside the wrapping regime."""

import numpy as np
import pytest

import jax.numpy as jnp

from simka_tpu.ops.countjoin import (
    count_join_stats,
    join_stats_from_spectra,
    join_stats_from_spectra_split,
)

SENTINEL = np.uint32(0xFFFFFFFF)


def _wrap_term(ci, cj, Ki, Kj):
    with np.errstate(over="ignore"):  # u64 wrap IS the semantics
        x = np.uint64(np.float64(ci) * np.float64(Kj))
        y = np.uint64(np.float64(cj) * np.float64(Ki))
        low = np.uint32((x - y) & np.uint64(0xFFFFFFFF))
    return abs(int(np.int32(low)))


def _oracle(rows, N, amin):
    """rows: list of (kmer, bank, count). Returns (W upper [N,N], K)."""
    from collections import defaultdict

    per_kmer = defaultdict(dict)
    for v, s, c in rows:
        if c >= amin:
            per_kmer[v][s] = per_kmer[v].get(s, 0) + c
    K = np.zeros(N, np.int64)
    for d in per_kmer.values():
        for s, c in d.items():
            K[s] += c
    W = np.zeros((N, N), np.int64)
    for d in per_kmer.values():
        present = sorted(d)
        for i in range(N):
            for j in range(i + 1, N):
                ci, cj = d.get(i, 0), d.get(j, 0)
                if ci == 0 and cj == 0:
                    continue
                W[i, j] += _wrap_term(ci, cj, K[i], K[j])
    return W, K


def _assemble(js):
    A = np.asarray(js.whittaker_all, np.int64)
    S = np.asarray(js.whittaker_s12, np.int64)
    w = np.asarray(js.whittaker, np.int64)
    n = A.shape[0]
    out = A + A.T - (S + S.T) + (w + w.T)
    out[np.eye(n, dtype=bool)] = 0
    return out


@pytest.mark.parametrize("amin", [1, 3])
def test_spectra_paths_match_oracle_in_wrap_regime(amin):
    rng = np.random.default_rng(31)
    N, R = 4, 1500
    kmers = rng.integers(0, 300, size=R, dtype=np.uint64)
    sid = rng.integers(0, N, size=R).astype(np.int32)
    # counts up to ~100k make c*K reach ~1e12 >> 2^31: deep wrap
    counts = rng.integers(1, 100_000, size=R).astype(np.int32)
    rows = list(zip(kmers.tolist(), sid.tolist(), counts.tolist()))
    # collapse duplicate (kmer, bank) rows -- spectra are per-sample
    # distinct; the oracle sums duplicates, so emulate that here
    agg = {}
    for v, s, c in rows:
        agg[(v, s)] = agg.get((v, s), 0) + c
    kv = np.array([k for k, _ in agg], np.uint64)
    sv = np.array([s for _, s in agg], np.int32)
    cv = np.array(list(agg.values()), np.int32)
    W_ref, K_ref = _oracle(
        [(int(k), int(s), int(c)) for (k, s), c in agg.items()],
        N, amin,
    )
    W_sym = W_ref + W_ref.T

    hi = (kv >> np.uint64(32)).astype(np.uint32)
    lo = (kv & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    for fn in (join_stats_from_spectra, join_stats_from_spectra_split):
        js = fn(
            (jnp.asarray(hi), jnp.asarray(lo)),
            jnp.asarray(sv),
            jnp.asarray(cv),
            jnp.int32(amin),
            jnp.int64(10**9),
            n_banks=N,
            complex_=True,
            hi_bits=0,
        )
        np.testing.assert_array_equal(
            np.asarray(js.solid_per_bank), K_ref, err_msg=str(fn)
        )
        np.testing.assert_array_equal(
            _assemble(js), W_sym, err_msg=str(fn)
        )


def test_instance_path_matches_oracle():
    rng = np.random.default_rng(7)
    N, E = 3, 1 << 15
    # few distinct kmers -> large counts; K ~ 10k so c*K crosses 2^31
    # only via the duplication below
    vals = rng.integers(0, 12, size=E, dtype=np.uint64)
    sid = rng.integers(0, N, size=E).astype(np.int32)
    from collections import Counter

    cnt = Counter(zip(vals.tolist(), sid.tolist()))
    rows = [(v, s, c) for (v, s), c in cnt.items()]
    W_ref, K_ref = _oracle(rows, N, 1)
    # counts ~ 10k, K ~ 10k: c*K ~ 1e8 < 2^31 -- scale the oracle
    # check by verifying the instance path against the spectra path
    # AND the oracle (non-wrap here; the wrap regime is covered by
    # the spectra test, which the instance path shares its channel
    # code with)
    js = count_join_stats(
        jnp.asarray((vals >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray(sid),
        jnp.int32(1),
        jnp.int64(10**9),
        n_banks=N,
        complex_=True,
        hi_bits=0,
    )
    np.testing.assert_array_equal(
        np.asarray(js.solid_per_bank), K_ref
    )
    np.testing.assert_array_equal(_assemble(js), W_ref + W_ref.T)


def test_assembly_matches_legacy_closed_form_when_no_wrap():
    """In the non-wrap regime the exact-wrap assembly must reduce to
    the old unwrapped closed form (which all truth configs exercise):
    A = K_i*K_j and S12 = ab*K_j + ba*K_i identities."""
    rng = np.random.default_rng(5)
    N, R = 5, 800
    kv = rng.integers(0, 200, size=R, dtype=np.uint64)
    sv = rng.integers(0, N, size=R).astype(np.int32)
    cv = rng.integers(1, 10, size=R).astype(np.int32)
    agg = {}
    for v, s, c in zip(kv.tolist(), sv.tolist(), cv.tolist()):
        agg[(v, s)] = agg.get((v, s), 0) + c
    kk = np.array([k for k, _ in agg], np.uint64)
    ss = np.array([s for _, s in agg], np.int32)
    cc = np.array(list(agg.values()), np.int32)
    js = join_stats_from_spectra(
        (
            jnp.asarray((kk >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((kk & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        ),
        jnp.asarray(ss),
        jnp.asarray(cc),
        jnp.int32(1),
        jnp.int64(10**9),
        n_banks=N,
        complex_=True,
        hi_bits=0,
    )
    K = np.asarray(js.solid_per_bank, np.int64)
    ab = np.asarray(js.shared_kmers_ab, np.int64)
    ba = np.asarray(js.shared_kmers_ba, np.int64)
    sh = ab + ba.T + np.diag(K)
    wh = np.asarray(js.whittaker, np.int64)
    only_i = K[:, None] - sh
    only_j = K[None, :] - sh.T
    off = ~np.eye(N, dtype=bool)
    legacy = np.where(
        off,
        (only_i * K[None, :] + only_j * K[:, None]) + wh + wh.T,
        0,
    )
    np.testing.assert_array_equal(_assemble(js), legacy)
