"""Multi-host join path (single-process, virtual 8-device mesh):
the all_to_all spectrum exchange must reproduce the single-device
statistics exactly."""

import collections

import jax
import numpy as np
import pytest

from simka_tpu.ops.countjoin import join_stats_from_spectra
from simka_tpu.parallel.multihost import (
    datasets_for_process,
    multihost_join_from_spectra,
)
from simka_tpu.parallel.sharded import make_mesh


def test_manifest():
    assert datasets_for_process(10, 0, 4) == [0, 4, 8]
    assert datasets_for_process(10, 3, 4) == [3, 7]
    all_sets = [datasets_for_process(10, p, 4) for p in range(4)]
    assert sorted(sum(all_sets, [])) == list(range(10))


def test_all_to_all_join_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(11)
    n_banks = 5
    n_rows = 30_000
    vals = rng.integers(0, 4000, size=n_rows, dtype=np.uint64)
    sid = rng.integers(0, n_banks, size=n_rows).astype(np.int32)
    # aggregate duplicates into per-(kmer, sample) rows
    agg = collections.Counter(zip(vals.tolist(), sid.tolist()))
    rows = sorted(agg.items())
    rv = np.array([r[0][0] for r in rows], np.uint64)
    rs = np.array([r[0][1] for r in rows], np.int32)
    rc = np.array([r[1] for r in rows], np.int32)
    hi = (rv >> np.uint64(32)).astype(np.uint32)
    lo = (rv & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    import jax.numpy as jnp

    js1 = join_stats_from_spectra(
        (jnp.asarray(hi), jnp.asarray(lo)),
        jnp.asarray(rs),
        jnp.asarray(rc),
        jnp.int32(2),
        jnp.int64(10**9),
        n_banks=n_banks,
        simple=True,
        complex_=True,
    )

    mesh = make_mesh(8)
    jsM = multihost_join_from_spectra(
        (hi, lo),
        rs,
        rc,
        2,
        10**9,
        mesh=mesh,
        n_banks=n_banks,
        simple=True,
        complex_=True,
    )
    for name in js1._fields:
        a = np.asarray(getattr(js1, name))
        b = np.asarray(getattr(jsM, name))
        if a.dtype.kind == "f":
            # double-float einsum sums differ in the last ~7 digits
            # when row grouping changes (panel boundaries shift after
            # the exchange); far below the %f output precision
            np.testing.assert_allclose(a, b, rtol=1e-6, err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_multihost_split_join_matches_fused(monkeypatch):
    """Wide-N multihost joins take the singleton-prune split: results
    must match the fused multihost join (float channels to the usual
    double-float tolerance)."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(41)
    n_banks, n_rows = 40, 20_000
    vals = rng.integers(0, 3000, size=n_rows, dtype=np.uint64)
    sid = rng.integers(0, n_banks, size=n_rows).astype(np.int32)
    agg = collections.Counter(zip(vals.tolist(), sid.tolist()))
    rows = sorted(agg.items())
    rv = np.array([r[0][0] for r in rows], np.uint64)
    rs = np.array([r[0][1] for r in rows], np.int32)
    rc = np.array([r[1] for r in rows], np.int32)
    hi = (rv >> np.uint64(32)).astype(np.uint32)
    lo = (rv & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    mesh = make_mesh(8)
    kw = dict(mesh=mesh, n_banks=n_banks, simple=True, complex_=True)

    monkeypatch.setenv("SIMKA_TPU_SPLIT_JOIN", "0")
    a = multihost_join_from_spectra((hi, lo), rs, rc, 2, 10**9, **kw)
    monkeypatch.setenv("SIMKA_TPU_SPLIT_JOIN", "1")
    b = multihost_join_from_spectra((hi, lo), rs, rc, 2, 10**9, **kw)
    for name in a._fields:
        x = np.asarray(getattr(a, name))
        y = np.asarray(getattr(b, name))
        if x.dtype.kind == "f":
            np.testing.assert_allclose(x, y, rtol=1e-6, err_msg=name)
        else:
            np.testing.assert_array_equal(x, y, err_msg=name)
