"""Unit tests for the stable row compaction (ops/compact.py)."""

import numpy as np
import jax.numpy as jnp

from simka_tpu.ops.compact import compact_rows

SENT = np.uint32(0xFFFFFFFF)


def _ref(arrays, kept, fills):
    outs = []
    k = int(kept.sum())
    for a, f in zip(arrays, fills):
        o = np.full(a.shape, f, dtype=a.dtype)
        o[:k] = a[kept]
        outs.append(o)
    return outs


def test_compact_matches_numpy_randomized():
    rng = np.random.default_rng(7)
    for trial in range(20):
        E = int(rng.integers(1, 3000))
        block = int(rng.choice([8, 64, 256, 1024]))
        x = rng.integers(0, 2**31, size=E).astype(np.uint32)
        s = rng.integers(0, 64, size=E).astype(np.int32)
        c = rng.integers(0, 1000, size=E).astype(np.int32)
        kept = rng.random(E) < rng.random()
        got = compact_rows(
            (jnp.asarray(x), jnp.asarray(s), jnp.asarray(c)),
            jnp.asarray(kept),
            fills=(SENT, np.int32(0), np.int32(0)),
            block=block,
        )
        want = _ref((x, s, c), kept, (SENT, 0, 0))
        for g, w in zip(got, want):
            assert np.array_equal(np.asarray(g), w), (trial, block)


def test_compact_all_kept_and_all_dropped():
    E = 500
    x = np.arange(E, dtype=np.uint32)
    ones = np.ones(E, dtype=bool)
    (g,) = compact_rows((jnp.asarray(x),), jnp.asarray(ones), (SENT,), block=128)
    assert np.array_equal(np.asarray(g), x)
    (g,) = compact_rows((jnp.asarray(x),), jnp.asarray(~ones), (SENT,), block=128)
    assert np.all(np.asarray(g) == SENT)


def test_compact_preserves_order_within_kept():
    # kept rows must keep their original relative order (stability is
    # what preserves the (kmer, sample)-ascending pair invariant)
    E = 10_000
    rng = np.random.default_rng(1)
    x = np.sort(rng.integers(0, 100, size=E).astype(np.uint32))
    kept = rng.random(E) < 0.3
    (g,) = compact_rows((jnp.asarray(x),), jnp.asarray(kept), (SENT,), block=256)
    k = kept.sum()
    assert np.array_equal(np.asarray(g)[:k], x[kept])
