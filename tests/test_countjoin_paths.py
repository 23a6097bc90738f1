"""The packed u64-key fast path of count_join_stats must be
bit-identical to the generic multi-word path on every statistic."""

import jax.numpy as jnp
import numpy as np
import pytest

from simka_tpu.ops.countjoin import count_join_stats

SENTINEL = np.uint32(0xFFFFFFFF)


def _random_instances(rng, E, n_banks, hi_bits, n_sentinel):
    hi = rng.integers(0, max(1, 1 << hi_bits), size=E, dtype=np.uint64)
    lo = rng.integers(0, 1 << 12, size=E, dtype=np.uint64)  # collisions
    sid = rng.integers(0, n_banks, size=E).astype(np.int32)
    hi = hi.astype(np.uint32)
    lo = lo.astype(np.uint32)
    if n_sentinel:
        bad = rng.choice(E, size=n_sentinel, replace=False)
        hi[bad] = SENTINEL
        lo[bad] = SENTINEL
    return jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(sid)


@pytest.mark.parametrize(
    "n_banks,hi_bits,amin,amax",
    [(8, 10, 1, 10**9), (8, 10, 2, 3), (6, 0, 2, 10**9), (3, 21, 1, 2)],
)
def test_packed_path_matches_generic(n_banks, hi_bits, amin, amax):
    rng = np.random.default_rng(42)
    hi, lo, sid = _random_instances(rng, 4096, n_banks, hi_bits, 100)
    kw = dict(
        n_banks=n_banks, simple=True, complex_=True, count_bits=16
    )
    a = count_join_stats(
        hi, lo, sid, jnp.int32(amin), jnp.int64(amax),
        hi_bits=hi_bits, **kw,
    )
    b = count_join_stats(
        hi, lo, sid, jnp.int32(amin), jnp.int64(amax),
        hi_bits=32, **kw,  # forces the generic multi-word path
    )
    for name in a._fields:
        ga, gb = np.asarray(getattr(a, name)), np.asarray(
            getattr(b, name)
        )
        assert np.array_equal(ga, gb), (name, ga, gb)
