"""The Pallas gap-close (ops/pallas_compact.py) must be bit-identical
to the fori_loop path of compact_rows -- mixed dtypes incl. 64-bit
columns (bitcast u32 pairs), ragged last blocks, empty/full masks.
Runs the Pallas TPU interpreter on CPU (SIMKA_TPU_PALLAS=1)."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _force_pallas(monkeypatch):
    monkeypatch.setenv("SIMKA_TPU_PALLAS", "1")


FILL64 = np.uint64(0xFFFFFFFFFFFFFFFF)


@pytest.mark.parametrize("E", [4096, 5000, 100_000])
@pytest.mark.parametrize("frac", [0.0, 0.4, 1.0])
def test_gapclose_matches_fori_loop(E, frac, monkeypatch):
    from simka_tpu.ops.compact import compact_rows

    rng = np.random.default_rng(E + int(frac * 10))
    kept = rng.random(E) < frac
    cols = (
        jnp.asarray(
            rng.integers(0, 2**63, size=E, dtype=np.uint64)
        ),
        jnp.asarray(rng.integers(0, 2**31, size=E).astype(np.int32)),
        jnp.asarray(
            rng.integers(0, 2**32, size=E, dtype=np.uint64).astype(
                np.uint32
            )
        ),
    )
    fills = (FILL64, 0, np.uint32(0xFFFFFFFF))
    got = compact_rows(cols, jnp.asarray(kept), fills, block=4096)

    monkeypatch.setenv("SIMKA_TPU_PALLAS", "0")
    want = compact_rows(cols, jnp.asarray(kept), fills, block=4096)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_gapclose_inside_jit(monkeypatch):
    """compact_rows with the Pallas path must still trace under jit
    (the join programs call it inside larger jitted graphs)."""
    import jax

    from simka_tpu.ops.compact import compact_rows

    rng = np.random.default_rng(3)
    E = 8192
    kept = jnp.asarray(rng.random(E) < 0.5)
    col = jnp.asarray(rng.integers(0, 2**31, size=E).astype(np.int32))

    @jax.jit
    def run(c, k):
        return compact_rows((c,), k, (0,), block=2048)[0]

    got = np.asarray(run(col, kept))
    ref = np.zeros(E, np.int32)
    kc = np.asarray(col)[np.asarray(kept)]
    ref[: len(kc)] = kc
    np.testing.assert_array_equal(got, ref)
