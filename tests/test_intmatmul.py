"""Exact integer einsum utilities."""

import numpy as np

from simka_tpu.ops.intmatmul import binned_sum, exact_int_matmul


def test_exact_int_matmul_large_values():
    rng = np.random.default_rng(0)
    R, N, M = 20_000, 6, 4
    a = rng.integers(0, 1 << 20, size=(R, N)).astype(np.int64)
    b = rng.integers(0, 2, size=(R, M)).astype(np.int64)
    got = np.asarray(exact_int_matmul(a, b, a_bits=21, b_bits=1))
    want = a.T @ b
    assert np.array_equal(got, want)


def test_binned_sum_exact():
    rng = np.random.default_rng(1)
    R, B = 50_000, 9
    vals = rng.integers(0, 1 << 40, size=R).astype(np.int64)
    bins = rng.integers(0, B + 1, size=R).astype(np.int32)  # B = dropped
    got = np.asarray(binned_sum(vals, bins, B, bits=41))
    want = np.zeros(B, np.int64)
    for b in range(B):
        want[b] = vals[bins == b].sum()
    assert np.array_equal(got, want)
