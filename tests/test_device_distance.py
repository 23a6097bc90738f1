"""Device sketch distances must match the host walk emulation exactly."""

import numpy as np

from simka_tpu.minhash.device_distance import (
    compute_distance_block_device,
)
from simka_tpu.minhash.distance import compute_distance_block


def random_sketches(rng, n, max_len):
    out = []
    for _ in range(n):
        m = int(rng.integers(0, max_len))
        h = np.unique(
            rng.integers(0, 1 << 48, size=max(m, 0), dtype=np.uint64)
        )
        c = rng.integers(1, 100, size=len(h)).astype(np.uint32)
        out.append((h, c))
    return out


def test_device_matches_host_symmetric():
    rng = np.random.default_rng(0)
    sk = random_sketches(rng, 12, 300)
    jac_h, bc_h = compute_distance_block(sk, sk, True)
    jac_d, bc_d = compute_distance_block_device(sk, sk, True)
    np.testing.assert_array_equal(jac_h, jac_d)
    np.testing.assert_array_equal(bc_h, bc_d)


def test_device_matches_host_rectangular():
    rng = np.random.default_rng(1)
    s1 = random_sketches(rng, 7, 200)
    s2 = random_sketches(rng, 9, 200)
    jac_h, bc_h = compute_distance_block(s1, s2, False)
    jac_d, bc_d = compute_distance_block_device(s1, s2, False)
    np.testing.assert_array_equal(jac_h, jac_d)
    np.testing.assert_array_equal(bc_h, bc_d)


def test_overlapping_heavy():
    # sketches sharing a large common prefix exercise the union-rank
    # tie handling
    rng = np.random.default_rng(2)
    base = np.unique(rng.integers(0, 1 << 40, size=500, dtype=np.uint64))
    sk = []
    for _ in range(6):
        extra = np.unique(
            rng.integers(0, 1 << 40, size=100, dtype=np.uint64)
        )
        h = np.unique(np.concatenate([base, extra]))
        c = rng.integers(1, 50, size=len(h)).astype(np.uint32)
        sk.append((h, c))
    jac_h, bc_h = compute_distance_block(sk, sk, True)
    jac_d, bc_d = compute_distance_block_device(sk, sk, True)
    np.testing.assert_array_equal(jac_h, jac_d)
    np.testing.assert_array_equal(bc_h, bc_d)
