"""Device murmur + bottom-s sketch vs the host-numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from simka_tpu.minhash.device import (
    FULL64,
    device_sketch_update,
    hash_kmer_words,
    murmur3_u64_device,
)
from simka_tpu.minhash.murmur import murmur3_u64
from simka_tpu.ops.kmers import SENTINEL


def _rand_u64(rng, n):
    return rng.integers(0, 1 << 63, size=n, dtype=np.uint64) | (
        rng.integers(0, 2, size=n, dtype=np.uint64) << np.uint64(63)
    )


def test_device_murmur_matches_host():
    rng = np.random.default_rng(0)
    vals = _rand_u64(rng, 4096)
    # edge values too
    vals[:4] = [0, 1, (1 << 64) - 1, (1 << 42) - 1]
    for seed in (100, 0, 7_777_777):
        host = murmur3_u64(vals, seed)
        dev = np.asarray(
            murmur3_u64_device(jnp.asarray(vals), seed)
        ).astype(np.uint64)
        np.testing.assert_array_equal(host, dev)


def test_hash_kmer_words_masks_sentinels():
    rng = np.random.default_rng(1)
    hi = rng.integers(0, 1 << 10, size=64, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, size=64, dtype=np.uint32)
    hi[10] = 0xFFFFFFFF  # SENTINEL
    assert SENTINEL == 0xFFFFFFFF
    h, valid = hash_kmer_words(jnp.asarray(hi), jnp.asarray(lo), seed=100)
    h, valid = np.asarray(h), np.asarray(valid)
    assert not valid[10] and h[10] == np.uint64(0xFFFFFFFFFFFFFFFF)
    vals = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    expect = murmur3_u64(vals, 100)
    np.testing.assert_array_equal(h[valid], expect[valid])


def test_device_sketch_bottom_s():
    rng = np.random.default_rng(2)
    E, s = 1 << 14, 500
    hi = rng.integers(0, 1 << 10, size=E, dtype=np.uint32)
    lo = rng.integers(0, 1 << 12, size=E, dtype=np.uint32)  # collisions
    hi[::7] = 0xFFFFFFFF  # sprinkle invalid windows
    h_out, c_out = device_sketch_update(
        jnp.asarray(hi), jnp.asarray(lo), seed=100, sketch_size=s
    )
    h_out = np.asarray(h_out).astype(np.uint64)
    c_out = np.asarray(c_out)

    valid = hi != 0xFFFFFFFF
    vals = (hi[valid].astype(np.uint64) << np.uint64(32)) | lo[
        valid
    ].astype(np.uint64)
    stream = murmur3_u64(vals, 100)
    uniq, counts = np.unique(stream, return_counts=True)
    np.testing.assert_array_equal(h_out, uniq[:s])
    np.testing.assert_array_equal(c_out, counts[:s].astype(np.uint32))
    assert np.all(np.diff(h_out.astype(np.uint64)) > 0)


def test_device_sketch_fewer_distinct_than_s():
    hi = np.zeros(64, np.uint32)
    lo = np.arange(64, dtype=np.uint32) % 8
    h_out, c_out = device_sketch_update(
        jnp.asarray(hi), jnp.asarray(lo), seed=100, sketch_size=32
    )
    h_out, c_out = np.asarray(h_out), np.asarray(c_out)
    assert h_out.shape == (32,) and c_out.shape == (32,)
    n_real = int((h_out != np.uint64(0xFFFFFFFFFFFFFFFF)).sum())
    assert n_real == 8
    assert c_out[:8].sum() == 64 and np.all(c_out[8:] == 0)


@pytest.mark.parametrize("use_filter", [False, True])
@pytest.mark.parametrize("sketch_size", [8, 64, 100000])
def test_device_sketch_matches_host(use_filter, sketch_size):
    """compute_sketch (device-resident stream) must equal the host
    reference sketcher bit-for-bit, including the streaming-heap
    count correction of the largest member and the >=2 filter."""
    from simka_tpu.minhash.sketch import (
        _compute_sketch_host,
        compute_sketch,
    )

    rng = np.random.default_rng(13)
    bases = np.frombuffer(b"ACGTN", np.uint8)
    reads = []
    for _ in range(400):
        ln = int(rng.integers(25, 90))
        # 4% N rate: invalid windows exercise the FULL64 accounting
        codes = rng.choice(5, size=ln, p=[0.24, 0.24, 0.24, 0.24, 0.04])
        reads.append(bases[codes].tobytes())
    # duplicate some reads so counts > 1 and the filter keeps members
    reads = reads + reads[:150]

    dev = compute_sketch(reads, 21, sketch_size, 100, use_filter,
                         batch_reads=128)
    host = _compute_sketch_host(reads, 21, sketch_size, 100,
                                use_filter, batch_reads=128)
    np.testing.assert_array_equal(dev[0], host[0])
    np.testing.assert_array_equal(dev[1], host[1])
