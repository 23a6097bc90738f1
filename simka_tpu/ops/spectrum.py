"""Per-sample k-mer spectrum: sort + run-length count on device.

The single-sample specialization of the fused count/join (the role of
the reference's per-sample DSK run, src/SimkaCount.cpp:289-300).
Used by the SimkaMin sketch path, which needs each sample's distinct
(k-mer, count) pairs before hashing/top-s selection.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simka_tpu.ops.kmers import SENTINEL


@jax.jit
def _count_spectrum_device(hi, lo):
    E = hi.shape[0]
    idx = jnp.arange(E, dtype=jnp.int32)
    hi, lo = jax.lax.sort((hi, lo), num_keys=2)
    boundary = jnp.concatenate(
        [
            jnp.array([True]),
            (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1]),
        ]
    )
    real = hi != SENTINEL
    starts_after = jnp.concatenate(
        [jnp.where(boundary, idx, E)[1:], jnp.array([E], jnp.int32)]
    )
    next_start = jnp.flip(jax.lax.cummin(jnp.flip(starts_after)))
    count = next_start - idx
    uniq = boundary & real
    return hi, lo, count, uniq


def count_spectrum(
    hi: np.ndarray, lo: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distinct canonical k-mers + counts for one sample.

    Returns host-compacted (hi, lo, count) arrays, k-mer-sorted.
    """
    h, l, c, m = _count_spectrum_device(jnp.asarray(hi), jnp.asarray(lo))
    m = np.asarray(m)
    return (
        np.asarray(h)[m],
        np.asarray(l)[m],
        np.asarray(c)[m].astype(np.int64),
    )
