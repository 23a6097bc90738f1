"""Per-sample k-mer spectrum: sort + run-length count on device.

The single-sample specialization of the fused count/join (the role of
the reference's per-sample DSK run, src/SimkaCount.cpp:289-300). Used
by the SimkaMin sketch path and by the count-phase checkpoints (the
reference's partition files + kmercount_per_partition metadata).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simka_tpu.ops.kmers import SENTINEL


@functools.partial(jax.jit, static_argnames=("nw",))
def _count_spectrum_device(words, nw: int):
    E = words[0].shape[0]
    idx = jnp.arange(E, dtype=jnp.int32)
    words = jax.lax.sort(tuple(words), num_keys=nw)
    if nw == 1:
        words = (words,)
    same = words[0][1:] == words[0][:-1]
    for w in words[1:]:
        same = same & (w[1:] == w[:-1])
    boundary = jnp.concatenate([jnp.array([True]), ~same])
    real = words[0] != SENTINEL
    starts_after = jnp.concatenate(
        [jnp.where(boundary, idx, E)[1:], jnp.array([E], jnp.int32)]
    )
    next_start = jnp.flip(jax.lax.cummin(jnp.flip(starts_after)))
    count = next_start - idx
    uniq = boundary & real
    return words, count, uniq


def count_spectrum(*word_arrays) -> Tuple:
    """Distinct canonical k-mers + counts for one sample.

    Args: one or more uint32 word arrays (big-endian significance).
    Returns host-compacted (words tuple, counts int64), k-mer-sorted.
    """
    words = tuple(jnp.asarray(w) for w in word_arrays)
    ws, c, m = _count_spectrum_device(words, nw=len(words))
    m = np.asarray(m)
    return (
        tuple(np.asarray(w)[m] for w in ws),
        np.asarray(c)[m].astype(np.int64),
    )
