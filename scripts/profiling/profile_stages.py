"""Stage-level profile of the fused count+join program on the TPU."""
import sys; sys.path.insert(0, "/root/repo")
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from simka_tpu.ops.compact import compact_rows
from simka_tpu.ops.kmers import SENTINEL
from simka_tpu.ops import countjoin

n_banks = 8
E = 1 << 24
rng = np.random.default_rng(0)
space = E // 2
vals = rng.integers(0, space, size=E, dtype=np.uint64)
hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))
lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
sid = jnp.asarray(rng.integers(0, n_banks, size=E).astype(np.int32))


def _suffix_min(x):
    return jnp.flip(jax.lax.cummin(jnp.flip(x)))


@jax.jit
def stage_sort1(hi, lo, sid):
    s = jax.lax.sort((hi, lo, sid), num_keys=3)
    return (s[0][123456].astype(jnp.float32)
            + s[1][654321].astype(jnp.float32) + s[2][111].astype(jnp.float32))


@jax.jit
def stage_pass1(hi, lo, sid):
    words = (hi, lo)
    nw = 2
    idx = jnp.arange(E, dtype=jnp.int32)
    sorted1 = jax.lax.sort((*words, sid), num_keys=nw + 1)
    words = sorted1[:nw]
    sid2 = sorted1[nw]
    prev_same = (sid2[1:] == sid2[:-1])
    for w in words:
        prev_same = prev_same & (w[1:] == w[:-1])
    boundary = jnp.concatenate([jnp.array([True]), ~prev_same])
    real = words[0] != SENTINEL
    starts_after = jnp.concatenate(
        [jnp.where(boundary, idx, E)[1:], jnp.array([E], jnp.int32)])
    next_start = _suffix_min(starts_after)
    count = next_start - idx
    kept = boundary & real & (count >= 1)
    return (jnp.sum(kept.astype(jnp.int32)).astype(jnp.float32)
            + count[12345].astype(jnp.float32))


@jax.jit
def stage_pass1_compact(hi, lo, sid):
    words = (hi, lo)
    nw = 2
    idx = jnp.arange(E, dtype=jnp.int32)
    sorted1 = jax.lax.sort((*words, sid), num_keys=nw + 1)
    words = sorted1[:nw]
    sid2 = sorted1[nw]
    prev_same = (sid2[1:] == sid2[:-1])
    for w in words:
        prev_same = prev_same & (w[1:] == w[:-1])
    boundary = jnp.concatenate([jnp.array([True]), ~prev_same])
    real = words[0] != SENTINEL
    starts_after = jnp.concatenate(
        [jnp.where(boundary, idx, E)[1:], jnp.array([E], jnp.int32)])
    next_start = _suffix_min(starts_after)
    count = next_start - idx
    kept = boundary & real & (count >= 1)
    c = compact_rows((*words, sid2, count), kept,
                     fills=(SENTINEL, SENTINEL, 0, 0))
    return (c[0][123].astype(jnp.float32) + c[2][456].astype(jnp.float32)
            + c[3][789].astype(jnp.float32) + jnp.sum(c[1][:100]).astype(jnp.float32))


f = functools.partial(countjoin.count_join_stats, n_banks=n_banks)


@jax.jit
def stage_full(hi, lo, sid):
    js = f(hi, lo, sid, jnp.int32(1), jnp.int64(10**9))
    return (js.nb_distinct + js.shared_distinct[0, 1]
            + js.bray_numerator[0, 1] + js.shared_kmers_ab[0, 1]).astype(jnp.float32)


def timeit(fn, name):
    float(np.asarray(fn(hi, lo, sid)))
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        float(np.asarray(fn(hi, lo, sid)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:22s} {dt*1000:8.1f} ms")
    return dt


t_sort = timeit(stage_sort1, "sort1 only")
t_p1 = timeit(stage_pass1, "pass1 (sort+runlen)")
t_p1c = timeit(stage_pass1_compact, "pass1+compact")
t_all = timeit(stage_full, "full step")
print(f"-> compaction     {1000*(t_p1c-t_p1):8.1f} ms")
print(f"-> pass3 einsums  {1000*(t_all-t_p1c):8.1f} ms (incl binned sums + seg)")
