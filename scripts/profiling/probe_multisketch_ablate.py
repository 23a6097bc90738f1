"""Ablate sketch_multi_prefix stage-by-stage on the chip: which part
of the fused multi-sample sketch costs 1.35 s at E=2^24 (vs 139 ms
for the whole count+join kernel at the same size)?"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


E = 1 << 24
N, S = 100, 100_000
rng = np.random.default_rng(0)
h_np = rng.integers(0, 1 << 63, size=E, dtype=np.uint64)
sid_np = rng.integers(0, N, size=E).astype(np.int32)
h_d = jax.device_put(jnp.asarray(h_np))
sid_d = jax.device_put(jnp.asarray(sid_np))


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    r = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    compile_s = time.perf_counter() - t0
    times = []
    for _i in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        times.append(time.perf_counter() - t0)
    print(
        f"{name}: warm {min(times)*1000:.0f}ms "
        f"(compile {compile_s:.1f}s)",
        flush=True,
    )


from simka_tpu.minhash.device import _segmented_cummax_by_sid
from simka_tpu.ops.intmatmul import binned_sum


@jax.jit
def sort_only(h, sid):
    hh = (h >> jnp.uint64(32)).astype(jnp.uint32)
    hl = h.astype(jnp.uint32)
    sidk = sid
    key1 = (sidk.astype(jnp.uint64) << jnp.uint64(32)) | hh.astype(
        jnp.uint64
    )
    idx = jnp.arange(E, dtype=jnp.int32)
    key1, hl, pos = jax.lax.sort((key1, hl, idx), num_keys=3)
    return key1[0].astype(jnp.float32)


@jax.jit
def sort2_only(h, sid):
    # pos as PAYLOAD instead of key
    hh = (h >> jnp.uint64(32)).astype(jnp.uint32)
    hl = h.astype(jnp.uint32)
    key1 = (sid.astype(jnp.uint64) << jnp.uint64(32)) | hh.astype(
        jnp.uint64
    )
    idx = jnp.arange(E, dtype=jnp.int32)
    key1, hl, pos = jax.lax.sort((key1, hl, idx), num_keys=2)
    return key1[0].astype(jnp.float32)


@jax.jit
def cummax_f64(sid):
    v = _segmented_cummax_by_sid(sid + 1, sid)
    return v[0].astype(jnp.float32)


@jax.jit
def gathers6(h, sid):
    tbl = jnp.arange(N, dtype=jnp.int64)
    acc = jnp.zeros((), jnp.int64)
    for i in range(6):
        acc = acc + jnp.sum((tbl + i)[sid])
    return acc.astype(jnp.float32)


@jax.jit
def binned5(h, sid):
    one = jnp.ones((E,), jnp.int64)
    a = binned_sum(one, sid, N, bits=1)
    b = binned_sum(h.astype(jnp.int64) >> 33, sid, N, bits=32)
    c = binned_sum(h.astype(jnp.int64) >> 33, sid, N, bits=32)
    d = binned_sum(one * 7, sid, N, bits=26)
    e = binned_sum(one, sid, N, bits=1)
    return (a[0] + b[0] + c[0] + d[0] + e[0]).astype(jnp.float32)


@jax.jit
def compact1(h, sid):
    from simka_tpu.ops.compact import compact_rows

    hh = (h >> jnp.uint64(32)).astype(jnp.uint32)
    hl = h.astype(jnp.uint32)
    keep = (sid & 1) == 0
    a, b, c = compact_rows(
        (hh, hl, sid), keep, fills=(0xFFFFFFFF, 0xFFFFFFFF, 0)
    )
    return a[0].astype(jnp.float32)


def full(h, sid):
    from simka_tpu.minhash.device import sketch_multi_prefix

    return sketch_multi_prefix(
        h, sid, n_samples=N, sketch_size=S, use_filter=False,
        cap=min(E, N * S),
    )[3]


timeit("sort 3-key", sort_only, h_d, sid_d)
timeit("sort 2-key+payload", sort2_only, h_d, sid_d)
timeit("cummax f64 composite", cummax_f64, sid_d)
timeit("6x [N]-table gathers", gathers6, h_d, sid_d)
timeit("5x binned_sum", binned5, h_d, sid_d)
timeit("compact 3 cols", compact1, h_d, sid_d)
timeit("FULL sketch_multi_prefix", full, h_d, sid_d)
