"""Tunnel transfer probe (round 5): D2H and H2D rates by size and
layout. Fresh arrays per fetch (jax caches a fetched array's host
copy, which made a first cut read 0.00s)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import simka_tpu  # noqa: F401  (x64 + platform config)
import numpy as np
import jax
import jax.numpy as jnp


def fresh(i, m, dtype):
    x = jnp.arange(m, dtype=jnp.uint32).astype(dtype) + jnp.asarray(
        i, dtype
    )
    x = jax.device_put(x)
    float(np.asarray(x[-1]))  # materialize on device
    return x


def d2h(name, m, dtype, iters=2):
    times = []
    for i in range(iters):
        x = fresh(i + 1, m, dtype)
        t0 = time.perf_counter()
        _ = np.asarray(x)
        times.append(time.perf_counter() - t0)
    mb = m * np.dtype(dtype).itemsize / 1e6
    best = min(times)
    print(
        f"D2H {name} ({mb:.0f}MB): {best:.2f}s = {mb/best:.1f}MB/s",
        flush=True,
    )


def h2d(name, nbytes, iters=2):
    host = np.random.default_rng(0).integers(
        0, 255, size=nbytes, dtype=np.uint8
    )
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        x = jax.device_put(host)
        float(np.asarray(x[-1]))  # force completion (axon: no BUR)
        times.append(time.perf_counter() - t0)
        del x
    mb = nbytes / 1e6
    best = min(times)
    print(
        f"H2D {name} ({mb:.0f}MB): {best:.2f}s = {mb/best:.1f}MB/s",
        flush=True,
    )


for m, d, nm in (
    (1 << 20, jnp.uint32, "u32 4MB"),
    (1 << 22, jnp.uint32, "u32 16MB"),
    (1 << 24, jnp.uint32, "u32 64MB"),
    (10_000_000, jnp.uint64, "u64 80MB"),
    (30_000_000, jnp.uint32, "u32 120MB"),
):
    d2h(nm, m, d)

for nbytes, nm in (
    (4 << 20, "4MB"),
    (16 << 20, "16MB"),
    (64 << 20, "64MB"),
    (120 << 20, "120MB"),
):
    h2d(nm, nbytes)
