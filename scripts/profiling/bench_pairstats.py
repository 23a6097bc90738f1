"""On-chip benchmark of the fused Pallas pair-statistics kernel.

Input honors the kernel's layout contract (segment-grouped rows,
ascending duplicate-free sids within a segment, -1 = dropped) --
vectorized generator, metagenome-like segment sizes (mostly 1-3).
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from simka_tpu.ops.pairstats import pair_stats_default

N = 8
E = 1 << 24
rng = np.random.default_rng(0)

# segment sizes 1..4 weighted toward singletons, then per segment a
# sorted duplicate-free sid choice realized vectorized: draw a random
# key per (segment, bank), keep the L smallest banks per segment
sizes = rng.choice([1, 1, 2, 2, 3, 4], size=E)
sizes = sizes[np.cumsum(sizes) <= E]
n_seg = len(sizes)
keys = rng.random((n_seg, N)).argsort(axis=1)  # random bank permutation
rows_seg = np.repeat(np.arange(n_seg), sizes)
pos_in_seg = np.arange(len(rows_seg)) - np.repeat(
    np.concatenate([[0], np.cumsum(sizes)[:-1]]), sizes
)
picked = keys[rows_seg, pos_in_seg]  # L distinct banks per segment
# ascending sids within each segment (the kernel's a < b contract)
order = np.lexsort((picked, rows_seg))
sid = picked[order].astype(np.int32)
seg = rows_seg.astype(np.int32)
cnt = rng.integers(1, 50, size=len(seg)).astype(np.int32)
pad = E - len(seg)
seg = np.concatenate([seg, np.full(pad, -1, np.int32)])
sid = np.concatenate([sid, np.zeros(pad, np.int32)])
cnt = np.concatenate([cnt, np.zeros(pad, np.int32)])

segj = jnp.asarray(seg)
sidj = jnp.asarray(sid)
cntj = jnp.asarray(cnt)


@jax.jit
def step(seg, sid, cnt):
    o = pair_stats_default(seg, sid, cnt, n_banks=N, panel=2048)
    return (o["bray"][0, 1] + o["shared_kmers_ab"][0, 1]
            + o["solid_per_bank"][0]).astype(jnp.float32)


t0 = time.perf_counter()
float(np.asarray(step(segj, sidj, cntj)))
print(f"compile+first run: {time.perf_counter()-t0:.1f}s")
iters = 5
t0 = time.perf_counter()
for _ in range(iters):
    float(np.asarray(step(segj, sidj, cntj)))
dt = (time.perf_counter() - t0) / iters
print(f"pairstats kernel: {dt*1000:.1f} ms for E={E} ({E/dt/1e6:.0f}M rows/s)")
