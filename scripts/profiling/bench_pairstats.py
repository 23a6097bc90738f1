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
# metagenome-like: segment lengths mostly 1-3, counts small
seg_sizes = rng.integers(1, 4, size=E)
seg_ids = np.repeat(np.arange(len(seg_sizes)), seg_sizes)[:E]
sid = np.zeros(E, np.int32)
pos = 0
rng2 = np.random.default_rng(1)
# ascending sids within a segment: just use sorted random choice quickly
sid = (seg_ids * 2654435761 % 8 + np.arange(E) % 3).astype(np.int32) % 8
cnt = rng.integers(1, 50, size=E).astype(np.int32)
seg = seg_ids.astype(np.int32)

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
