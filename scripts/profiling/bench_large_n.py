"""On-chip scaling bench of the fused kernel across sample counts N.

Simka's headline use case is hundreds of samples
(/root/reference/README.md; simkaMin.py tiles at 100). The lane-packed
pair path packs P = 64//N shifts per MXU pass, so the pass count grows
as ~2*ceil((N-1)/P) ~ N^2/32 once N > 64-ish; this script measures
where that curve leaves the sort-dominated regime and whether the
Pallas pair kernel (O(E) HBM, lane-packed channels) should take over.

Run on the TPU:  python scripts/profiling/bench_large_n.py [N ...]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from simka_tpu.ops.countjoin import count_join_stats


def bench_n(n_banks: int, E: int = 1 << 23, iters: int = 3) -> float:
    rng = np.random.default_rng(0)
    space = E // 2
    vals = rng.integers(0, space, size=E, dtype=np.uint64)
    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    sid = jnp.asarray(
        rng.integers(0, n_banks, size=E).astype(np.int32)
    )
    f = functools.partial(
        count_join_stats,
        n_banks=n_banks,
        hi_bits=10,
    )

    @jax.jit
    def step(hi, lo, sid):
        js = f(hi, lo, sid, jnp.int32(1), jnp.int64(10**9))
        return (
            js.nb_distinct
            + js.shared_distinct[0, 1]
            + js.bray_numerator[0, 1]
            + js.shared_kmers_ab[0, 1]
        ).astype(jnp.float32)

    float(np.asarray(step(hi, lo, sid)))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        float(np.asarray(step(hi, lo, sid)))
    dt = (time.perf_counter() - t0) / iters
    return E / dt


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [8, 32, 64, 128]
    for n in ns:
        rate = bench_n(n)
        print(f"N={n:4d}  {rate / 1e6:8.1f} M kmers/s", flush=True)
