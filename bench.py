"""Headline benchmark: k-mers counted+joined per second per chip.

Measures the fused sort -> count -> join -> distance-stats program
(the entirety of the reference's simkaCount+simkaMerge hot loops,
SURVEY.md §3.2-3.3) on a synthetic canonical k-mer instance stream
with metagenome-like multiplicity (~2x coverage, 8 samples).

Kept to ONE jitted program: the remote TPU compile service in this
environment has high-variance latency, so the bench minimizes compile
surface. (K-mer extraction is benchmarked separately in profiling; it
runs at ~1G windows/s and is never the bottleneck.)

Timing note: on the axon TPU platform jax.block_until_ready does not
reliably block, so every timed iteration fetches a scalar derived from
the full output to host.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against CPU simka's order-of-magnitude throughput
on a multicore node (~10M k-mers/s; the repo publishes no absolute
numbers -- SURVEY.md §6 -- so this anchor is recorded here explicitly).
"""

import json
import time

import numpy as np


CPU_SIMKA_BASELINE_KMERS_PER_SEC = 10_000_000.0


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from simka_tpu.ops.countjoin import count_join_stats

    n_banks = 8
    E = 1 << 24  # 16.7M k-mer instances
    rng = np.random.default_rng(0)
    # ~2x coverage: every k-mer appears ~2x within a sample on average
    space = E // 2
    vals = rng.integers(0, space, size=E, dtype=np.uint64)
    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    sid = jnp.asarray(rng.integers(0, n_banks, size=E).astype(np.int32))

    f = functools.partial(count_join_stats, n_banks=n_banks)

    @jax.jit
    def step(hi, lo, sid):
        js = f(hi, lo, sid, jnp.int32(1), jnp.int64(10**9))
        return (
            js.nb_distinct
            + js.shared_distinct[0, 1]
            + js.bray_numerator[0, 1]
            + js.shared_kmers_ab[0, 1]
        ).astype(jnp.float32)

    float(np.asarray(step(hi, lo, sid)))  # compile + warmup

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        float(np.asarray(step(hi, lo, sid)))
    dt = (time.perf_counter() - t0) / iters

    rate = E / dt
    print(
        json.dumps(
            {
                "metric": "kmers_counted_joined_per_sec_per_chip",
                "value": round(rate, 1),
                "unit": "kmers/s",
                "vs_baseline": round(
                    rate / CPU_SIMKA_BASELINE_KMERS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
