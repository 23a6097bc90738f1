"""Headline benchmark: k-mers counted+joined per second per chip.

Measures the fused extract -> sort -> count -> join -> distance-stats
path (the entirety of the reference's simkaCount+simkaMerge hot loops,
SURVEY.md §3.2-3.3) on synthetic reads, steady-state.

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
    import jax
    import jax.numpy as jnp

    from simka_tpu.ops.countjoin import count_join_stats
    from simka_tpu.ops.kmers import extract_canonical_kmers

    k = 21
    n_banks = 8
    read_len = 128
    n_reads = 1 << 14  # per sample -> ~14M k-mer instances total

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(n_banks * n_reads, read_len)).astype(
        np.uint8
    )
    sid = np.repeat(
        np.arange(n_banks, dtype=np.int32), n_reads * (read_len - k + 1)
    )
    codes_d = jnp.asarray(codes)
    sid_d = jnp.asarray(sid)

    @jax.jit
    def step(codes_d, sid_d):
        hi, lo, _ = extract_canonical_kmers(codes_d, k)
        js = count_join_stats(
            hi.ravel(),
            lo.ravel(),
            sid_d,
            jnp.int32(1),
            jnp.int64(10**9),
            n_banks=n_banks,
            simple=False,
            complex_=False,
        )
        # a scalar touching every accumulator, fetched to host each
        # iteration so the timing loop cannot run ahead of the device
        return (
            js.nb_distinct
            + js.shared_distinct[0, 1]
            + js.bray_numerator[0, 1]
            + js.shared_kmers_ab[0, 1]
        ).astype(jnp.float32)

    float(np.asarray(step(codes_d, sid_d)))  # compile + warmup

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        float(np.asarray(step(codes_d, sid_d)))
    dt = (time.perf_counter() - t0) / iters

    n_kmers = n_banks * n_reads * (read_len - k + 1)
    rate = n_kmers / dt
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
