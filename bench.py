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
import os
import shutil
import tempfile
import time

import numpy as np


CPU_SIMKA_BASELINE_KMERS_PER_SEC = 10_000_000.0


def bench_end_to_end():
    """FASTA -> all distance matrices wall-clock (reads/s, kmers/s).

    Measures the WHOLE product path -- native ingest, device k-mer
    extraction, fused count+join, host distance formulas, csv.gz --
    on a synthetic 4-sample metagenome (100k reads x 100 bp each).
    The first run warms the XLA compile cache; the second is timed
    (steady-state, which is what a production sweep over many inputs
    experiences).
    """
    from simka_tpu.config import SimkaConfig
    from simka_tpu.core.pipeline import run_simka

    n_samples, n_reads, read_len, k = 4, 100_000, 100, 21
    rng = np.random.default_rng(7)
    tmp = tempfile.mkdtemp(prefix="simka_bench_")
    try:
        lines = []
        bases = np.frombuffer(b"ACGT", np.uint8)
        for s in range(n_samples):
            path = os.path.join(tmp, f"S{s}.fasta")
            codes = rng.integers(0, 4, size=(n_reads, read_len))
            seqs = bases[codes]
            with open(path, "wb") as f:
                for i in range(n_reads):
                    f.write(b">r%d\n" % i)
                    f.write(seqs[i].tobytes())
                    f.write(b"\n")
            lines.append(f"S{s}: {path}")
        input_txt = os.path.join(tmp, "input.txt")
        with open(input_txt, "w") as f:
            f.write("\n".join(lines) + "\n")

        def once(tag):
            out = os.path.join(tmp, f"out_{tag}")
            t0 = time.perf_counter()
            run_simka(
                SimkaConfig(
                    input_filename=input_txt,
                    output_dir=out,
                    kmer_size=k,
                    abundance_min=2,
                    verbose=False,
                    n_shards=1,
                )
            )
            return time.perf_counter() - t0

        once("warm")
        dt = once("timed")
        total_reads = n_samples * n_reads
        total_kmers = total_reads * (read_len - k + 1)
        return {
            "e2e_wall_s": round(dt, 2),
            "e2e_reads_per_sec": round(total_reads / dt, 1),
            "e2e_kmers_per_sec": round(total_kmers / dt, 1),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


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

    # hi_bits=10 models the default k=21 (42-bit kmers): the packed
    # u64-key fast path is what real k<=26 runs take
    f = functools.partial(count_join_stats, n_banks=n_banks, hi_bits=10)

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

    e2e = bench_end_to_end()

    print(
        json.dumps(
            {
                "metric": "kmers_counted_joined_per_sec_per_chip",
                "value": round(rate, 1),
                "unit": "kmers/s",
                "vs_baseline": round(
                    rate / CPU_SIMKA_BASELINE_KMERS_PER_SEC, 3
                ),
                **e2e,
            }
        )
    )


if __name__ == "__main__":
    main()
