"""On-chip A/B of the singleton-prune program split vs the fused join
at wide N and realistic singleton fractions (ROADMAP lever 3 /
VERDICT r3 next-step 2).

Stream model: values below a cut are forced single-bank, so the
fraction of (kmer, bank) rows sitting in size-1 segments is ~f +
(1-f)/N -- 50-80% covers real metagenomes.

Run on the TPU:
  python scripts/profiling/bench_split_join.py [N ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from simka_tpu.ops.countjoin import (
    count_join_stats,
    count_join_stats_split,
)


def make_stream(rng, E, n_banks, singleton_frac):
    space = E // 2
    vals = rng.integers(0, space, size=E, dtype=np.uint64)
    sid = rng.integers(0, n_banks, size=E).astype(np.int32)
    cut = int(space * singleton_frac)
    single = vals < cut
    sid[single] = (vals[single] % n_banks).astype(np.int32)
    hi = (vals >> np.uint64(32)).astype(np.uint32)
    lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(sid)


def checksum(js):
    return float(
        np.asarray(
            js.nb_distinct
            + js.shared_distinct[0, 1]
            + js.bray_numerator[0, 1]
            + js.shared_kmers_ab[0, 1]
        )
    )


def bench(fn, hi, lo, sid, n_banks, iters=3):
    kw = dict(n_banks=n_banks, hi_bits=10)
    args = (hi, lo, sid, jnp.int32(1), jnp.int64(10**9))
    c = checksum(fn(*args, **kw))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        checksum(fn(*args, **kw))
    dt = (time.perf_counter() - t0) / iters
    return hi.shape[0] / dt, c


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [50, 128]
    E = 1 << 23
    for n in ns:
        for frac in (0.5, 0.8):
            rng = np.random.default_rng(1)
            hi, lo, sid = make_stream(rng, E, n, frac)
            r_fused, c1 = bench(count_join_stats, hi, lo, sid, n)
            r_split, c2 = bench(
                count_join_stats_split, hi, lo, sid, n
            )
            flag = "" if c1 == c2 else "  CHECK MISMATCH"
            print(
                f"N={n:4d} f={frac}  fused {r_fused / 1e6:7.1f}M  "
                f"split {r_split / 1e6:7.1f}M  "
                f"({r_split / r_fused:.2f}x){flag}",
                flush=True,
            )
