"""On-chip compile/exec probe for sketch_multi_prefix: time compile +
run at increasing stream sizes to find the remote-compile wall that
ate the round-5 min bench (30 min timeout at E=2^25 with the
associative_scan formulation)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from simka_tpu.minhash.device import sketch_multi_prefix

    N, s = 100, 100_000
    for elog in (20, 22, 24, 25):
        E = 1 << elog
        rng = np.random.default_rng(elog)
        h = rng.integers(0, 1 << 63, size=E, dtype=np.uint64)
        sid = rng.integers(0, N, size=E).astype(np.int32)
        cap = min(E, N * s)
        hd, sd = jax.device_put(jnp.asarray(h)), jax.device_put(
            jnp.asarray(sid)
        )
        t0 = time.perf_counter()
        out = sketch_multi_prefix(
            hd, sd, n_samples=N, sketch_size=s, use_filter=False,
            cap=cap,
        )
        x = float(np.asarray(out[3]))  # n_full64 scalar -> sync
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = sketch_multi_prefix(
            hd, sd, n_samples=N, sketch_size=s, use_filter=False,
            cap=cap,
        )
        x += float(np.asarray(out[3]))
        t_run = time.perf_counter() - t0
        # full prefix fetch (the product-path transfer)
        t0 = time.perf_counter()
        _ = np.asarray(out[0])
        t_fetch = time.perf_counter() - t0
        print(
            f"E=2^{elog}: compile+first {t_compile:.1f}s "
            f"warm {t_run*1000:.0f}ms fetch({cap} rows) "
            f"{t_fetch:.2f}s (chk {x})",
            flush=True,
        )


if __name__ == "__main__":
    main()
