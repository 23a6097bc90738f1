"""Per-phase wall-clock of the N=100 SimkaMin pipeline on chip
(bench_min_wide_n's data): sketch ingest / fused program / fetch /
file write / distance / export."""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    n_samples, n_reads, read_len = 100, 4_000, 100
    s = int(os.environ.get("PROBE_S", "100000"))
    rng = np.random.default_rng(11)
    tmp = tempfile.mkdtemp(prefix="minphase_")
    bases = np.frombuffer(b"ACGT", np.uint8)
    shared = bases[rng.integers(0, 4, size=(n_reads, read_len))]
    lines = []
    for smp in range(n_samples):
        path = os.path.join(tmp, f"S{smp}.fasta")
        own = bases[rng.integers(0, 4, size=(n_reads, read_len))]
        pick = rng.random(n_reads) < 0.3
        seqs = np.where(pick[:, None], shared, own)
        with open(path, "wb") as f:
            for i in range(n_reads):
                f.write(b">r%d\n" % i)
                f.write(seqs[i].tobytes())
                f.write(b"\n")
        lines.append(f"S{smp}: {path}")
    input_txt = os.path.join(tmp, "input.txt")
    with open(input_txt, "w") as f:
        f.write("\n".join(lines) + "\n")

    import simka_tpu.minhash.sketch as sk
    from simka_tpu.minhash import pipeline as mp

    if os.environ.get("PROBE_RUNMIN") == "1":
        # the product path (device-resident fast path + artifacts)
        for run in ("warm", "timed"):
            t0 = time.perf_counter()
            mp.run_simka_min(
                input_txt,
                os.path.join(tmp, f"outr_{run}"),
                kmer_size=21,
                sketch_size=s,
                verbose=False,
            )
            print(
                f"[{run}] s={s} run_simka_min "
                f"{time.perf_counter() - t0:.2f}s",
                flush=True,
            )
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        return

    times = {}
    real_batched = sk.compute_sketches_batched

    def timed_batched(*a, **k):
        t0 = time.perf_counter()
        out = real_batched(*a, **k)
        times["sketch_compute"] = time.perf_counter() - t0
        return out

    sk.compute_sketches_batched = timed_batched
    mp_sketch = mp.sketch_command

    for run in ("warm", "timed"):
        out_dir = os.path.join(tmp, f"out_{run}")
        os.makedirs(out_dir, exist_ok=True)
        t0 = time.perf_counter()
        sketch_path = os.path.join(out_dir, "sketch.bin")
        mp_sketch(input_txt, sketch_path, 21, s, 100, verbose=False)
        t_sketch = time.perf_counter() - t0
        t0 = time.perf_counter()
        dist_dir = os.path.join(out_dir, "distance")
        mp.distance_command(sketch_path, sketch_path, dist_dir)
        t_dist = time.perf_counter() - t0
        t0 = time.perf_counter()
        mp.export_command(dist_dir, sketch_path, sketch_path, out_dir)
        t_exp = time.perf_counter() - t0
        print(
            f"[{run}] s={s} sketch {t_sketch:.2f}s "
            f"(compute {times.get('sketch_compute', -1):.2f}s) "
            f"distance {t_dist:.2f}s export {t_exp:.2f}s "
            f"TOTAL {t_sketch + t_dist + t_exp:.2f}s",
            flush=True,
        )

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
