"""Multi-host execution: sample-sharded counting + device all-to-all join.

The reference's multi-node story is job scripts + a shared filesystem
(qsub templates, sentinel polling -- SimkaPotara.hpp:884-897). The
TPU-native design:

1. every host counts the per-sample spectra of ITS datasets locally
   (pure data parallelism over samples, no communication -- the role
   of the count jobs);
2. spectrum rows are binned by k-mer hash to their owner device and
   exchanged with ONE ``lax.all_to_all`` over the global mesh (the
   role of the N x P partition-file shuffle on the shared FS);
3. each device joins its hash range and the statistics are
   psum-reduced (the role of simkaMerge + the stats merge).

Everything here runs unchanged on a single process with virtual
devices (how it is tested) and on a real multi-host pod after
``jax.distributed.initialize`` -- the all_to_all rides ICI/DCN.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simka_tpu.ops.countjoin import JoinStats, join_stats_from_spectra
from simka_tpu.parallel.sharded import _mix_hash_np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed for a multi-host run (no-op when
    unconfigured / single-host)."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def run_simka_multihost(config) -> None:
    """Multi-host `simka`: every process counts its manifest datasets
    locally and joins over the global mesh.

    Replaces the reference's cluster mode (job templates + qsub +
    shared-FS sentinels, SimkaPotara.hpp:884-897): launch one process
    per host with identical arguments plus -coordinator/-num-hosts/
    -host-id; process 0 writes the matrices.

    Single-process invocations degenerate to the standard pipeline
    over the local mesh (that path is what CI exercises).
    """
    import os

    import numpy as np

    from simka_tpu.core.distances import compute_all_matrices
    from simka_tpu.core.output import write_all_matrices
    from simka_tpu.core.pipeline import (
        count_one_dataset,
        resolve_max_reads,
    )
    from simka_tpu.io.bank import count_dataset_reads
    from simka_tpu.core.stats import SimkaStatistics
    from simka_tpu.io.dsl import check_input_validity, parse_input_file
    from simka_tpu.utils.metrics import Metrics

    datasets = parse_input_file(config.input_filename)
    check_input_validity(datasets)
    ids = [d.id for d in datasets]
    n = len(ids)
    pid = jax.process_index()
    n_proc = jax.process_count()
    mine = datasets_for_process(n, pid, n_proc)
    metrics = Metrics()
    metrics.set("n_datasets", n)
    metrics.set("n_processes", n_proc)

    def log(msg):
        if config.verbose:
            print(f"[simka-tpu host {pid}] {msg}", flush=True)

    # -max-reads 0 (auto) must resolve to the SAME cap on every host:
    # each process counts the per-group reads of ITS datasets, the
    # vectors are allgathered, and (min + mean) / 2 is taken over the
    # global list (reference computeMaxReads semantics,
    # src/core/SimkaAlgorithm.cpp:376-445).
    if config.max_reads == 0:
        local_counts = np.zeros(n, np.int64)
        for s in mine:
            local_counts[s] = count_dataset_reads(
                datasets[s].banks,
                config.min_read_size,
                config.min_read_shannon_index,
            ) // max(len(datasets[s].banks), 1)
        if n_proc > 1:
            from jax.experimental import multihost_utils

            local_counts = multihost_utils.process_allgather(
                local_counts
            ).sum(axis=0)
        cap = resolve_max_reads(local_counts.tolist(), 0)
        log(f"auto -max-reads resolved globally to {cap}")
    else:
        cap = resolve_max_reads([], config.max_reads)

    ckpt = None
    if config.output_tmp_dir:
        from simka_tpu.core.checkpoint import CountCheckpoint

        # per-host checkpoint dirs: hosts only ever recount their own
        # manifest datasets (the reference's count_synchro sentinels
        # live per-dataset on the shared FS, SimkaPotara.hpp:838-842)
        ckpt = CountCheckpoint(
            os.path.join(config.output_tmp_dir, f"host{pid}")
        )

    word_parts, sids, cnts = [], [], []
    nb_reads = np.zeros(n, np.int64)
    with metrics.stage("count"):
        for s in mine:
            words, counts, nr, resumed = count_one_dataset(
                datasets[s], config, cap, ckpt=ckpt, log=log
            )
            if resumed:
                metrics.count("datasets_resumed", 1)
            if not word_parts:
                word_parts = [[] for _ in words]
            for i, w in enumerate(words):
                word_parts[i].append(w)
            sids.append(np.full(words[0].shape, s, np.int32))
            cnts.append(counts.astype(np.int32))
            nb_reads[s] = nr
    metrics.count("reads", int(nb_reads.sum()))

    words = tuple(np.concatenate(p) for p in word_parts)
    sid = np.concatenate(sids)
    counts = np.concatenate(cnts)

    mesh = Mesh(
        np.asarray(jax.devices()), axis_names=("shards",)
    )
    js = multihost_join_from_spectra(
        words,
        sid,
        counts,
        config.abundance_min,
        config.abundance_max,
        mesh=mesh,
        n_banks=n,
        simple=config.simple_dist,
        complex_=config.complex_dist,
    )
    if n_proc > 1:
        from jax.experimental import multihost_utils

        nb_reads = multihost_utils.process_allgather(nb_reads).sum(
            axis=0
        )
    if pid == 0:
        stats = SimkaStatistics.from_join_stats(
            js,
            ids,
            config.kmer_size,
            nb_reads,
            config.simple_dist,
            config.complex_dist,
        )
        matrices = compute_all_matrices(stats)
        os.makedirs(config.output_dir, exist_ok=True)
        write_all_matrices(config.output_dir, matrices, ids)
        metrics.set("nb_distinct_kmers", stats.nb_distinct_kmers)
        metrics.save(
            os.path.join(config.output_dir, "simka_metrics.json")
        )
        if config.verbose:
            print(stats.summary())


def datasets_for_process(
    n_datasets: int, process_id: int, num_processes: int
) -> List[int]:
    """Static sample-sharding manifest: which dataset indices this
    host ingests and counts (round-robin for balance)."""
    return list(range(process_id, n_datasets, num_processes))


def required_bin_cap(
    words: Tuple[np.ndarray, ...],
    n_devices: int,
    local_src_slots: int,
    pad_multiple: int = 256,
) -> int:
    """The per-(slot, device) row capacity this host's data needs in
    ``bin_rows_for_devices`` -- exposed so multi-process runs can
    allgather-max it into a globally agreed pad cap."""
    words = tuple(words)
    valid = words[0] != np.uint32(0xFFFFFFFF)
    h = words[0]
    for w in words[1:]:
        h = _mix_hash_np(h, w)
    dest = h[valid] % np.uint32(n_devices)
    counts_per_dest = np.bincount(
        dest.astype(np.int64), minlength=n_devices
    )[:n_devices]
    per_slot = -(-int(counts_per_dest.max(initial=0)) // local_src_slots)
    return max(pad_multiple, -(-per_slot // pad_multiple) * pad_multiple)


def bin_rows_for_devices(
    words: Tuple[np.ndarray, ...],
    sid: np.ndarray,
    counts: np.ndarray,
    n_devices: int,
    local_src_slots: int,
    pad_multiple: int = 256,
    cap: Optional[int] = None,
):
    """Bin this host's spectrum rows by destination device.

    Returns uint32 arrays of shape [local_src_slots, n_devices, cap]
    per word plus sid/count arrays: slot-major so each local device
    acts as one all_to_all source. Padding rows carry SENTINEL words.
    ``cap`` overrides the locally required capacity (multi-process
    runs must pass the globally agreed maximum so every process's
    shard has the same shape).
    """
    words = tuple(words)
    valid = words[0] != np.uint32(0xFFFFFFFF)
    h = words[0]
    for w in words[1:]:
        h = _mix_hash_np(h, w)
    dest = np.where(valid, h % np.uint32(n_devices), n_devices).astype(
        np.int64
    )
    order = np.argsort(dest, kind="stable")
    dest_sorted = dest[order]
    counts_per_dest = np.bincount(
        dest_sorted, minlength=n_devices + 1
    )[:n_devices]
    # split each destination's rows round-robin across local source
    # slots, so every local device carries ~1/L of the traffic
    per_slot = -(-int(counts_per_dest.max(initial=0)) // local_src_slots)
    needed = max(
        pad_multiple, -(-per_slot // pad_multiple) * pad_multiple
    )
    if cap is None:
        cap = needed
    elif cap < needed:
        raise ValueError(
            f"agreed bin cap {cap} < locally required {needed}"
        )

    shape = (local_src_slots, n_devices, cap)
    out_words = tuple(
        np.full(shape, 0xFFFFFFFF, np.uint32) for _ in words
    )
    out_sid = np.zeros(shape, np.int32)
    out_cnt = np.zeros(shape, np.int32)
    start = 0
    for d in range(n_devices):
        n = int(counts_per_dest[d])
        sel = order[start : start + n]
        for slot in range(local_src_slots):
            part = sel[slot::local_src_slots]
            m = len(part)
            for ow, w in zip(out_words, words):
                ow[slot, d, :m] = w[part]
            out_sid[slot, d, :m] = sid[part]
            out_cnt[slot, d, :m] = counts[part]
        start += n
    return out_words, out_sid, out_cnt


def multihost_join_from_spectra(
    words: Tuple[np.ndarray, ...],
    sid: np.ndarray,
    counts: np.ndarray,
    abundance_min: int,
    abundance_max: int,
    *,
    mesh: Mesh,
    n_banks: int,
    simple: bool = False,
    complex_: bool = False,
) -> JoinStats:
    """Join this process's local spectrum rows with every other host's
    via an in-program all_to_all, then compute global statistics.

    ``words``/``sid``/``counts`` are the rows counted BY THIS PROCESS
    (its manifest datasets). The function must be called on every
    process with the same mesh.
    """
    devices = mesh.devices.reshape(-1)
    n_dev = len(devices)
    local = [d for d in devices if d.process_index == jax.process_index()]
    n_local = max(len(local), 1)

    # the binned arrays' trailing dim must be IDENTICAL on every
    # process (they become one global sharded array): agree on the
    # max required capacity across processes
    cap = required_bin_cap(tuple(words), n_dev, n_local)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        cap = int(
            multihost_utils.process_allgather(
                np.asarray([cap], np.int64)
            ).max()
        )
    bw, bs, bc = bin_rows_for_devices(
        tuple(words), sid, counts, n_dev, n_local, cap=cap
    )
    nw = len(bw)

    arrays = []
    sharding = NamedSharding(mesh, P("shards"))
    for arr in (*bw, bs, bc):
        # [L, n_dev, cap] local block -> global [n_dev, n_dev, cap]
        # sharded along axis 0 (source device)
        garr = jax.make_array_from_process_local_data(
            sharding,
            arr,
            global_shape=(n_dev,) + arr.shape[1:],
        )
        arrays.append(garr)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            tuple(P("shards") for _ in range(nw)),
            P("shards"),
            P("shards"),
        ),
        out_specs=jax.tree.map(
            lambda _: P(), JoinStats(*[0] * len(JoinStats._fields))
        ),
    )
    def step(words_b, sid_b, cnt_b):
        # [1, n_dev, cap] per source device; exchange so that each
        # device gathers its destination column from every source
        def a2a(x):
            y = jax.lax.all_to_all(
                x, "shards", split_axis=1, concat_axis=0, tiled=True
            )
            return y.reshape(-1)

        w_loc = tuple(a2a(w) for w in words_b)
        return join_stats_from_spectra(
            w_loc,
            a2a(sid_b),
            a2a(cnt_b),
            jnp.int32(abundance_min),
            jnp.int64(abundance_max),
            n_banks=n_banks,
            simple=simple,
            complex_=complex_,
            vary_axes=("shards",),
            psum_axis="shards",
        )

    return step(tuple(arrays[:nw]), arrays[nw], arrays[nw + 1])
