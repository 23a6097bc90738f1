"""Pallas gap-close for the stable compaction (ops/compact.py).

compact_rows closes inter-block gaps with a sequential fori_loop of
``dynamic_update_slice`` writes -- ~nblocks (512 at E=2^24) tiny
ordered HBM writes whose per-iteration overhead, not their bytes,
dominates the pass (the round-1 tuning table shows the cost RISING
again as blocks shrink). This kernel replaces the loop with one grid
traversal of dynamic-offset async DMAs: grid step b copies block b's
locally-compacted rows to its global rank offset, strictly in order
(dimension_semantics "arbitrary" keeps TPU grid steps sequential, so
later blocks overwrite earlier blocks' fill tails exactly like the
fori_loop did).

Scope: the HBM->HBM copy engine only -- the block-local stable sort
(phase 1) stays in XLA where it fuses with the surrounding program.
64-bit columns ride as bitcast u32 pairs (2x width, 2x offset);
memory layout is identical so the copy is bit-exact.

SIMKA_TPU_PALLAS=0 forces the fori_loop path; =1 forces Pallas; auto
uses Pallas on the TPU backend only (measured on-chip A/B in
scripts/profiling/bench_compact.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def pallas_available() -> bool:
    # RECORDED NEGATIVE (round 5, on-chip): Mosaic rejects the
    # dynamic-offset HBM DMA this kernel needs -- "Slice shape along
    # dimension 0 must be aligned to tiling (8)" for 2-D row slices,
    # and the 1-D probe (scripts/profiling/test_dma_align.py) fails
    # at any offset that is not tile-aligned (131, 777 -> compile
    # error). Rank offsets are arbitrary by construction, so the
    # gap-close (and every radix-partition scheme needing
    # place-at-rank writes) cannot be expressed; the fori_loop of
    # dynamic_update_slice stays the production path. =1 keeps the
    # kernel testable under the Pallas interpreter (CPU).
    return os.environ.get("SIMKA_TPU_PALLAS") == "1"


@functools.lru_cache(maxsize=None)
def _gapclose_call(n_cols: int, nblocks: int, block: int, dtypes):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() != "tpu"

    def kernel(offs_ref, *refs):
        # refs: n_cols inits (aliased to outs), n_cols block inputs,
        # n_cols outs, then the DMA semaphores
        ins = refs[n_cols : 2 * n_cols]
        outs = refs[2 * n_cols : 3 * n_cols]
        sem = refs[3 * n_cols]
        b = pl.program_id(0)
        off = offs_ref[b]
        for c in range(n_cols):
            # x64 mode makes bare python ints i64; Mosaic's memref
            # slicing wants i32 indices
            ci = jnp.int32(c)
            pltpu.make_async_copy(
                ins[c].at[b],
                outs[c].at[pl.ds(off, block)],
                sem.at[ci],
            ).start()
        for c in range(n_cols):
            ci = jnp.int32(c)
            pltpu.make_async_copy(
                ins[c].at[b],
                outs[c].at[pl.ds(off, block)],
                sem.at[ci],
            ).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (2 * n_cols),
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_cols,
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_cols,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((nblocks * block,), jnp.dtype(d))
            for d in dtypes
        ),
        # init arrays (pre-filled tails) alias the outputs; operand 0
        # is the scalar-prefetch offsets, so inits are operands 1..C
        input_output_aliases={1 + c: c for c in range(n_cols)},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )


def gapclose(offs, inits, blocks_cols, block: int):
    """Ordered block writes: for b in range(nblocks), copy
    ``blocks_cols[c][b]`` into output c at ``offs[b]``, over the
    pre-filled ``inits``. 64-bit columns are bitcast to u32 pairs.

    Args: offs [nblocks] i32 global rank offsets; inits: tuple of [E]
    pre-filled outputs (E = nblocks*block); blocks_cols: tuple of
    [nblocks, block] locally-compacted columns.
    """
    nblocks = blocks_cols[0].shape[0]
    offs = offs.astype(jnp.int32)
    prep, meta = [], []
    for init, col in zip(inits, blocks_cols):
        if col.dtype.itemsize == 8:
            c2 = jax.lax.bitcast_convert_type(col, jnp.uint32)
            i2 = jax.lax.bitcast_convert_type(init, jnp.uint32)
            prep.append(
                (
                    i2.reshape(-1),
                    c2.reshape(nblocks, 2 * block),
                )
            )
            meta.append((col.dtype, True))
        else:
            prep.append((init, col))
            meta.append((col.dtype, False))
    widths = [2 if wide else 1 for _, wide in meta]
    if len(set(widths)) == 1:
        w = widths[0]
        call = _gapclose_call(
            len(prep),
            nblocks,
            block * w,
            tuple(str(i.dtype) for i, _ in prep),
        )
        outs = call(offs * w, *[i for i, _ in prep],
                    *[c for _, c in prep])
    else:
        outs = []
        for (i, c), wid in zip(prep, widths):
            call = _gapclose_call(
                1, nblocks, block * wid, (str(i.dtype),)
            )
            outs.append(call(offs * wid, i, c)[0])
    res = []
    for o, (dt, wide) in zip(outs, meta):
        if wide:
            o = jax.lax.bitcast_convert_type(
                o.reshape(-1, 2), dt
            ).reshape(-1)
        res.append(o)
    return tuple(res)
