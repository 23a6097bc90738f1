"""Capability probe: dynamic-offset 1-D HBM<->VMEM DMA alignment.

Answers whether Mosaic allows make_async_copy of a 1-D slice at an
arbitrary (non-128-multiple) element offset -- this gates the design
of the merge-path sort and any radix-partition kernel.
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V = 1024
E = 8192


def kernel(off_ref, x_hbm, out_hbm, scratch, sem1, sem2):
    off = off_ref[0]
    # read V elements from HBM at dynamic element offset
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(off, V)], scratch, sem1)
    cp.start()
    cp.wait()
    scratch[...] = scratch[...] + 1
    # write V elements to HBM at dynamic element offset + 37 (unaligned)
    cp2 = pltpu.make_async_copy(scratch, out_hbm.at[pl.ds(off + 37, V)], sem2)
    cp2.start()
    cp2.wait()


@jax.jit
def run(x, off):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((V,), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((E,), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(off, x)


x = jnp.arange(E, dtype=jnp.int32)
for off_v in (0, 128, 131, 777):
    try:
        out = np.asarray(run(x, jnp.array([off_v], jnp.int32)))
        got = out[off_v + 37 : off_v + 37 + V]
        want = np.arange(off_v, off_v + V) + 1
        ok = np.array_equal(got, want)
        print(f"offset {off_v}: {'OK' if ok else 'WRONG RESULT'}")
    except Exception as e:  # noqa
        print(f"offset {off_v}: FAILED: {type(e).__name__}: {str(e)[:300]}")
