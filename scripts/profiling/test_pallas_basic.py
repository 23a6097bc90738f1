"""Bisect Mosaic capabilities on the axon TPU: start minimal, add features."""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def t(name, fn):
    try:
        r = fn()
        print(f"{name}: OK {r}")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


# 1. trivial 2-D VMEM kernel
def k1(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2


def f1():
    x = jnp.ones((256, 256), jnp.float32)
    out = pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32)
    )(x)
    return float(np.asarray(out)[0, 0])


t("basic 2d vmem", f1)


# 2. 1-D arrays
def f2():
    x = jnp.ones((1024,), jnp.int32)
    out = pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((1024,), jnp.int32)
    )(x)
    return int(np.asarray(out)[0])


t("1d vmem", f2)


# 3. ANY memory + explicit DMA, static offsets
def k3(x_hbm, o_hbm, scratch, sem1, sem2):
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(0, 1024)], scratch, sem1)
    cp.start()
    cp.wait()
    scratch[...] = scratch[...] + 1
    cp2 = pltpu.make_async_copy(scratch, o_hbm.at[pl.ds(0, 1024)], sem2)
    cp2.start()
    cp2.wait()


def f3():
    x = jnp.arange(8192, dtype=jnp.int32)
    out = pl.pallas_call(
        k3,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((1024,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        out_shape=jax.ShapeDtypeStruct((8192,), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)
    return int(np.asarray(out)[5])


t("1d ANY + static dma", f3)


# 4. same but 2-D shapes (row-aligned DMA)
def k4(x_hbm, o_hbm, scratch, sem1, sem2):
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(0, 8), :], scratch, sem1)
    cp.start()
    cp.wait()
    scratch[...] = scratch[...] + 1
    cp2 = pltpu.make_async_copy(scratch, o_hbm.at[pl.ds(8, 8), :], sem2)
    cp2.start()
    cp2.wait()


def f4():
    x = jnp.ones((64, 128), jnp.int32)
    out = pl.pallas_call(
        k4,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)
    return int(np.asarray(out)[8, 0])


t("2d ANY + static row dma", f4)

# 5. dynamic offset 2-D row DMA (row-aligned, dynamic row index)
def k5(off_ref, x_hbm, o_hbm, scratch, sem1, sem2):
    off = off_ref[0]
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(off, 8), :], scratch, sem1)
    cp.start()
    cp.wait()
    scratch[...] = scratch[...] + 1
    cp2 = pltpu.make_async_copy(scratch, o_hbm.at[pl.ds(off + 1, 8), :], sem2)
    cp2.start()
    cp2.wait()


def f5():
    x = jnp.ones((64, 128), jnp.int32)
    out = pl.pallas_call(
        k5,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((8, 128), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.array([4], jnp.int32), x)
    return int(np.asarray(out)[5, 0])


t("2d dyn row dma + prefetch", f5)

# 6. dynamic UNALIGNED 1-D dma
def k6(off_ref, x_hbm, o_hbm, scratch, sem1, sem2):
    off = off_ref[0]
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(off, 1024)], scratch, sem1)
    cp.start()
    cp.wait()
    scratch[...] = scratch[...] + 1
    cp2 = pltpu.make_async_copy(scratch, o_hbm.at[pl.ds(off + 37, 1024)], sem2)
    cp2.start()
    cp2.wait()


def f6():
    x = jnp.arange(8192, dtype=jnp.int32)
    out = pl.pallas_call(
        k6,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((1024,), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((8192,), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.array([131], jnp.int32), x)
    o = np.asarray(out)
    got = o[131 + 37 : 131 + 37 + 1024]
    want = np.arange(131, 131 + 1024) + 1
    return bool(np.array_equal(got, want))


t("1d dyn UNALIGNED dma", f6)
