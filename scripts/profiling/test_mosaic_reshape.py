import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def probe(name, kernel, x, out_shape):
    try:
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(*out_shape)
        )(x)
        np.asarray(out)
        print(f"{name}: OK")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")


# 1. i32 1d -> 2d [:, None]
def k1(x_ref, o_ref):
    o_ref[...] = x_ref[...][:, None] + 1


probe("i32 [2048]->[2048,1]", k1, jnp.ones((2048,), jnp.int32),
      ((2048, 1), jnp.int32))


# 2. f32 1d -> 2d
def k2(x_ref, o_ref):
    o_ref[...] = x_ref[...][:, None] * 2.0


probe("f32 [2048]->[2048,1]", k2, jnp.ones((2048,), jnp.float32),
      ((2048, 1), jnp.float32))


# 3. 1d broadcast against iota producing [2048, 128]
def k3(x_ref, o_ref):
    iota = jax.lax.broadcasted_iota(jnp.int32, (2048, 128), 1)
    o_ref[...] = jnp.where(x_ref[...][:, None] == iota, 1.0, 0.0)


probe("onehot [2048]x[2048,128]", k3, jnp.ones((2048,), jnp.int32),
      ((2048, 128), jnp.float32))


# 4. (16,128) -> (2048,1)
def k4(x_ref, o_ref):
    o_ref[...] = x_ref[...].reshape(2048, 1) + 1


probe("i32 (16,128)->(2048,1)", k4, jnp.ones((16, 128), jnp.int32),
      ((2048, 1), jnp.int32))


# 5. bool ops in [2048,1] native 2d
def k5(x_ref, o_ref):
    m = x_ref[...] >= 0
    iota = jax.lax.broadcasted_iota(jnp.int32, (2048, 128), 1)
    oh = jnp.where(m & (x_ref[...] == iota), 1.0, 0.0)
    o_ref[...] = oh


probe("bool 2d [2048,1] mask", k5, jnp.ones((2048, 1), jnp.int32),
      ((2048, 128), jnp.float32))


# 6. matmul with [2048,128] built operands
def k6(x_ref, o_ref):
    iota = jax.lax.broadcasted_iota(jnp.int32, (2048, 128), 1)
    oh = jnp.where(x_ref[...] == iota % 8, 1.0, 0.0).astype(jnp.bfloat16)
    o_ref[...] = jax.lax.dot_general(
        oh, oh, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


probe("dot [2048,128]T@[2048,128]", k6, jnp.ones((2048, 1), jnp.int32),
      ((128, 128), jnp.float32))

# 7. concat along axis0 of (2048,1)
def k7(x_ref, o_ref):
    w = jnp.concatenate([x_ref[...], x_ref[...]])
    o_ref[...] = w[5:2053] + 1


probe("concat+slice (2048,1)", k7, jnp.ones((2048, 1), jnp.int32),
      ((2048, 1), jnp.int32))
