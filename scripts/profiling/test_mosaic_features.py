import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def probe(name, kernel, inputs, out_shape):
    try:
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(*out_shape)
        )(*inputs)
        np.asarray(out)
        print(f"{name}: OK")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:100]}")


# a. dot_general contracting dim 0, bf16
def ka(x_ref, o_ref):
    x = x_ref[...].astype(jnp.bfloat16)
    o_ref[...] = jax.lax.dot_general(
        x, x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


probe("dot dim0 bf16", ka, [jnp.ones((2048, 128), jnp.float32)],
      ((128, 128), jnp.float32))


# b. variable per-lane shift
def kb(x_ref, o_ref):
    q = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
    o_ref[...] = (x_ref[...] >> (q % jnp.int32(4) * jnp.int32(8))) & jnp.int32(255)


probe("variable lane shift", kb, [jnp.ones((256, 128), jnp.int32)],
      ((256, 128), jnp.int32))


# c. sublane-offset slicing of (4096,1)
def kc(x_ref, o_ref):
    w = jnp.concatenate([x_ref[...], x_ref[...]])[:, None]
    o_ref[...] = w[3:2051] + w[:2048]


probe("sublane slice (4096,1)", kc, [jnp.ones((2048,), jnp.int32)],
      ((2048, 1), jnp.int32))


# d. lax.cond around a matmul with tuple carry
def kd(x_ref, o_ref):
    x = x_ref[...]
    pred = jnp.max(x) > 0.0

    def f(s):
        p = jax.lax.dot_general(
            x.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (s[0] + p,)

    s = jax.lax.cond(pred, f, lambda s: s,
                     (jnp.zeros((128, 128), jnp.float32),))
    o_ref[...] = s[0]


probe("cond(matmul) tuple", kd, [jnp.ones((2048, 128), jnp.float32)],
      ((128, 128), jnp.float32))


# e. scalar f32 max reduce -> bool pred
def ke(x_ref, o_ref):
    pred = jnp.max(x_ref[...].astype(jnp.float32)) > 0.0
    o_ref[...] = jnp.where(pred, x_ref[...], x_ref[...] * 2)


probe("f32 max->pred", ke, [jnp.ones((256, 128), jnp.int32)],
      ((256, 128), jnp.int32))
