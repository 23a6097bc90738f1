"""Exact integer matmul on the MXU via limb decomposition.

The distance sufficient statistics need exact integer Gram-style
products (C^T @ P, P^T @ P, C^T @ C) where C holds k-mer counts and P
presence masks. A plain float32 MXU matmul loses exactness once partial
sums pass 2^24, and TPUs have no native wide-integer matmul. Classic
fix: split each operand into small limbs, do one f32 matmul per limb
pair (each exact by construction), and recombine in int64.

With LIMB_BITS=11 and chunk rows <= 4096: per-limb products are
< 2^22, partial sums < 2^22 * 4096 = 2^34... so we additionally require
the *other* operand's limb to be <= 2^11, giving products < 2^22 and
row-sums < 2^22 * 4096 = 2^34 -- too big. Hence the real constraint:
rows_per_chunk * (2^LIMB_BITS - 1)^2 < 2^24 must hold per limb-pair
product only when both operands are multi-limb. We therefore fix
LIMB_BITS so that (2^LIMB_BITS - 1)^2 * rows <= 2^24 is NOT required;
instead each limb-pair matmul accumulates values bounded by
(2^a - 1) * (2^b - 1) * rows and we pick a, b per call to keep that
below 2^24 (f32 exact-integer range).
"""

from __future__ import annotations

import jax.numpy as jnp


def _split_limbs(x, limb_bits: int, n_limbs: int):
    x = x.astype(jnp.int64)
    mask = (1 << limb_bits) - 1
    return [
        ((x >> (limb_bits * i)) & mask).astype(jnp.float32)
        for i in range(n_limbs)
    ]


def exact_int_matmul(a, b, a_bits: int = 33, b_bits: int = 1):
    """Exact a.T @ b for non-negative integer arrays.

    Args:
      a: [R, N] integer array, values < 2**a_bits.
      b: [R, M] integer array, values < 2**b_bits.
      a_bits/b_bits: static bounds on operand magnitude.

    Returns: [N, M] int64, exact.

    Limb sizing: a limb-pair product sums R terms each bounded by
    (2^la - 1) * (2^lb - 1); exactness in f32 needs
    R * 2^(la + lb) <= 2^24, i.e. la + lb <= 24 - ceil(log2 R).
    """
    R = a.shape[0]
    budget = 24 - max(1, (R - 1).bit_length())
    if budget < 2:
        raise ValueError(f"chunk of {R} rows too large for exact f32 matmul")
    if b_bits == 1:
        la = min(budget - 1, a_bits)
        lb = 1
    else:
        la = max(1, budget // 2)
        lb = max(1, budget - la)
    n_a = -(-a_bits // la)
    n_b = -(-b_bits // lb)

    a_limbs = _split_limbs(a, la, n_a)
    b_limbs = _split_limbs(b, lb, n_b)

    out = jnp.zeros((a.shape[1], b.shape[1]), jnp.int64)
    for i, al in enumerate(a_limbs):
        for j, bl in enumerate(b_limbs):
            part = jnp.dot(al.T, bl, preferred_element_type=jnp.float32)
            out = out + (part.astype(jnp.int64) << (la * i + lb * j))
    return out
