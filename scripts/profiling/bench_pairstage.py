"""On-chip shoot-out of pair-accumulation formulations.

Generates one realistic compacted row stream (segment-grouped
(seg, sid, cnt, kept), metagenome-like multiplicities, N=8) and times
each candidate pair-stage formulation on it in the same process, so a
single remote-compile session answers which one the product kernel
should use. Values are NOT checked here (equivalence lives in
tests/test_countjoin_paths.py); this is a pure timing harness.

Run:  python scripts/profiling/bench_pairstage.py [logE]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from simka_tpu.ops.intmatmul import BLOCK_ROWS

N = 8
LOG_E = int(sys.argv[1]) if len(sys.argv) > 1 else 24
E = 1 << LOG_E


def make_rows(rng):
    """Segment-grouped rows: sizes ~ bench distribution, ascending
    duplicate-free sids per segment, counts 1..30."""
    sizes = rng.choice([1, 1, 1, 2, 2, 3, 4], size=E)
    sizes = sizes[np.cumsum(sizes) <= E]
    n_seg = len(sizes)
    keys = rng.random((n_seg, N)).argsort(axis=1)
    rows_seg = np.repeat(np.arange(n_seg), sizes)
    pos = np.arange(len(rows_seg)) - np.repeat(
        np.concatenate([[0], np.cumsum(sizes)[:-1]]), sizes
    )
    picked = keys[rows_seg, pos]
    order = np.lexsort((picked, rows_seg))
    sid = picked[order].astype(np.int32)
    seg = rows_seg.astype(np.int32)
    cnt = rng.integers(1, 30, size=len(seg)).astype(np.int32)
    pad = E - len(seg)
    seg = np.concatenate([seg, np.full(pad, E, np.int32)])
    sid = np.concatenate([sid, np.full(pad, N, np.int32)])
    cnt = np.concatenate([cnt, np.zeros(pad, np.int32)])
    kept = seg != E
    return (
        jnp.asarray(seg),
        jnp.asarray(sid),
        jnp.asarray(cnt),
        jnp.asarray(kept),
    )


def _panels(x, fill=0):
    nb = -(-E // BLOCK_ROWS)
    pad = nb * BLOCK_ROWS - E
    if pad:
        x = jnp.pad(x, (0, pad), constant_values=fill)
    return x.reshape(nb, BLOCK_ROWS)


def _padded(seg, sid, cnt):
    padlen = N + 1
    return (
        jnp.concatenate([seg, jnp.full((padlen,), E, jnp.int32)]),
        jnp.concatenate([sid, jnp.full((padlen,), N, jnp.int32)]),
        jnp.concatenate([cnt, jnp.zeros((padlen,), jnp.int32)]),
    )


def variant_orig_f32(seg, sid, cnt, kept, d_max):
    """Round-1 shape: 4 einsums per shift, f32 one-hots."""
    seg_p, sid_p, cnt_p = _padded(seg, sid, cnt)
    iota = jnp.arange(N, dtype=jnp.int32)[None, None, :]
    oh_a = (_panels(jnp.where(kept, sid, N), fill=N)[..., None] == iota
            ).astype(jnp.float32)

    def body(d, acc):
        seg_b = jax.lax.dynamic_slice_in_dim(seg_p, d, E)
        sid_b = jax.lax.dynamic_slice_in_dim(sid_p, d, E)
        cnt_b = jax.lax.dynamic_slice_in_dim(cnt_p, d, E)
        m = kept & (seg == seg_b)
        oh_b = (_panels(jnp.where(m, sid_b, N), fill=N)[..., None] == iota
                ).astype(jnp.float32)
        outs = []
        for v in (
            jnp.where(m, cnt, 0),
            jnp.where(m, cnt_b, 0),
            m.astype(jnp.int32),
            jnp.where(m, jnp.minimum(cnt, cnt_b), 0),
        ):
            vp = _panels(v).astype(jnp.float32)
            part = jnp.einsum(
                "bri,brj->bij", oh_a * vp[..., None], oh_b,
                preferred_element_type=jnp.float32,
            )
            outs.append(part.astype(jnp.int64).sum(axis=0))
        return [a + o for a, o in zip(acc, outs)]

    acc0 = [jnp.zeros((N, N), jnp.int64) for _ in range(4)]
    return jax.lax.fori_loop(1, d_max, body, acc0)


def variant_orig_bf16(seg, sid, cnt, kept, d_max):
    """Same as orig but bf16 one-hot operands."""
    seg_p, sid_p, cnt_p = _padded(seg, sid, cnt)
    iota = jnp.arange(N, dtype=jnp.int32)[None, None, :]
    oh_a = (_panels(jnp.where(kept, sid, N), fill=N)[..., None] == iota
            ).astype(jnp.bfloat16)

    def body(d, acc):
        seg_b = jax.lax.dynamic_slice_in_dim(seg_p, d, E)
        sid_b = jax.lax.dynamic_slice_in_dim(sid_p, d, E)
        cnt_b = jax.lax.dynamic_slice_in_dim(cnt_p, d, E)
        m = kept & (seg == seg_b)
        oh_b = (_panels(jnp.where(m, sid_b, N), fill=N)[..., None] == iota
                ).astype(jnp.bfloat16)
        outs = []
        for v in (
            jnp.where(m, cnt, 0),
            jnp.where(m, cnt_b, 0),
            m.astype(jnp.int32),
            jnp.where(m, jnp.minimum(cnt, cnt_b), 0),
        ):
            vp = _panels(v).astype(jnp.bfloat16)
            part = jnp.einsum(
                "bri,brj->bij", oh_a * vp[..., None], oh_b,
                preferred_element_type=jnp.float32,
            )
            outs.append(part.astype(jnp.int64).sum(axis=0))
        return [a + o for a, o in zip(acc, outs)]

    acc0 = [jnp.zeros((N, N), jnp.int64) for _ in range(4)]
    return jax.lax.fori_loop(1, d_max, body, acc0)


def variant_pairbin(seg, sid, cnt, kept, d_max):
    """One einsum per shift: channels x joint-pair-bin one-hot."""
    seg_p, sid_p, cnt_p = _padded(seg, sid, cnt)
    NB = N * N
    sid_m = jnp.where(kept, sid, N)
    bin_iota = jnp.arange(NB, dtype=jnp.int32)

    def body(d, acc):
        seg_b = jax.lax.dynamic_slice_in_dim(seg_p, d, E)
        sid_b = jax.lax.dynamic_slice_in_dim(sid_p, d, E)
        cnt_b = jax.lax.dynamic_slice_in_dim(cnt_p, d, E)
        m = kept & (seg == seg_b)
        pairbin = jnp.where(m, sid_m * N + sid_b, NB)
        oh = (_panels(pairbin, fill=NB)[..., None] == bin_iota
              ).astype(jnp.bfloat16)
        ch = jnp.stack(
            [
                _panels(m.astype(jnp.int32)).astype(jnp.bfloat16),
                _panels(cnt & 0xFF).astype(jnp.bfloat16),
                _panels(cnt_b & 0xFF).astype(jnp.bfloat16),
                _panels(jnp.minimum(cnt, cnt_b) & 0xFF).astype(
                    jnp.bfloat16
                ),
            ],
            axis=-1,
        )
        out = jnp.einsum(
            "brc,brn->bcn", ch, oh,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int64).sum(axis=0)
        return [a + o.reshape(N, N) for a, o in zip(acc, out)]

    acc0 = [jnp.zeros((N, N), jnp.int64) for _ in range(4)]
    return jax.lax.fori_loop(1, d_max, body, acc0)


def variant_pairbin_4x(seg, sid, cnt, kept, d_max):
    """Pair-bin but as 4 separate vector-x-onehot einsums per shift
    (isolates whether the channel-stack lhs hurts)."""
    seg_p, sid_p, cnt_p = _padded(seg, sid, cnt)
    NB = N * N
    sid_m = jnp.where(kept, sid, N)
    bin_iota = jnp.arange(NB, dtype=jnp.int32)

    def body(d, acc):
        seg_b = jax.lax.dynamic_slice_in_dim(seg_p, d, E)
        sid_b = jax.lax.dynamic_slice_in_dim(sid_p, d, E)
        cnt_b = jax.lax.dynamic_slice_in_dim(cnt_p, d, E)
        m = kept & (seg == seg_b)
        pairbin = jnp.where(m, sid_m * N + sid_b, NB)
        oh = (_panels(pairbin, fill=NB)[..., None] == bin_iota
              ).astype(jnp.bfloat16)
        outs = []
        for v in (
            m.astype(jnp.int32),
            cnt & 0xFF,
            cnt_b & 0xFF,
            jnp.minimum(cnt, cnt_b) & 0xFF,
        ):
            out = jnp.einsum(
                "br,brn->bn", _panels(v).astype(jnp.bfloat16), oh,
                preferred_element_type=jnp.float32,
            ).astype(jnp.int64).sum(axis=0)
            outs.append(out.reshape(N, N))
        return [a + o for a, o in zip(acc, outs)]

    acc0 = [jnp.zeros((N, N), jnp.int64) for _ in range(4)]
    return jax.lax.fori_loop(1, d_max, body, acc0)


def variant_pairbin_f32(seg, sid, cnt, kept, d_max):
    """Pair-bin with f32 one-hots (the round-1 operand dtype)."""
    seg_p, sid_p, cnt_p = _padded(seg, sid, cnt)
    NB = N * N
    sid_m = jnp.where(kept, sid, N)
    bin_iota = jnp.arange(NB, dtype=jnp.int32)

    def body(d, acc):
        seg_b = jax.lax.dynamic_slice_in_dim(seg_p, d, E)
        sid_b = jax.lax.dynamic_slice_in_dim(sid_p, d, E)
        cnt_b = jax.lax.dynamic_slice_in_dim(cnt_p, d, E)
        m = kept & (seg == seg_b)
        pairbin = jnp.where(m, sid_m * N + sid_b, NB)
        oh = (_panels(pairbin, fill=NB)[..., None] == bin_iota
              ).astype(jnp.float32)
        ch = jnp.stack(
            [
                _panels(m.astype(jnp.int32)).astype(jnp.float32),
                _panels(cnt & 0xFF).astype(jnp.float32),
                _panels(cnt_b & 0xFF).astype(jnp.float32),
                _panels(jnp.minimum(cnt, cnt_b) & 0xFF).astype(
                    jnp.float32
                ),
            ],
            axis=-1,
        )
        out = jnp.einsum(
            "brc,brn->bcn", ch, oh,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int64).sum(axis=0)
        return [a + o.reshape(N, N) for a, o in zip(acc, out)]

    acc0 = [jnp.zeros((N, N), jnp.int64) for _ in range(4)]
    return jax.lax.fori_loop(1, d_max, body, acc0)


VARIANTS = {
    "orig_f32_4pass": variant_orig_f32,
    "orig_bf16_4pass": variant_orig_bf16,
    "pairbin_bf16_1pass": variant_pairbin,
    "pairbin_bf16_4pass": variant_pairbin_4x,
    "pairbin_f32_1pass": variant_pairbin_f32,
}


def main():
    rng = np.random.default_rng(0)
    seg, sid, cnt, kept = make_rows(rng)
    d_max = jnp.int32(8)
    iters = 3
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else VARIANTS
    for name in names:
        fn = VARIANTS[name]
        jf = jax.jit(lambda a, b, c, k, d, fn=fn: sum(
            x[0, 1] for x in fn(a, b, c, k, d)
        ).astype(jnp.float32))
        try:
            float(np.asarray(jf(seg, sid, cnt, kept, d_max)))
            t0 = time.perf_counter()
            for _ in range(iters):
                float(np.asarray(jf(seg, sid, cnt, kept, d_max)))
            dt = (time.perf_counter() - t0) / iters
            print(
                f"{name:22s} {dt * 1e3:8.1f} ms "
                f"({E / dt / 1e6:7.1f} M rows/s)",
                flush=True,
            )
        except Exception as e:
            print(f"{name:22s} FAILED: {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
