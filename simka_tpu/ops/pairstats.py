"""Fused Pallas pair-statistics kernel (default distance channels).

Replaces the XLA shift-einsum accumulation of ops/countjoin.py pass 3
for the always-on channels (the reference's updateDistanceDefault,
src/core/SimkaAlgorithm.hpp:356-378): per co-present pair (a, b) with
a < b inside each k-mer segment,

    shared_kmers_ab[a, b] += C_a        (reference :369)
    shared_kmers_ba[a, b] += C_b        (reference :370)
    shared_distinct[a, b] += 1          (reference :371)
    bray[a, b]            += min(C_a, C_b)  (reference :374)

plus the per-bank totals (distinct_per_bank, solid_per_bank) folded in
for free (see below).

Why Pallas: the einsum path materializes [E, N] float one-hots in HBM
for every (shift, limb-channel) -- tens of GB of traffic.  Here the
row stream (seg, sid, cnt; ~12 B/row) is read once; one-hots live only
in VMEM; every (shift, limb-channel) pair becomes columns of ONE
[B, 128]x[B, 128] bf16 MXU matmul per shift whose f32 outputs are
exact by construction (values <= 255 are bf16-exact; per-panel sums
stay < 2^24) and are accumulated across panels in exact i32 hi/lo
pairs in VMEM scratch (the grid is sequential on TPU).

Column packing: left[:, c*N + i] = limb_c(value_{c,d})[r] * [sid_r=i],
right[:, j] = [sid_{r+d} = j] * same_segment_d[r].  The d=1 matmul
carries one extra right column holding the row validity mask, which
makes out[(c, i), N] the UNMASKED per-bank limb sums: solid_per_bank
falls out of the ab channel and distinct_per_bank out of the distinct
channel with zero extra matmuls.

Channels whose pair values need float64 (chord, Kullback-Leibler) or
global per-bank totals (Whittaker) stay on the einsum path in
countjoin.py -- they are only active under -simple-dist/-complex-dist.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
LIMB = 8  # bits per limb; values <= 255 are bf16-exact on the MXU


def _num_limbs(bits: int) -> int:
    return max(1, -(-bits // LIMB))


def _channel_layout(n_banks: int, n_limbs: int):
    """(channel -> (group, row_base)) placement that never straddles a
    128-column group boundary."""
    n_ch = 3 * n_limbs + 1  # ab limbs, ba limbs, bray limbs, distinct
    per_group = max(1, LANES // n_banks)
    n_groups = -(-n_ch // per_group)
    place = [
        (c // per_group, (c % per_group) * n_banks) for c in range(n_ch)
    ]
    return n_ch, per_group, n_groups, place


def _kernel(
    seg_ref,
    sid_ref,
    cnt_ref,
    seg_h_ref,
    sid_h_ref,
    cnt_h_ref,
    out_ref,
    acc_ref,
    *,
    n_banks: int,
    n_limbs: int,
    n_groups: int,
    per_group: int,
    panel: int,
):
    i = pl.program_id(0)
    n_panels = pl.num_programs(0)
    N = n_banks

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # [2B, 1] windows spanning this panel and its halo (the next
    # panel); lifted to 2-D immediately -- Mosaic cannot reshape 1-D
    # BOOL vectors, so every mask must be born 2-D
    def window(a_ref, b_ref):
        return jnp.concatenate(
            [a_ref[...][:, None], b_ref[...][:, None]], axis=0
        )

    seg_w = window(seg_ref, seg_h_ref)
    sid_w = window(sid_ref, sid_h_ref)
    cnt_w = window(cnt_ref, cnt_h_ref)

    seg_a = seg_w[:panel]
    sid_a = sid_w[:panel]
    cnt_a = cnt_w[:panel]
    kept_a = seg_a >= jnp.int32(0)  # [panel, 1] bool

    # Both matmul operands are built purely ELEMENTWISE over
    # [panel, 128] from lane iotas (Mosaic cannot concatenate narrow
    # pieces along lanes).  In column group g, lane q of the left
    # operand holds channel c = g*per_group + q // N, bank i = q % N;
    # channel c maps to base value b = c // n_limbs (ab=cnt_a,
    # ba=cnt_b, bray=min) and limb l = c % n_limbs, except the last
    # channel (distinct, base 1).  The limb extraction is a per-lane
    # VARIABLE shift -- an ordinary VPU op.
    # (all scalar constants as i32 -- under x64, Python ints promote
    # through i64 converts that Mosaic cannot lower)
    i32 = jnp.int32
    q = jax.lax.broadcasted_iota(jnp.int32, (panel, LANES), 1)
    i_q = q % i32(N)
    n_ch = 3 * n_limbs + 1
    lane_maps = []
    for g in range(n_groups):
        cg = q // i32(N) + i32(g * per_group)
        b_qg = jnp.where(cg >= i32(3 * n_limbs), i32(3), cg // i32(n_limbs))
        l_qg = jnp.where(cg >= i32(3 * n_limbs), i32(0), cg % i32(n_limbs))
        valid_g = (cg < i32(n_ch)) & (q < i32(per_group * N))
        lane_maps.append((b_qg, l_qg, valid_g))

    def left_operand(g, cnt_b):
        b_qg, l_qg, valid_g = lane_maps[g]
        i32 = jnp.int32
        base = jnp.where(
            b_qg == i32(0),
            cnt_a,
            jnp.where(
                b_qg == i32(1),
                cnt_b,
                jnp.where(
                    b_qg == i32(2), jnp.minimum(cnt_a, cnt_b), i32(1)
                ),
            ),
        )
        limb = (base >> (i32(LIMB) * l_qg)) & i32((1 << LIMB) - 1)
        oh = (sid_a == i_q) & valid_g
        return jnp.where(oh, limb, i32(0)).astype(jnp.float32)

    step_gs = tuple(
        jnp.zeros((LANES, LANES), jnp.float32) for _ in range(n_groups)
    )
    one = jnp.float32(1.0)

    def do_shift(step_gs, cnt_b, right):
        rb = right.astype(jnp.bfloat16)
        out = []
        for g in range(n_groups):
            part = jax.lax.dot_general(
                left_operand(g, cnt_b).astype(jnp.bfloat16),
                rb,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out.append(step_gs[g] + part)
        return tuple(out)

    # d = 1 peeled: always runs, and its right operand carries the
    # extra validity column (lane N) for the per-bank totals
    seg_b = seg_w[1 : 1 + panel]
    sid_b = sid_w[1 : 1 + panel]
    cnt_b = cnt_w[1 : 1 + panel]
    m = kept_a & (seg_a == seg_b)  # [panel, 1]
    right = jnp.where((sid_b == q) & m, one, jnp.float32(0.0))
    right = jnp.where((q == jnp.int32(N)) & kept_a, one, right)
    step_gs = do_shift(step_gs, cnt_b, right)

    # d = 2..N-1 as a ROLLED loop: an unrolled Python loop puts N-1
    # copies of the [panel, 128] operand buffers on the Mosaic stack
    # at once, which blows the 16 MB scoped-vmem limit at N >= 32
    # (the wide-N regime this kernel exists for); the fori_loop keeps
    # one body's worth live
    def shift_body(d, step_gs):
        # Mosaic has no dynamic_slice; a dynamic ROTATE
        # (tpu.dynamic_rotate) + static slice reads the same window.
        # The shift is the POSITIVE 2*panel - d (== -d mod len):
        # negating the loop index trips an i32/i64 subi mismatch in
        # the roll lowering
        shift = jnp.int32(2 * panel) - d

        def at(w):
            return pltpu.roll(w, shift, axis=0)[:panel]

        seg_b = at(seg_w)
        sid_b = at(sid_w)
        cnt_b = at(cnt_w)
        m = kept_a & (seg_a == seg_b)
        any_m = jnp.max(m.astype(jnp.float32)) > 0.0
        right = jnp.where((sid_b == q) & m, one, jnp.float32(0.0))
        return jax.lax.cond(
            any_m,
            lambda s: do_shift(s, cnt_b, right),
            lambda s: s,
            step_gs,
        )

    if n_banks > 2:
        # i32 bounds: under x64 a Python-int loop index is i64, which
        # Mosaic cannot lower
        step_gs = jax.lax.fori_loop(
            jnp.int32(2), jnp.int32(n_banks), shift_body, step_gs
        )

    # exact i32 hi/lo accumulation across panels (step values are
    # integers < 2^24, exact in f32)
    for g in range(n_groups):
        s_int = step_gs[g].astype(jnp.int32)
        acc_ref[0, g] = acc_ref[0, g] + (s_int >> jnp.int32(16))
        acc_ref[1, g] = acc_ref[1, g] + (s_int & jnp.int32(0xFFFF))

    @pl.when(i == n_panels - 1)
    def _():
        out_ref[...] = acc_ref[...]


# Exactness bound of one pallas call: the lo-half i32 accumulator
# gains at most 0xFFFF per panel per cell, so it stays below 2^31
# only while n_panels < 2^15. pair_stats_default auto-splits longer
# streams into chunks with a real-row halo (pairs only ever span
# N - 1 < panel rows, so the halo panel covers every cross-chunk
# pair exactly once).
MAX_PANELS = (1 << 15) - 1


def _chunk_call(
    seg, sid, cnt, *, n_panels, panel, n_banks, n_limbs, n_groups,
    per_group, interpret
):
    """One pallas sweep: blocks [0, n_panels) are the a-rows, block
    n_panels is the partner halo (real continuation rows mid-stream,
    -1 padding at the end). Returns the combined i64 accumulator."""
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            n_banks=n_banks,
            n_limbs=n_limbs,
            n_groups=n_groups,
            per_group=per_group,
            panel=panel,
        ),
        grid=(n_panels,),
        in_specs=[
            pl.BlockSpec((panel,), lambda i: (i,)),
            pl.BlockSpec((panel,), lambda i: (i,)),
            pl.BlockSpec((panel,), lambda i: (i,)),
            pl.BlockSpec((panel,), lambda i: (i + 1,)),
            pl.BlockSpec((panel,), lambda i: (i + 1,)),
            pl.BlockSpec((panel,), lambda i: (i + 1,)),
        ],
        out_specs=pl.BlockSpec(
            (2, n_groups, LANES, LANES),
            # constant block: i32 zeros (Python ints trip x64->i64)
            lambda i: (i * 0, i * 0, i * 0, i * 0),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (2, n_groups, LANES, LANES), jnp.int32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, n_groups, LANES, LANES), jnp.int32)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(seg, sid, cnt, seg, sid, cnt)
    return (out[0].astype(jnp.int64) << 16) + out[1].astype(jnp.int64)


@functools.partial(
    jax.jit, static_argnames=("n_banks", "count_bits", "panel", "interpret")
)
def pair_stats_default(
    seg,
    sid,
    cnt,
    *,
    n_banks: int,
    count_bits: int = 32,
    panel: int = 0,
    interpret: bool = False,
):
    """All default-channel pair statistics in one pass over the rows.

    Args:
      seg: [E] int32 segment id per row, -1 for dropped/padding rows.
        Rows must be segment-grouped and sample-ascending within a
        segment (the compacted pass-2 layout of countjoin.py).
      sid: [E] int32 sample ids (0 <= sid < n_banks on kept rows).
      cnt: [E] int32 per-(kmer, sample) counts, < 2**count_bits.

    Streams longer than panel * 32767 rows (~67M at the default
    panel) are transparently split into bound-respecting chunks whose
    halo panel carries the real continuation rows, so cross-chunk
    pairs (always within N - 1 < panel rows) are counted exactly once
    (tests/test_pairstats.py::test_auto_split_matches_single_call).

    Returns dict with int64 arrays: shared_kmers_ab, shared_kmers_ba,
    shared_distinct, bray (all [N, N], upper-triangle pair sums), and
    distinct_per_bank, solid_per_bank ([N]).
    """
    N = n_banks
    if N < 2 or N > LANES - 1:
        raise ValueError("pair_stats_default supports 2 <= n_banks <= 127")
    n_limbs = _num_limbs(count_bits)
    n_ch, per_group, n_groups, place = _channel_layout(N, n_limbs)
    if not panel:
        # the [panel, 128] matmul operands (one lhs per group + the
        # rhs, live together inside do_shift) dominate the Mosaic
        # scoped-vmem stack; shrink the panel as the group count grows
        # to stay under the 16 MB limit (N=32/count_bits=32 measured
        # 20.1 MB at panel=2048)
        panel = 2048 if n_groups <= 2 else (1024 if n_groups <= 4 else 512)

    E = seg.shape[0]
    chunk_rows = MAX_PANELS * panel
    full = None
    for s in range(0, max(E, 1), chunk_rows):
        e = min(s + chunk_rows, E)
        n_panels = max(1, -(-(e - s) // panel))
        halo_e = min(e + panel, E)

        def prep(x, fill):
            # a-range padding only happens on the final chunk (mid
            # chunks are exact panel multiples), where the halo region
            # is empty -- so end-padding keeps blocks aligned
            return jnp.pad(
                x[s:halo_e],
                (0, (n_panels + 1) * panel - (halo_e - s)),
                constant_values=fill,
            )

        part = _chunk_call(
            prep(seg, -1),
            prep(sid, 0),
            prep(cnt, 0),
            n_panels=n_panels,
            panel=panel,
            n_banks=N,
            n_limbs=n_limbs,
            n_groups=n_groups,
            per_group=per_group,
            interpret=interpret,
        )
        full = part if full is None else full + part

    def channel(c):
        g, row = place[c]
        return full[g, row : row + N, :]

    def int_channel(base):
        acc = jnp.zeros((N, N + 1), jnp.int64)
        for l in range(n_limbs):
            acc = acc + (channel(base + l)[:, : N + 1] << (LIMB * l))
        return acc

    ab = int_channel(0)
    ba = int_channel(n_limbs)
    bray = int_channel(2 * n_limbs)
    dist = channel(3 * n_limbs)[:, : N + 1]

    return {
        "shared_kmers_ab": ab[:, :N],
        "shared_kmers_ba": ba[:, :N],
        "shared_distinct": dist[:, :N],
        "bray": bray[:, :N],
        "solid_per_bank": ab[:, N],
        "distinct_per_bank": dist[:, N],
    }
