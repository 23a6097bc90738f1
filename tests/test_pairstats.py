"""Fused Pallas pair-statistics kernel: correctness vs a Python
oracle, and JoinStats equivalence with the shift-einsum path when
enabled through count_join_stats(pallas_pairs=True).

Runs in Pallas interpreter mode on the CPU mesh; the kernel's real
target is the chip (scripts/profiling/bench_pairstats.py times it).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from simka_tpu.ops.countjoin import count_join_stats
from simka_tpu.ops.pairstats import pair_stats_default


def oracle(seg, sid, cnt, N):
    ab = np.zeros((N, N), np.int64)
    ba = np.zeros((N, N), np.int64)
    dist = np.zeros((N, N), np.int64)
    bray = np.zeros((N, N), np.int64)
    solid = np.zeros(N, np.int64)
    distinct = np.zeros(N, np.int64)
    E = len(seg)
    for r in range(E):
        if seg[r] < 0:
            continue
        solid[sid[r]] += cnt[r]
        distinct[sid[r]] += 1
        for d in range(1, N):
            if r + d >= E or seg[r + d] != seg[r]:
                break
            a, b = sid[r], sid[r + d]
            ab[a, b] += cnt[r]
            ba[a, b] += cnt[r + d]
            dist[a, b] += 1
            bray[a, b] += min(cnt[r], cnt[r + d])
    return dict(
        shared_kmers_ab=ab,
        shared_kmers_ba=ba,
        shared_distinct=dist,
        bray=bray,
        solid_per_bank=solid,
        distinct_per_bank=distinct,
    )


def gen(rng, E, N, maxcnt):
    """Segment-grouped rows with ascending, duplicate-free sids (the
    kernel's layout contract) plus a dropped tail."""
    rows = []
    s = 0
    while len(rows) < E:
        L = int(rng.integers(1, N + 1))
        sids = np.sort(rng.choice(N, size=L, replace=False))
        for x in sids:
            rows.append((s, x, int(rng.integers(1, maxcnt))))
        s += 1
    rows = rows[:E]
    seg = np.array([r[0] for r in rows], np.int32)
    sid = np.array([r[1] for r in rows], np.int32)
    cnt = np.array([r[2] for r in rows], np.int32)
    nd = int(rng.integers(0, E // 3 + 1))
    seg = np.concatenate([seg, np.full(nd, -1, np.int32)])
    sid = np.concatenate([sid, np.zeros(nd, np.int32)])
    cnt = np.concatenate([cnt, np.zeros(nd, np.int32)])
    return seg, sid, cnt


@pytest.mark.parametrize(
    "E,N,maxcnt,panel",
    [
        (100, 4, 10, 64),
        (1000, 8, 1000, 256),
        (3000, 16, 70000, 256),
        (2000, 3, 2**31 - 2, 256),
    ],
)
def test_pairstats_kernel_matches_oracle(E, N, maxcnt, panel):
    rng = np.random.default_rng(E + N)
    seg, sid, cnt = gen(rng, E, N, maxcnt)
    got = pair_stats_default(
        jnp.asarray(seg),
        jnp.asarray(sid),
        jnp.asarray(cnt),
        n_banks=N,
        panel=panel,
        interpret=True,
    )
    want = oracle(seg, sid, cnt, N)
    for k in want:
        assert np.array_equal(np.asarray(got[k]), want[k]), k


def test_auto_split_matches_single_call(monkeypatch):
    """Streams above the per-call panel bound are split into chunks
    with a real-row halo; cross-chunk pairs must be counted exactly
    once (the round-2 kernel raised here instead)."""
    from simka_tpu.ops import pairstats

    rng = np.random.default_rng(42)
    E, N = 3000, 12
    seg, sid, cnt = gen(rng, E, N, 1000)
    want = oracle(seg, sid, cnt, N)
    monkeypatch.setattr(pairstats, "MAX_PANELS", 4)
    got = pair_stats_default(
        jnp.asarray(seg),
        jnp.asarray(sid),
        jnp.asarray(cnt),
        n_banks=N,
        panel=32,
        interpret=True,
    )
    for k in want:
        assert np.array_equal(np.asarray(got[k]), want[k]), k


@pytest.mark.parametrize("N", [12, 16])
def test_tri_packed_path_matches_fourpass(N):
    """N in 12..16 now rides the one-pass triangle pair-bin einsum;
    its default channels must be bit-identical to the general 4-pass
    path (forced via simple=True, which computes the same default
    channels plus the simple ones)."""
    rng = np.random.default_rng(N)
    E = 8192
    hi = jnp.asarray(rng.integers(0, 1 << 10, size=E, dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 1 << 9, size=E, dtype=np.uint32))
    sid = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
    kw = dict(n_banks=N, count_bits=16, hi_bits=10)
    packed = count_join_stats(
        hi, lo, sid, jnp.int32(1), jnp.int64(10**9), **kw
    )
    fourpass = count_join_stats(
        hi, lo, sid, jnp.int32(1), jnp.int64(10**9), simple=True, **kw
    )
    for name in (
        "nb_distinct",
        "nb_shared",
        "distinct_per_bank",
        "solid_per_bank",
        "shared_kmers_ab",
        "shared_kmers_ba",
        "shared_distinct",
        "bray_numerator",
    ):
        ga = np.asarray(getattr(packed, name))
        gb = np.asarray(getattr(fourpass, name))
        assert np.array_equal(ga, gb), (name, ga, gb)


def test_countjoin_pallas_path_equivalence():
    """count_join_stats(pallas_pairs=True) must return bit-identical
    default-channel JoinStats to the einsum path."""
    rng = np.random.default_rng(7)
    E, N = 8192, 8
    hi = jnp.asarray(
        rng.integers(0, 1 << 10, size=E, dtype=np.uint32)
    )
    lo = jnp.asarray(rng.integers(0, 1 << 11, size=E, dtype=np.uint32))
    sid = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
    kw = dict(n_banks=N, count_bits=16, hi_bits=10)
    a = count_join_stats(
        hi, lo, sid, jnp.int32(1), jnp.int64(10**9),
        pallas_pairs=True, **kw,
    )
    b = count_join_stats(
        hi, lo, sid, jnp.int32(1), jnp.int64(10**9),
        pallas_pairs=False, **kw,
    )
    for name in (
        "nb_distinct",
        "nb_shared",
        "distinct_per_bank",
        "solid_per_bank",
        "chord_n2_per_bank",
        "shared_kmers_ab",
        "shared_kmers_ba",
        "shared_distinct",
        "bray_numerator",
    ):
        ga = np.asarray(getattr(a, name))
        gb = np.asarray(getattr(b, name))
        assert np.array_equal(ga, gb), (name, ga, gb)
