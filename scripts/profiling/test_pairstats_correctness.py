import sys
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("SIMKA_TPU_FORCE_CPU", "1")

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

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
    return dict(shared_kmers_ab=ab, shared_kmers_ba=ba,
                shared_distinct=dist, bray=bray,
                solid_per_bank=solid, distinct_per_bank=distinct)


def gen(rng, E, N, maxcnt):
    # build segment-grouped rows: random segment sizes 1..N, ascending sids
    segs = []
    s = 0
    rows = []
    while len(rows) < E:
        L = int(rng.integers(1, N + 1))
        sids = np.sort(rng.choice(N, size=L, replace=False))
        for x in sids:
            rows.append((s, x, int(rng.integers(1, maxcnt))))
        s += 1
    rows = rows[:E]
    # truncation may cut a segment; that's fine (valid layout)
    seg = np.array([r[0] for r in rows], np.int32)
    sid = np.array([r[1] for r in rows], np.int32)
    cnt = np.array([r[2] for r in rows], np.int32)
    # append dropped rows
    nd = int(rng.integers(0, E // 3 + 1))
    seg = np.concatenate([seg, np.full(nd, -1, np.int32)])
    sid = np.concatenate([sid, np.zeros(nd, np.int32)])
    cnt = np.concatenate([cnt, np.zeros(nd, np.int32)])
    return seg, sid, cnt


rng = np.random.default_rng(0)
for trial, (E, N, maxcnt, panel) in enumerate([
    (100, 4, 10, 64),
    (1000, 8, 1000, 256),
    (5000, 8, 100000, 512),
    (3000, 16, 70000, 256),
    (2000, 3, 2**31 - 2, 256),
]):
    seg, sid, cnt = gen(rng, E, N, maxcnt)
    got = pair_stats_default(
        jnp.asarray(seg), jnp.asarray(sid), jnp.asarray(cnt),
        n_banks=N, panel=panel, interpret=True)
    want = oracle(seg, sid, cnt, N)
    for k in want:
        g = np.asarray(got[k])
        assert np.array_equal(g, want[k]), (trial, k, g, want[k])
    print(f"trial {trial}: OK (E={len(seg)}, N={N}, maxcnt={maxcnt})")
print("pairstats correctness: ALL OK")
