"""Host-side numpy simulation of the banded WFA kernel on one HiFi pair:
records, per score step, the active-lane count and the spread of the
extension's word indices (idx_v, idx_t) across the band, plus how many
lanes survive a 32-base probe.  Informs the staged-window design (can one
128/256-word window serve the whole probe?)."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")
from wfa_tpu.utils.io import read_seq_file

NULL = -32000
W = 512
BAND = 25
X, O, E = 2, 3, 1
A = max(O + E, X) + 1


def lcp(p, t, v, h):
    n = 0
    while v + n < len(p) and h + n < len(t) and p[v + n] == t[h + n]:
        n += 1
    return n


def sim(p, t, max_steps=3000):
    plen, tlen = len(p), len(t)
    target_k, target_off = tlen - plen, tlen
    M = {}; I = {}; D = {}
    lo = {}; ext = {}
    m0 = lcp(p, t, 0, 0)
    M[0] = np.full(W, NULL, np.int64)
    M[0][0] = m0
    I[0] = np.full(W, NULL, np.int64); D[0] = np.full(W, NULL, np.int64)
    lo[0], ext[0] = 0, 0
    stats = []
    for d in range(1, max_steps):
        sx, soe, se = d - X, d - O - E, d - E
        ok_x = sx in M and ext.get(sx, -1) >= 0
        ok_oe = soe in M
        ok_ie = se in I
        if not (ok_x or ok_oe or ok_ie):
            continue

        def bounds(s, okk):
            if not okk:
                return -10**9, 10**9
            return lo[s] + ext[s], lo[s]

        hix, lox = bounds(sx, ok_x)
        hioe, looe = bounds(soe, ok_oe)
        hie, loe_ = bounds(se, ok_ie)
        hi_n = max(hix, max(hioe, hie) + 1)
        lo_n = min(lox, min(looe, loe_) - 1)
        tr = max(hi_n - lo_n - (W - 1), 0)
        hi_n -= (tr + 1) // 2
        lo_n += tr // 2
        if ok_x and d % BAND == 0 and ext.get(sx, -1) >= W - 1:
            kx = lo[sx] + np.arange(W)
            mx = M[sx]
            d2t = np.where(mx >= 0, np.maximum(plen - (mx - kx), tlen - mx),
                           10**9)
            c = lo[sx] + int(np.argmin(d2t))
            lo_n, hi_n = c - W // 2, c - W // 2 + W - 1

        def rd(tab, s, okk, dk):
            out = np.full(W, NULL, np.int64)
            if not okk:
                return out
            rel = (lo_n - lo[s]) + np.arange(W) + dk
            m = (rel >= 0) & (rel <= ext[s])
            out[m] = tab[s][rel[m]]
            return out

        I_n = np.maximum(rd(M, soe, ok_oe, -1) + 1, rd(I, se, ok_ie, -1) + 1)
        D_n = np.maximum(rd(M, soe, ok_oe, +1), rd(D, se, ok_ie, +1))
        M_pre = np.maximum(rd(M, sx, ok_x, 0) + 1, np.maximum(I_n, D_n))
        k_row = lo_n + np.arange(W)
        v = M_pre - k_row
        h = M_pre
        act = (M_pre > NULL // 2) & (M_pre >= 0) & (v <= plen) & (h <= tlen) \
            & (v < plen) & (h < tlen)
        idx_v = v[act] >> 4
        idx_t = h[act] >> 4
        M_n = M_pre.copy()
        surv = 0
        for j in np.flatnonzero(act):
            e_ = lcp(p, t, int(v[j]), int(h[j]))
            M_n[j] = M_pre[j] + e_
            if e_ >= 32:
                surv += 1
        if act.any():
            stats.append((d, int(act.sum()),
                          int(idx_v.max() - idx_v.min()),
                          int(idx_t.max() - idx_t.min()), surv))
        M[d], I[d], D[d] = M_n, I_n, D_n
        lo[d], ext[d] = lo_n, hi_n - lo_n
        for s in (d - A,):
            for tab in (M, I, D, lo, ext):
                tab.pop(s, None)
        at = np.flatnonzero(k_row == target_k)
        if at.size and M_n[at[0]] >= target_off:
            return d, stats
    return None, stats


batch = read_seq_file(Path("tests/data/test_hifi.seq"))
for i in (0, 1, 2):
    p = np.frombuffer(batch.patterns[i], np.uint8)
    t = np.frombuffer(batch.texts[i], np.uint8)
    d, stats = sim(p, t)
    s = np.array([r[1:] for r in stats])
    print(f"pair {i}: len={len(p)} dist={d} steps_with_wf={len(stats)}")
    print(f"  active lanes: mean {s[:,0].mean():.0f} max {s[:,0].max()}")
    print(f"  idx_v spread (words): mean {s[:,1].mean():.1f} "
          f"p90 {np.percentile(s[:,1],90):.0f} max {s[:,1].max()}")
    print(f"  idx_t spread (words): mean {s[:,2].mean():.1f} "
          f"p90 {np.percentile(s[:,2],90):.0f} max {s[:,2].max()}")
    print(f"  probe survivors (>=32b): mean {s[:,3].mean():.2f} "
          f"max {s[:,3].max()} frac_steps_any {(s[:,3]>0).mean():.2f}",
          flush=True)
