#!/usr/bin/env python3
"""Independent brute-force RELIEF-F recomputation (instanceIdCol=vec_id path).

A from-scratch reimplementation of the graft.ml.ReliefFRSelector fit semantics
over the embeddings table, used to (a) validate the DuckDB recomputation
oracles for relief_weights / relief_select / relief_transform / relief_persist
and (b) serve as a readable spec of the deterministic fit. Shares no code with
the Scala implementation.

Usage: python3 tools/relief_reference.py [sf_dir] [compare_dir]
  sf_dir:      parquet dir (default /root/testdata/sf0.01)
  compare_dir: optional Verify dump dir; if given, diffs weights/selections.

Mutation check (does the oracle have teeth?): pass --mutate=<name> to run a
deliberately-wrong variant and confirm it DIVERGES from the Scala output —
evidence the recomputation detects real algorithmic deviations, not just
row-count changes. Mutations: no-self-exclusion (a query becomes its own
nearest neighbor), no-prior (class priors dropped from the weight fold),
global-knn (one global top-(k*nclasses) queue instead of per-class heaps —
the reference's own documented deviation).
"""
import sys

import duckdb

MUTATION = None

MASK = (1 << 64) - 1
C1 = 0x9E3779B97F4A7C15
C2 = 0xBF58476D1CE4E5B9
C3 = 0x94D049BB133111EB

SEED = 20260812
RATIO = 0.25
N_BATCHES = 2
K_PER_CLASS = 3
N_TOP = 10
LOWER_FEAT = 30  # max(10, round(3.0 * 10))
DIST_TH = 0.8


def mix64(x):
    z = (x + C1) & MASK
    z = ((z ^ (z >> 30)) * C2) & MASK
    z = ((z ^ (z >> 27)) * C3) & MASK
    return z ^ (z >> 31)


def pair_rand(seed, qid, rid):
    z = seed ^ ((qid * C1) & MASK) ^ ((rid * C2) & MASK)
    z = ((z ^ (z >> 30)) * C2) & MASK
    z = ((z ^ (z >> 27)) * C3) & MASK
    z = z ^ (z >> 31)
    return (z >> 11) / float(1 << 53)


def fit(rows):
    """rows: list of (vec_id, label_double, [double]*nfeat). Returns
    (weights_raw, norm_weights, std_selection, red_selection)."""
    n = len(rows)
    nfeat = len(rows[0][2])
    labels = sorted({r[1] for r in rows})
    lidx = {l: i for i, l in enumerate(labels)}
    ncls = len(labels)
    ngroups = 2 * ncls
    priors = {l: sum(1 for r in rows if r[1] == l) / float(n) for l in labels}

    total_rel = [0.0] * nfeat
    marginal = [0.0] * nfeat
    joint = {}  # (min_f, max_f) -> mass
    total_inter = 0.0
    top_features = []

    for b in range(N_BATCHES):
        queries = [
            r for r in rows
            if ((mix64(SEED ^ r[0]) >> 11) < (1 << 51))  # u/2^53 < 0.25
            and (mix64(((SEED + 0x51ED2701) & MASK) ^ r[0]) % N_BATCHES) == b
        ]
        if not queries:
            continue
        # per-(query, class) top-k nearest by (euclidean dist, id), self excluded
        pairs = []  # (q, neighbor)
        for q in queries:
            byclass = {l: [] for l in labels}
            for r in rows:
                if r[0] == q[0] and MUTATION != "no-self-exclusion":
                    continue
                d = sum((a - c) ** 2 for a, c in zip(q[2], r[2])) ** 0.5
                byclass[r[1]].append((d, r[0], r))
            if MUTATION == "global-knn":
                allc = sorted([t for l in labels for t in byclass[l]],
                              key=lambda t: (t[0], t[1]))
                for d, _, r in allc[:K_PER_CLASS * len(labels)]:
                    pairs.append((q, r))
            else:
                for l in labels:
                    byclass[l].sort(key=lambda t: (t[0], t[1]))
                    for d, _, r in byclass[l][:K_PER_CLASS]:
                        pairs.append((q, r))

        cc = [0.0] * ngroups
        rel = [[0.0] * ngroups for _ in range(nfeat)]
        top_set = set(top_features)
        for q, r in pairs:
            g = lidx[r[1]] + (0 if r[1] == q[1] else ncls)
            cc[g] += 1
            pr = pair_rand(SEED, q[0], r[0])
            thr = 6.0 * (1.0 - (DIST_TH + pr * DIST_TH))
            collided = []
            for f in range(nfeat):
                diff = abs(q[2][f] - r[2][f])
                rel[f][g] += diff
                if diff <= thr:
                    vote = 1.0 - min(6.0, diff) / 6.0
                    marginal[f] += vote
                    collided.append((f, vote))
            for fi, vi in collided:
                if fi in top_set:
                    for fj, vj in collided:
                        if fj != fi:
                            key = (min(fi, fj), max(fi, fj))
                            joint[key] = joint.get(key, 0.0) + (vi + vj) / 2.0
        total_inter += sum(cc)

        for f in range(nfeat):
            w = 0.0
            for g in range(ngroups):
                if cc[g] > 0:
                    sign = -1.0 if g < ncls else 1.0
                    pr = 1.0 if MUTATION == "no-prior" else priors[labels[g % ncls]]
                    w += sign * pr * rel[f][g] / cc[g]
            total_rel[f] += w
        top_features = sorted(range(nfeat), key=lambda f: (-total_rel[f], f))[:LOWER_FEAT]

    # min-max normalize relevance (all features touched: dense vectors)
    mx, mn = max(total_rel), min(total_rel)
    span = (mx - mn) if mx > mn else 1.0
    norm = [(w - mn) / span for w in total_rel]

    # collisions -> MI-like redundancy, min-max normalized
    import math
    total_i = max(total_inter, 1.0)
    joint_total = total_i * (1.0 - RATIO * (1.0 / N_BATCHES))
    red_raw = {}
    for (i, j), v in joint.items():
        jp = v / joint_total
        mi = marginal[i] / total_i
        mj = marginal[j] / total_i
        try:
            r = jp * math.log2(jp / (mi * mj))
        except (ValueError, ZeroDivisionError):
            r = 0.0
        red_raw[(i, j)] = 0.0 if (r != r or r in (float("inf"), float("-inf"))) else r
    if red_raw:
        rmx, rmn = max(red_raw.values()), min(red_raw.values())
        rspan = (rmx - rmn) if rmx > rmn else 1.0
        red = {k: (v - rmn) / rspan for k, v in red_raw.items()}
    else:
        red = {}

    order = sorted(range(nfeat), key=lambda f: (-norm[f], f))
    std_sel = order[:N_TOP]

    # greedy relevance-vs-redundancy
    red_acc = [0.0] * nfeat
    taken = [False] * nfeat
    sel = [order[0]]
    taken[order[0]] = True
    while len(sel) < N_TOP:
        last = sel[-1]
        for f in range(nfeat):
            if not taken[f]:
                red_acc[f] += red.get((min(last, f), max(last, f)), 0.0)
        best, best_s = -1, float("-inf")
        for f in range(nfeat):
            if not taken[f]:
                s = norm[f] - red_acc[f] / len(sel)
                if s > best_s or (s == best_s and (best == -1 or f < best)):
                    best, best_s = f, s
        if best == -1:
            break
        sel.append(best)
        taken[best] = True
    return total_rel, norm, std_sel, sel


def main():
    global MUTATION
    args = [a for a in sys.argv[1:] if not a.startswith("--mutate=")]
    muts = [a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--mutate=")]
    if muts:
        MUTATION = muts[0]
        print(f"MUTATION ACTIVE: {MUTATION} (output should now DIVERGE)")
    sys.argv = [sys.argv[0]] + args
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rows = duckdb.sql(
        f"SELECT vec_id, label::DOUBLE, embedding::DOUBLE[] "
        f"FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    rows = [(r[0], r[1], list(r[2])) for r in rows]
    raw, norm, std_sel, red_sel = fit(rows)
    print("std_selection:", std_sel)
    print("red_selection:", red_sel)
    print("norm[0:8]:", [round(w, 6) for w in norm[:8]])

    if len(sys.argv) > 2:
        cmp_dir = sys.argv[2]
        got_w = dict(
            duckdb.sql(
                f"SELECT feature, weight FROM '{cmp_dir}/relief_weights/*.parquet'"
            ).fetchall()
        )
        max_d = max(abs(got_w[f] - round(norm[f], 6)) for f in range(len(norm)))
        print(f"weights max |delta| vs Scala (rounded): {max_d:.3e}")
        got_sel = duckdb.sql(
            f"SELECT std_feature, redundancy_feature FROM "
            f"'{cmp_dir}/relief_select/*.parquet' ORDER BY rank"
        ).fetchall()
        print("std match:", [s for s, _ in got_sel] == std_sel,
              "red match:", [r for _, r in got_sel] == red_sel)


if __name__ == "__main__":
    main()
