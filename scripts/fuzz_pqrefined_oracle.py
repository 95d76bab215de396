#!/usr/bin/env python3
"""Fuzz the SHIPPED e_ivfpq_refined oracle SQL against an independent
Python reference of the full composed index: seed-drawn PQ init ->
per-subspace deterministic Lloyd (argmin ties to the lowest code,
sid-ordered 0.0-seeded mean folds, empty codes keep their centroid)
-> shared encode tail -> hash-cell coarse quantizer -> ADC top-5.

The oracle is a nontrivial reformulation (m unrolled per-subspace
refine chains + window-ranked argmins + the flat distance-table
stride vs the operator's struct-min aggregates and broadcast
lookups), so the real-data gate can pass while the chain is wrong in
general — e.g. a subspace slice off by one, a refine round reading
another subspace's sample, a stride that assumes the configured k on
a narrow codebook, or a cell assignment that ranks before the
norm filter. Corpora here force those paths: duplicate vectors
(distance ties at every stage), zero vectors (excluded from cells
but present in codes), corpora narrower than k (narrow codebooks,
keff < k), and float32-rounded values like the parquet column.

Usage: python3 scripts/fuzz_pqrefined_oracle.py <verifyOutDir> [trials]
"""
import hashlib
import json
import math
import random
import struct
import sys

import duckdb

M, KPQ, DIM, SEED = 8, 16, 64, 42
ITERS, TRAIN = 2, 120
NCELLS, NPROBE, N = 16, 4, 5
D = DIM // M


def f32(x):
    return struct.unpack("f", struct.pack("f", x))[0]


def md5hex(s):
    return hashlib.md5(s.encode()).hexdigest()


def dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def l2sq(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) * (x - y)
    return acc


def cos(a, b):
    return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))


def sub(v, s):
    return v[s * D:(s + 1) * D]


def argmin(v, cb):
    best = None
    for c, cent in enumerate(cb):
        d = l2sq(v, cent)
        if best is None or (d, c) < (best[0], best[1]):
            best = (d, c)
    return best  # (dist, code)


def refine(smp_pairs, cb0):
    cb = [list(c) for c in cb0]
    for _ in range(ITERS):
        groups = {}
        for sid, v in smp_pairs:
            _, c = argmin(v, cb)
            groups.setdefault(c, []).append((sid, v))
        newcb = []
        for c, cent in enumerate(cb):
            if c not in groups:
                newcb.append(cent)
                continue
            ms = sorted(groups[c])
            cnt = float(len(ms))
            mean = []
            for d in range(len(cent)):
                acc = 0.0
                for _, v in ms:
                    acc = acc + v[d]
                mean.append(acc / cnt)
            newcb.append(mean)
        cb = newcb
    return cb


def ref_ivfpq_refined(rows):
    vs = [(i, [float(x) for x in v]) for i, v in rows if i % 3 == 0]
    if not vs:
        return []
    # seed-drawn init: k rows by (md5('42:'||id), id); code = same order
    seeds = [v for _, v in sorted(
        vs, key=lambda iv: (md5hex(f"{SEED}:{iv[0]}"), iv[0]))[:KPQ]]
    cb0 = [[sub(sv, s) for sv in seeds] for s in range(M)]
    # bounded md5 training sample, per-subspace Lloyd
    smp = sorted(vs, key=lambda iv: (md5hex(f"{SEED}:pql:{iv[0]}"), iv[0]))
    smp = smp[:TRAIN]
    cb = [refine([(sid, sub(v, s)) for sid, v in smp], cb0[s])
          for s in range(M)]
    keff = len(cb[0])
    # shared encode tail
    codes = {i: [argmin(sub(v, s), cb[s])[1] for s in range(M)]
             for i, v in vs}
    # coarse cells: md5-picked nonzero rows
    nz = [(i, v) for i, v in vs if dot(v, v) > 0]
    cents = sorted(nz, key=lambda iv: (md5hex(str(iv[0])), iv[0]))[:NCELLS]
    if not cents:
        return []
    assigned = {}
    for i, v in nz:
        best = min(((-cos(v, cv), cell) for cell, cv in cents))
        assigned[i] = best[1]
    out = []
    qs = sorted((i, v) for i, v in vs if i % 300 == 0)
    for qid, q in qs:
        if dot(q, q) <= 0:
            continue  # no probes for a zero-norm query
        ranked_cells = sorted(((-cos(q, cv), cell) for cell, cv in cents))
        probes = set(cell for _, cell in ranked_cells[:NPROBE])
        # flat distance table in (sub, code) order
        dtable = [l2sq(sub(q, s), cb[s][c])
                  for s in range(M) for c in range(keff)]
        scored = []
        for nid, _ in vs:
            if nid == qid or assigned.get(nid) not in probes:
                continue
            acc = 0.0
            for s in range(M):
                acc = acc + dtable[s * keff + codes[nid][s]]
            scored.append((acc, nid))
        scored.sort()
        for rank, (adc, nid) in enumerate(scored[:N], start=1):
            out.append((qid, nid, rank, adc))
    return out


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    sql = oracles["e_ivfpq_refined"]

    rnd = random.Random(29)
    fails = 0
    for trial in range(trials):
        n = rnd.choice([1, 2, 5, KPQ - 1, KPQ + 3, 40, 90])
        rows = []
        base = []
        for _ in range(n):
            if rnd.random() < 0.3:
                vec_id = 300 * rnd.randint(0, 10 ** 4)  # query (and %3==0)
            else:
                vec_id = 3 * rnd.randint(0, 10 ** 6) + rnd.choice([0, 0, 0, 1, 2])
            if rnd.random() < 0.15 or not base:
                v = [f32(rnd.gauss(0, 1)) for _ in range(DIM)]
            elif rnd.random() < 0.5:
                v = list(rnd.choice(base))  # exact duplicate: forces ties
            else:
                v = [0.0] * DIM
            base.append(v)
            rows.append((vec_id, v))
        seen = {}
        rows = [seen.setdefault(i, (i, v)) for i, v in rows if i not in seen]

        con = duckdb.connect()
        con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])")
        con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
        got = [tuple(r) for r in con.execute(sql).fetchall()]
        con.close()

        want = ref_ivfpq_refined(rows)
        if got != want:
            fails += 1
            diff = [(g, w) for g, w in zip(got, want) if g != w][:2]
            print(f"FAIL trial {trial}: rows {len(got)} vs {len(want)}, "
                  f"first diffs {diff}")
            if len(got) != len(want):
                print("  got ", got[:6])
                print("  want", want[:6])

    print(f"{trials - fails}/{trials} trials matched")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
