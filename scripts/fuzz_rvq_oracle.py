#!/usr/bin/env python3
"""Fuzz the SHIPPED e_rvq_encode oracle SQL against an independent
Python reference of the two-stage residual quantizer.

The oracle is a nontrivial reformulation (window-ranked argmins over
unrolled list arithmetic vs the operator's struct-min aggregates), so
the real-data gate can pass while the encoding is wrong in general —
e.g. a stage-2 codebook drawn before the stage-1 residual, a
tie-break that prefers the wrong code, a sampling order that ranks by
id before the md5 key, or a residual computed against the wrong
centroid. Corpora here force those paths: duplicate vectors (exact
distance ties at both stages), zero vectors, corpora narrower than k
(dense narrow codebooks), ids colliding into both sample salts, and
float32-rounded values (the parquet storage type — the reference
rounds through float32 exactly like the table column does).

Usage: python3 scripts/fuzz_rvq_oracle.py <verifyOutDir> [trials]
"""
import hashlib
import json
import random
import struct
import sys

import duckdb

K = 16
DIM = 64
SEED = 42


def f32(x):
    return struct.unpack("f", struct.pack("f", x))[0]


def md5hex(s):
    return hashlib.md5(s.encode()).hexdigest()


def sample(vs, salt, k):
    order = sorted(vs, key=lambda iv: (md5hex(f"{SEED}:{salt}:{iv[0]}"), iv[0]))
    return [v for _, v in order[:k]]


def argmin(v, cb):
    best = None
    for c, cent in enumerate(cb):
        res = [a - b for a, b in zip(v, cent)]
        d = 0.0
        for x in res:
            d = d + x * x
        if best is None or (d, c) < (best[0], best[1]):
            best = (d, c, res)
    return best  # (dist, code, residual)


def ref_encode(rows):
    # slice: vec_id % 3 = 1 (non-negative ids only in this fuzzer)
    vs = [(i, [float(x) for x in v]) for i, v in rows if i % 3 == 1]
    cb1 = sample(vs, "r1", K)
    cb2 = [argmin(v, cb1)[2] for v in sample(vs, "r2", K)]
    out = []
    for i, v in sorted(vs):
        d1, c1, r1 = argmin(v, cb1)
        d2, c2, _ = argmin(r1, cb2)
        out.append((i, c1, c2, d2))
    return out


def ref_topk(rows, n=5):
    # the shipped top-k oracle's decomposition, fold orders mirrored:
    # t1[c1] + t2[c2] in one add, then + x[c1][c2]
    vs = [(i, [float(x) for x in v]) for i, v in rows if i % 3 == 1]
    cb1 = sample(vs, "r1", K)
    cb2 = [argmin(v, cb1)[2] for v in sample(vs, "r2", K)]
    codes = {}
    for i, v in vs:
        _, c1, r1 = argmin(v, cb1)
        _, c2, _ = argmin(r1, cb2)
        codes[i] = (c1, c2)

    def fold(parts):
        acc = 0.0
        for p in parts:
            acc = acc + p
        return acc

    x = [[fold([2.0 * a * b for a, b in zip(ca, cb)]) for cb in cb2]
         for ca in cb1]
    out = []
    for qid, q in sorted(vs):
        if qid % 300 != 1:
            continue
        t1 = [fold([(p - c) * (p - c) for p, c in zip(q, cent)])
              for cent in cb1]
        t2 = [fold([c * c - 2.0 * p * c for p, c in zip(q, cent)])
              for cent in cb2]
        scored = sorted(
            ((t1[c1] + t2[c2]) + x[c1][c2], nid)
            for nid, (c1, c2) in codes.items() if nid != qid)
        for rank, (adc, nid) in enumerate(scored[:n], start=1):
            out.append((qid, nid, rank, adc))
    return out


def ref_refined(rows, k=8, iters=2, train=120):
    """Independent reference of the e_rvq_refined oracle: per-stage
    deterministic Lloyd (argmin ties to the lowest code, sid-ordered
    0.0-seeded mean folds, empty codes keep their centroid), stage-2
    init residualized against the REFINED stage 1, then the shared
    encode tail."""
    vs = [(i, [float(x) for x in v]) for i, v in rows if i % 3 == 1]
    cb1_init = sample(vs, "r1", k)
    smp = sorted(vs, key=lambda iv: (md5hex(f"{SEED}:rvql:{iv[0]}"), iv[0]))
    smp = smp[:train]

    def refine(smp_pairs, cb0):
        cb = [list(c) for c in cb0]
        for _ in range(iters):
            groups = {}
            for sid, v in smp_pairs:
                _, c, _ = argmin(v, cb)
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

    cb1 = refine(smp, cb1_init)
    cb2_init = [argmin(v, cb1)[2] for v in sample(vs, "r2", k)]
    rsmp = [(sid, argmin(v, cb1)[2]) for sid, v in smp]
    cb2 = refine(rsmp, cb2_init)
    out = []
    for i, v in sorted(vs):
        _, c1, r1 = argmin(v, cb1)
        d2, c2, _ = argmin(r1, cb2)
        out.append((i, c1, c2, d2))
    return out


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    sql = oracles["e_rvq_encode"]
    topk_sql = oracles["e_rvq_topk"]
    refined_sql = oracles["e_rvq_refined"]

    rnd = random.Random(17)
    fails = 0
    for trial in range(trials):
        n = rnd.choice([1, 2, 5, K - 1, K + 3, 40])
        rows = []
        base = []
        for i in range(n):
            if rnd.random() < 0.3:
                # a query id for the top-k oracle: % 300 == 1 (implies
                # % 3 == 1, so it is also in the corpus slice)
                vec_id = 300 * rnd.randint(0, 10 ** 4) + 1
            else:
                vec_id = 3 * rnd.randint(0, 10 ** 6) + rnd.choice([0, 1, 1, 1, 2])
            if rnd.random() < 0.15 or not base:
                v = [f32(rnd.gauss(0, 1)) for _ in range(DIM)]
            elif rnd.random() < 0.5:
                v = list(rnd.choice(base))  # exact duplicate: forces ties
            else:
                v = [0.0] * DIM
            base.append(v)
            rows.append((vec_id, v))
        # de-dup ids (the table key is unique in testdata)
        seen = {}
        rows = [seen.setdefault(i, (i, v))
                for i, v in rows if i not in seen]

        con = duckdb.connect()
        con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])")
        con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
        got = [tuple(r) for r in con.execute(sql).fetchall()]
        got_topk = [tuple(r) for r in con.execute(topk_sql).fetchall()]
        got_refined = [tuple(r) for r in con.execute(refined_sql).fetchall()]
        con.close()

        want = ref_encode(rows)
        want_topk = ref_topk(rows)
        want_refined = ref_refined(rows)
        if got != want:
            fails += 1
            diff = [(g, w) for g, w in zip(got, want) if g != w][:2]
            print(f"FAIL trial {trial}: rows {len(got)} vs {len(want)}, "
                  f"first diffs {diff}")
        elif got_topk != want_topk:
            fails += 1
            diff = [(g, w) for g, w in zip(got_topk, want_topk) if g != w][:2]
            print(f"FAIL trial {trial} topk: rows {len(got_topk)} vs "
                  f"{len(want_topk)}, first diffs {diff}")
        elif got_refined != want_refined:
            fails += 1
            diff = [(g, w)
                    for g, w in zip(got_refined, want_refined) if g != w][:2]
            print(f"FAIL trial {trial} refined: rows {len(got_refined)} vs "
                  f"{len(want_refined)}, first diffs {diff}")

    print(f"{trials - fails}/{trials} trials matched")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
