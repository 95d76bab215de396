#!/usr/bin/env python3
"""Fuzz the SHIPPED e_ivfrvq_refined oracle SQL against an independent
Python reference of the composed additive-quantizer index: seed-drawn
RVQ draws -> per-stage deterministic Lloyd (stage 2 residualized
against the REFINED stage 1) -> shared encode tail -> md5-seeded L2
coarse cells -> RVQ ADC over probed survivors with the pinned
(t1 + t2) + x addition order.

New surface vs fuzz_rvq_oracle (which pins the refined ENCODE): the
L2 cell assignment/probe ranking (ties to the smallest cell id, no
norm exclusions anywhere — L2 has no NaN hazard), the probe pruning,
and the composed ADC scored join. Corpora force duplicates (ties at
every stage), zero vectors, corpora narrower than k, and
float32-rounded values like the parquet column.

Usage: python3 scripts/fuzz_ivfrvq_oracle.py <verifyOutDir> [trials]
"""
import hashlib
import json
import random
import struct
import sys

import duckdb

K, ITERS, TRAIN, DIM, SEED = 8, 2, 120, 64, 42
NCELLS, NPROBE, N = 16, 4, 5


def f32(x):
    return struct.unpack("f", struct.pack("f", x))[0]


def md5hex(s):
    return hashlib.md5(s.encode()).hexdigest()


def l2sq(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) * (x - y)
    return acc


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


def sample(vs, salt, k):
    order = sorted(vs, key=lambda iv: (md5hex(f"{SEED}:{salt}:{iv[0]}"), iv[0]))
    return [v for _, v in order[:k]]


def refine(smp_pairs, cb0):
    cb = [list(c) for c in cb0]
    for _ in range(ITERS):
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


def ref_ivfrvq(rows):
    vs = [(i, [float(x) for x in v]) for i, v in rows if i % 3 == 1]
    if not vs:
        return []
    # refined codebooks (the fuzz_rvq_oracle ref_refined recipe)
    cb1_init = sample(vs, "r1", K)
    smp = sorted(vs, key=lambda iv: (md5hex(f"{SEED}:rvql:{iv[0]}"), iv[0]))
    smp = smp[:TRAIN]
    cb1 = refine(smp, cb1_init)
    cb2_init = [argmin(v, cb1)[2] for v in sample(vs, "r2", K)]
    cb2 = refine([(sid, argmin(v, cb1)[2]) for sid, v in smp], cb2_init)
    codes = {}
    for i, v in vs:
        _, c1, r1 = argmin(v, cb1)
        _, c2, _ = argmin(r1, cb2)
        codes[i] = (c1, c2)
    # md5-seeded L2 cells (no norm filter — L2 end-to-end)
    cents = sorted(vs, key=lambda iv: (md5hex(str(iv[0])), iv[0]))[:NCELLS]
    assigned = {i: min((l2sq(v, cv), cell) for cell, cv in cents)[1]
                for i, v in vs}

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
        ranked = sorted((l2sq(q, cv), cell) for cell, cv in cents)
        probes = set(cell for _, cell in ranked[:NPROBE])
        t1 = [l2sq(q, cent) for cent in cb1]
        t2 = [fold([c * c - 2.0 * p * c for p, c in zip(q, cent)])
              for cent in cb2]
        scored = sorted(
            ((t1[c1] + t2[c2]) + x[c1][c2], nid)
            for nid, (c1, c2) in codes.items()
            if nid != qid and assigned[nid] in probes)
        for rank, (adc, nid) in enumerate(scored[:N], start=1):
            out.append((qid, nid, rank, adc))
    return out


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    sql = oracles["e_ivfrvq_refined"]

    rnd = random.Random(31)
    fails = 0
    for trial in range(trials):
        n = rnd.choice([1, 2, 5, K - 1, K + 3, 40, 90])
        rows = []
        base = []
        for _ in range(n):
            if rnd.random() < 0.3:
                vec_id = 300 * rnd.randint(0, 10 ** 4) + 1  # query (%3==1 too)
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
        seen = {}
        rows = [seen.setdefault(i, (i, v)) for i, v in rows if i not in seen]

        con = duckdb.connect()
        con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])")
        con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
        got = [tuple(r) for r in con.execute(sql).fetchall()]
        con.close()

        want = ref_ivfrvq(rows)
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
