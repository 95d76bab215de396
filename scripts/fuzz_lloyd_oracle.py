#!/usr/bin/env python3
"""Fuzz the SHIPPED e_ann_ivf_lloyd_topk AND e_semdedup oracle SQL against an
independent Python reference: the same documented algorithm (md5-seeded
init, bounded md5 sample, argmax-cosine assignment with smallest-cell
tie-break, id-ordered sequential-fold centroid means, empty cells keep
the prior centroid, top-nProbe probe, (score desc, id) rank) written as
direct loops, on random small corpora with duplicate vectors, zero
vectors, and corpora smaller than nCells.

Embedding components are multiples of 1/64 so float32 storage is exact
and Python float64 arithmetic reproduces the oracle's CAST-to-double
chain bit-for-bit (dot is the same left fold; sqrt and divide are
correctly rounded everywhere).

The shipped gate binds dim=64, nCells=16, nProbe=4, iters=2,
maxTrainRows=300, seed=42, k=5, queries = s0 ids with id % 40 = 1
(queries are corpus members; self excluded in scoring).

Usage: python3 scripts/fuzz_lloyd_oracle.py <verifyOutDir> [trials]
"""
import hashlib
import json
import math
import random
import sys

import duckdb

DIM = 64
N_CELLS = 16
N_PROBE = 4
ITERS = 2
MAX_TRAIN = 300
SEED = 42
K = 5


def dot(a, b):
    acc = a[0] * b[0]
    for i in range(1, DIM):
        acc = acc + a[i] * b[i]
    return acc


def cos(a, b):
    return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))


def md5hex(s):
    return hashlib.md5(s.encode()).hexdigest()


def live_cells(cents):
    """Zero-norm centroids are excluded from assignment AND probing —
    a cancelled refined centroid would cosine to NaN/NULL and diverge
    the engines (the lloydCentsArray rule)."""
    return {c: v for c, v in cents.items() if dot(v, v) > 0}


def assign(ids, vecs, cents):
    """id -> cell: argmax cosine, ties to the smallest cell id."""
    cs = live_cells(cents)
    out = {}
    for i in ids:
        best = sorted(cs, key=lambda c: (-cos(vecs[i], cs[c]), c))[0]
        out[i] = best
    return out


def train_cents(s0):
    """The shared Lloyd trainer: md5 sample + seeds, ITERS refinement
    rounds, empty cells keep the prior centroid."""
    smp = sorted(s0, key=lambda i: (md5hex(f"{SEED}:{i}"), i))[:MAX_TRAIN]
    seeds = sorted(smp, key=lambda i: (md5hex(str(i)), i))[:N_CELLS]
    cents = {i: list(s0[i]) for i in seeds}
    for _ in range(ITERS):
        a = assign(smp, s0, cents)
        members = {}
        for i in smp:
            members.setdefault(a[i], []).append(i)
        nxt = {}
        for c in cents:
            ms = sorted(members.get(c, []))
            if not ms:
                nxt[c] = cents[c]  # empty cell keeps prior centroid
            else:
                cnt = float(len(ms))
                mean = []
                for d in range(DIM):
                    acc = s0[ms[0]][d]
                    for m in ms[1:]:
                        acc = acc + s0[m][d]
                    mean.append(acc / cnt)
                nxt[c] = mean
        cents = nxt
    return cents


SEM_OFFSET = 1000000
SEM_DELTA = 0.01
SEM_THRESHOLD = 0.9


def ref_semdedup(vecs_raw):
    """Independent SemDeDup reference: planted union, shared trainer,
    full-corpus assignment, within-cell lower-id partners >= threshold,
    min-id keeper."""
    union = {i: [float(x) for x in v] for i, v in vecs_raw.items()}
    for i, v in vecs_raw.items():
        if i % 20 == 3:
            union[i + SEM_OFFSET] = [x + SEM_DELTA for x in v]
    s0 = {i: v for i, v in union.items() if dot(v, v) > 0}
    cents = train_cents(s0)
    af = assign(list(s0), s0, cents)
    out = []
    for x in sorted(s0):
        partners = [y for y in s0
                    if af[y] == af[x] and y < x
                    and cos(s0[x], s0[y]) >= SEM_THRESHOLD]
        if partners:
            out.append((x, af[x], min(partners), len(partners)))
    return out


def ref_semdedup_incr(vecs_raw):
    """Independent reference for the INCREMENTAL SemDeDup oracle
    (st_semdedup_incr / e_semdedup_store): train on the CORPUS ONLY
    (unlike ref_semdedup's planted union), assign the corpus (af) and
    the perturbed twins (an) through the SAME argmax chain — the
    double-applied assignment CTEs are exactly what this reference
    pins — and emit every same-cell (twin, corpus) pair at threshold,
    ordered (new_id, corpus_id)."""
    corpus = {i: [float(x) for x in v] for i, v in vecs_raw.items()}
    s0 = {i: v for i, v in corpus.items() if dot(v, v) > 0}
    cents = train_cents(s0)
    af = assign(list(s0), s0, cents)
    # twins derive from ALL matching corpus rows (including zero-norm
    # sources: a zero vector's twin is [delta]*DIM — nonzero, so it
    # ASSIGNS even though its source was excluded from s0)
    tw = {i + SEM_OFFSET: [x + SEM_DELTA for x in v]
          for i, v in corpus.items() if i % 20 == 3}
    tnz = {i: v for i, v in tw.items() if dot(v, v) > 0}
    an = assign(list(tnz), tnz, cents)
    out = []
    for t in sorted(tnz):
        for a in sorted(s0):
            if an[t] == af[a]:
                c = cos(tnz[t], s0[a])
                if c >= SEM_THRESHOLD:
                    out.append((t, a, c))
    return out


def ref_lloyd_topk(vecs_raw):
    # s0: zero-norm excluded
    s0 = {i: v for i, v in vecs_raw.items() if dot(v, v) > 0}
    cents = train_cents(s0)
    af = assign(list(s0), s0, cents)
    cell_members = {}
    for i, c in af.items():
        cell_members.setdefault(c, []).append(i)
    out = []
    live = live_cells(cents)
    for q in sorted(i for i in s0 if i % 40 == 1):
        probes = sorted(live, key=lambda c: (-cos(s0[q], live[c]), c))[:N_PROBE]
        cand = [n for c in probes for n in cell_members.get(c, []) if n != q]
        ranked = sorted(cand, key=lambda n: (-cos(s0[q], s0[n]), n))[:K]
        out.extend((q, n, r + 1, cos(s0[q], s0[n]))
                   for r, n in enumerate(ranked))
    return out


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    sql = oracles["e_ann_ivf_lloyd_topk"]
    sem_sql = oracles["e_semdedup"]
    incr_sql = oracles["st_semdedup_incr"]

    random.seed(73)
    fails = 0
    for trial in range(trials):
        # every 10th trial goes BIG (n > maxTrainRows) so the bounded
        # md5-sample path (smp a strict subset of s0) is genuinely
        # exercised — small trials leave that CTE chain an identity
        big = trial % 10 == 9
        n = random.randint(MAX_TRAIN + 5, MAX_TRAIN + 40) if big \
            else random.randint(3, 30)
        ids = sorted(random.sample(range(0, 4000 if big else 400), n))
        # guarantee at least one query id (1 mod 40) and one planted
        # source (3 mod 20) so neither oracle runs on an empty cohort —
        # by ADDING ids, never replacing (a slot replacement could
        # clobber the trial's only member of the other cohort and
        # silently degrade that arm to an empty no-op)
        if not any(i % 40 == 1 for i in ids):
            ids.append(40 * random.randint(0, 9) + 1)
        if not any(i % 20 == 3 for i in ids):
            ids.append(20 * random.randint(0, 9) + 3)
        ids = sorted(set(ids))
        vecs = {i: [random.randint(-64, 64) / 64.0 for _ in range(DIM)]
                for i in ids}
        # adversarial plants: a duplicate pair (tie-break) and a zero
        # vector (s0 exclusion) when the corpus is big enough
        if len(ids) >= 6:
            vecs[ids[3]] = list(vecs[ids[1]])
            vecs[ids[5]] = [0.0] * DIM
        # every 3rd trial, aim the plants at the INCR oracle's twin
        # cohort: a zero vector AT a %20==3 id (its twin is nonzero
        # and must assign while the source sits outside s0/af), and an
        # exact duplicate of a twin SOURCE at a different id (exact
        # centroid ties whose twins straddle the tie identically)
        if trial % 3 == 0:
            three = [i for i in ids if i % 20 == 3]
            others = [i for i in ids if i % 20 != 3]
            if three:
                vecs[three[0]] = [0.0] * DIM
            if len(three) >= 2 and others:
                vecs[three[-1]] = list(vecs[others[0]])
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE embeddings AS SELECT * FROM (VALUES " +
            ",".join(f"({i}, CAST({list(map(float, v))} AS FLOAT[]), 0)"
                     for i, v in vecs.items()) +
            ") t(vec_id, embedding, label)")
        got = [(int(r[0]), int(r[1]), int(r[2]), float(r[3]))
               for r in con.sql(sql).fetchall()]
        want = ref_lloyd_topk(vecs)
        if got != want:
            fails += 1
            print(f"MISMATCH trial {trial} (n={len(ids)})")
            print("  got ", got[:6])
            print("  want", want[:6])
        got_sem = [(int(r[0]), int(r[1]), int(r[2]), int(r[3]))
                   for r in con.sql(sem_sql).fetchall()]
        want_sem = ref_semdedup(vecs)
        if got_sem != want_sem:
            fails += 1
            print(f"SEMDEDUP MISMATCH trial {trial} (n={len(ids)})")
            print("  got ", got_sem[:6])
            print("  want", want_sem[:6])
        got_incr = [(int(r[0]), int(r[1]), float(r[2]))
                    for r in con.sql(incr_sql).fetchall()]
        want_incr = ref_semdedup_incr(vecs)
        if got_incr != want_incr:
            fails += 1
            print(f"SEMDEDUP-INCR MISMATCH trial {trial} (n={len(ids)})")
            print("  got ", got_incr[:6])
            print("  want", want_incr[:6])
        con.close()
    print(f"trials={trials} fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
