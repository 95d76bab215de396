#!/usr/bin/env python3
"""Fuzz the SHIPPED e_ann_beam / e_ann_nndescent oracle SQL against
independent Python references: the same documented algorithms (exact
degree-6 graph or multi-seed NN-descent; min-id entry; fixed rounds;
(score desc, id asc) cuts) re-implemented as direct loops, on random
small corpora with duplicate vectors, near-ties, and corpora smaller
than the beam.

Embedding components are multiples of 1/64 so float32 storage is
exact and Python's float64 arithmetic reproduces the oracle's CAST-
to-double chain bit-for-bit (dot is the same left fold; sqrt and
divide are correctly rounded everywhere).

The shipped gates bind dim=64, corpus = vec_id % 4 = 0, queries =
vec_id % 40 = 1; the harness materializes conforming tables.

Usage: python3 scripts/fuzz_graphann_oracle.py <verifyOutDir> [trials]
"""
import hashlib
import json
import math
import random
import sys

import duckdb

DIM = 64
GRAPH_K = 6
BEAM = 6
BEAM_ROUNDS = 3
TOPK = 5
ND_K = 5
ND_ROUNDS = 2
ND_GROUPS = 16
ND_SEEDS = (42, 43, 44)


def dot(a, b):
    acc = a[0] * b[0]
    for i in range(1, DIM):
        acc = acc + a[i] * b[i]
    return acc


def cos(a, b):
    return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))


def topk_edges(cands, vecs, k):
    by_src = {}
    for s, d in cands:
        by_src.setdefault(s, set()).add(d)
    out = set()
    for s, ds in by_src.items():
        best = sorted(ds, key=lambda d: (-cos(vecs[s], vecs[d]), d))[:k]
        out.update((s, d) for d in best)
    return out


def exact_graph(vecs, k):
    return topk_edges({(a, b) for a in vecs for b in vecs if a != b},
                      vecs, k)


def ref_beam(vecs, queries):
    g = {}
    for s, d in exact_graph(vecs, GRAPH_K):
        g.setdefault(s, set()).add(d)
    entry = min(vecs)
    out = []
    for q, qv in sorted(queries.items()):
        beam = {entry}
        for _ in range(BEAM_ROUNDS):
            cand = set(beam)
            for v in beam:
                cand |= g.get(v, set())
            beam = set(sorted(cand,
                key=lambda n: (-cos(qv, vecs[n]), n))[:BEAM])
        final = sorted(beam, key=lambda n: (-cos(qv, vecs[n]), n))[:TOPK]
        out.extend((q, n, r + 1) for r, n in enumerate(final))
    return out


def bucket(i, seed):
    return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15],
               16) % 1000000


def ref_nndescent_recall(vecs):
    init = set()
    for seed in ND_SEEDS:
        groups = {}
        for i in vecs:
            groups.setdefault(bucket(i, seed) % ND_GROUPS, []).append(i)
        for g in groups.values():
            init.update((a, b) for a in g for b in g if a != b)
    e = topk_edges(init, vecs, ND_K)
    for _ in range(ND_ROUNDS):
        und = set(e) | {(d, s) for s, d in e}
        by = {}
        for s, d in und:
            by.setdefault(s, set()).add(d)
        cand = set(e)
        for v, nb in by.items():
            cand.update((a, b) for a in nb for b in nb if a != b)
        e = topk_edges(cand, vecs, ND_K)
    exact = exact_graph(vecs, ND_K)
    return (len(vecs), len(exact), len(e & exact),
            len(e & exact) * 1000000 // len(exact))


HNSW_UPPER_BEAM = 4
HNSW_UPPER_ROUNDS = 2


def md5hex(s):
    return hashlib.md5(s.encode()).hexdigest()


def hnsw_level(i):
    h = md5hex(f"lvl:{i}")
    n = 0
    while n < len(h) and h[n] == "0":
        n += 1
    return n


def ref_hnsw(vecs, queries):
    """Independent reference of the e_ann_hnsw oracle: the norm-
    filtered level >= 1 layer, exact kNN graphs on both layers, the
    narrow upper descent to a per-query entry (min-id upper entry,
    rescore-everything rounds, (score desc, node) cuts), then the
    base beam from that entry. An EMPTY upper layer yields an empty
    result — the oracle's documented arm (the Scala door instead
    falls back to the flat entry; the gate require precludes the
    divergence)."""
    lvl = {i for i in vecs if hnsw_level(i) >= 1}
    if not lvl or not queries:
        return []

    def gr(nodes):
        g = {}
        for s, d in topk_edges(
                {(a, b) for a in nodes for b in nodes if a != b},
                vecs, GRAPH_K):
            g.setdefault(s, set()).add(d)
        return g

    ug = gr(lvl)
    bg = gr(set(vecs))

    def descend(qv, start, g, width, rounds):
        beam = set(start)
        for _ in range(rounds):
            cand = set(beam)
            for v in beam:
                cand |= g.get(v, set())
            beam = set(sorted(cand,
                key=lambda n: (-cos(qv, vecs[n]), n))[:width])
        return beam

    out = []
    for q, qv in sorted(queries.items()):
        upper = descend(qv, {min(lvl)}, ug, HNSW_UPPER_BEAM,
                        HNSW_UPPER_ROUNDS)
        entry = sorted(upper, key=lambda n: (-cos(qv, vecs[n]), n))[0]
        beam = descend(qv, {entry}, bg, BEAM, BEAM_ROUNDS)
        final = sorted(beam, key=lambda n: (-cos(qv, vecs[n]), n))[:TOPK]
        out.extend((q, n, r + 1) for r, n in enumerate(final))
    return out


def nnd_graph(vecs, node_ids, groups):
    """The NN-descent edge chain (the ref_nndescent_recall build)
    restricted to `node_ids`, as an adjacency dict."""
    sub = set(node_ids)
    init = set()
    for seed in ND_SEEDS:
        by = {}
        for i in sub:
            by.setdefault(bucket(i, seed) % groups, []).append(i)
        for g in by.values():
            init.update((a, b) for a in g for b in g if a != b)
    e = topk_edges(init, vecs, ND_K)
    for _ in range(ND_ROUNDS):
        und = set(e) | {(d, s) for s, d in e}
        by = {}
        for s, d in und:
            by.setdefault(s, set()).add(d)
        cand = set(e)
        for v, nb in by.items():
            cand.update((a, b) for a in nb for b in nb if a != b)
        e = topk_edges(cand, vecs, ND_K)
    g = {}
    for s, d in e:
        g.setdefault(s, set()).add(d)
    return g


def ref_hnsw_nnd(vecs, queries, upper_groups=1, base_groups=16):
    """e_ann_hnsw_nnd: the hnsw descent with per-layer NN-descent
    graphs (upper clique groups=1, base groups=16)."""
    lvl = {i for i in vecs if hnsw_level(i) >= 1}
    if not lvl or not queries:
        return []
    ug = nnd_graph(vecs, lvl, upper_groups)
    bg = nnd_graph(vecs, set(vecs), base_groups)

    def descend(qv, start, g, width, rounds):
        beam = set(start)
        for _ in range(rounds):
            cand = set(beam)
            for v in beam:
                cand |= g.get(v, set())
            beam = set(sorted(cand,
                key=lambda n: (-cos(qv, vecs[n]), n))[:width])
        return beam

    out = []
    for q, qv in sorted(queries.items()):
        upper = descend(qv, {min(lvl)}, ug, HNSW_UPPER_BEAM,
                        HNSW_UPPER_ROUNDS)
        entry = sorted(upper, key=lambda n: (-cos(qv, vecs[n]), n))[0]
        beam = descend(qv, {entry}, bg, BEAM, BEAM_ROUNDS)
        final = sorted(beam, key=lambda n: (-cos(qv, vecs[n]), n))[:TOPK]
        out.extend((q, n, r + 1) for r, n in enumerate(final))
    return out


def ref_rank_metrics(vecs_all, labels, w, idcg, k=10, lab_ids=None):
    """Exact run (excludeSelf) over queries vec_id%20==3, then
    label-match MRR / capped recall / nDCG with the WEIGHT LITERALS
    parsed from the shipped SQL (never re-derives the log).
    `vecs_all` is the NORM-FILTERED run universe (the oracle's q/c
    CTEs); `lab_ids` the label-census universe (the oracle's lab CTE
    reads ALL rows, zero-norm included)."""
    out = []
    lab_n = {}
    for i in (lab_ids if lab_ids is not None else vecs_all):
        lab_n[labels[i]] = lab_n.get(labels[i], 0) + 1
    for q in sorted(i for i in vecs_all if i % 20 == 3):
        ranked = sorted((n for n in vecs_all if n != q),
                        key=lambda n: (-cos(vecs_all[q], vecs_all[n]), n))[:k]
        n_rel = lab_n[labels[q]] - 1
        rels = [1 if labels[n] == labels[q] else 0 for n in ranked]
        first = next((r + 1 for r, x in enumerate(rels) if x), None)
        mrr = 1000000 // first if first else 0
        hits = sum(rels)
        if n_rel > 0:
            recall = hits * 1000000 // min(n_rel, k)
            dcg = sum(w[r] for r, x in enumerate(rels) if x)
            ndcg = dcg * 1000000 // idcg[min(n_rel, k) - 1]
        else:
            mrr = mrr  # mrr independent of n_rel in the oracle
            recall = 0
            ndcg = 0
        out.append((q, n_rel, mrr, recall, ndcg))
    return out


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    import re as _re
    lists = _re.findall(r"\[([0-9][0-9,]+)\]", oracles["e_rank_metrics"])
    w = [int(x) for x in lists[0].split(",")]
    idcg = [int(x) for x in lists[1].split(",")]

    # multiples of 4 whose md5 level is >= 1 — planted so most trials
    # populate the hnsw upper layer (a 1/16 draw would leave it empty
    # in most small corpora, starving the two-layer descent arm)
    upper_pool = [i for i in range(4, 6000, 4) if hnsw_level(i) >= 1]

    random.seed(61)
    fails = 0
    for trial in range(trials):
        n = random.randint(3, 28)
        corpus_ids = [4 * i for i in range(1, n + 1)]
        if random.random() < 0.75:
            # adversarial hnsw arms: duplicate vectors across layers,
            # entry ties, and (below) zero-norm upper nodes; without
            # this splice the trial exercises the empty-upper arm
            extra = random.sample(upper_pool, random.randint(1, 3))
            corpus_ids = sorted(set(corpus_ids) | set(extra))
        query_ids = [40 * i + 1 for i in range(random.randint(1, 3))]
        # rank-metrics queries live on a third residue family (%20==3)
        rank_ids = [20 * i + 3 for i in range(random.randint(1, 3))]
        vecs = {}
        for i in corpus_ids:
            vecs[i] = [random.randint(-64, 64) / 64.0 for _ in range(DIM)]
        # plant a duplicate pair (score ties -> id tie-break) when big
        if n >= 6:
            vecs[corpus_ids[3]] = list(vecs[corpus_ids[1]])
        # a zero-norm vector on an upper-level id: the norm filter
        # must exclude it from BOTH layers, not just the base
        if random.random() < 0.3:
            zid = random.choice([i for i in corpus_ids
                                 if hnsw_level(i) >= 1] or corpus_ids)
            vecs[zid] = [0.0] * DIM
        # a duplicate across layers: an upper-level node sharing its
        # vector with a base-only node (argmin tie at the entry pick)
        dup_uppers = [i for i in corpus_ids if hnsw_level(i) >= 1]
        if dup_uppers and n >= 4:
            base_only = [i for i in corpus_ids if hnsw_level(i) == 0]
            if base_only:
                vecs[dup_uppers[0]] = list(vecs[base_only[0]])
        queries = {q: [random.randint(-64, 64) / 64.0 for _ in range(DIM)]
                   for q in query_ids}
        rank_vecs = {q: [random.randint(-64, 64) / 64.0 for _ in range(DIM)]
                     for q in rank_ids}
        all_vecs = {**vecs, **queries, **rank_vecs}
        labels = {i: random.randint(0, 2) for i in all_vecs}
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE embeddings AS SELECT * FROM (VALUES " +
            ",".join(
                f"({i}, CAST({list(map(float, v))} AS FLOAT[]), {labels[i]})"
                for i, v in all_vecs.items()) +
            ") t(vec_id, embedding, label)")

        # every oracle's q/c CTE is norm-filtered — the refs see the
        # same universe (the zero-norm plant tests exactly this)
        def nz(d):
            return {i: v for i, v in d.items() if any(x != 0.0 for x in v)}

        vecs_nz = nz(vecs)
        got_beam = [(r[0], r[1], r[2])
                    for r in con.sql(oracles["e_ann_beam"]).fetchall()]
        want_beam = ref_beam(vecs_nz, nz(queries))
        got_nd = tuple(map(int,
            con.sql(oracles["e_ann_nndescent"]).fetchall()[0]))
        want_nd = ref_nndescent_recall(vecs_nz)
        got_hnsw = [(r[0], r[1], r[2])
                    for r in con.sql(oracles["e_ann_hnsw"]).fetchall()]
        want_hnsw = ref_hnsw(vecs_nz, nz(queries))
        got_hnnd = [(r[0], r[1], r[2])
                    for r in con.sql(oracles["e_ann_hnsw_nnd"]).fetchall()]
        want_hnnd = ref_hnsw_nnd(vecs_nz, nz(queries))
        got_rm = [tuple(map(int, r)) for r in
                  con.sql(oracles["e_rank_metrics"]).fetchall()]
        want_rm = ref_rank_metrics(nz(all_vecs), labels, w, idcg,
                                   lab_ids=list(all_vecs))
        if (got_beam != want_beam or got_nd != want_nd
                or got_hnsw != want_hnsw or got_hnnd != want_hnnd
                or got_rm != want_rm):
            fails += 1
            print(f"MISMATCH trial {trial} (n={n})")
            if got_beam != want_beam:
                print("  beam got ", got_beam[:8])
                print("  beam want", want_beam[:8])
            if got_nd != want_nd:
                print(f"  nd got {got_nd} want {want_nd}")
            if got_hnsw != want_hnsw:
                print("  hnsw got ", got_hnsw[:8])
                print("  hnsw want", want_hnsw[:8])
            if got_hnnd != want_hnnd:
                print("  hnsw_nnd got ", got_hnnd[:8])
                print("  hnsw_nnd want", want_hnnd[:8])
            if got_rm != want_rm:
                print("  rank got ", got_rm[:4])
                print("  rank want", want_rm[:4])
        con.close()
    print(f"trials={trials} fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
