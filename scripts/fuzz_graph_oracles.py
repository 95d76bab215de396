#!/usr/bin/env python3
"""Fuzz the SHIPPED s_kcore_domains / s_triangle_domains oracle SQL
against independent Python references on random document corpora: the
shipped SQL embeds the whole pipeline (planted-URL construction ->
regex extraction -> co-citation edges -> unrolled 4-round 2-core peel
/ oriented-wedge per-vertex triangle count), so the fuzz exercises
every stage, with extra random URLs injected into the text to reach
graph shapes the fixed planting never produces (isolated cliques,
long chains, nodes appearing only via injected links).

The references do NOT mirror the SQL's algebra: the peel is a direct
set-based loop, and triangles are counted by naive a<b<c adjacency
enumeration (no orientation) — a wedge/orientation bug in the oracle
cannot cancel out.

Usage: python3 scripts/fuzz_graph_oracles.py <verifyOutDir> [trials]
"""
import json
import random
import re
import sys

import duckdb

URL_RE = re.compile(r"https?://[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)*(?:/[^\s]*)?")
DOM_RE = re.compile(r"https?://([A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)*)")


def planted_text(doc_id, text, hub2_below_12):
    """The gates' CASE/concat construction, reimplemented. The two
    gates plant differently on purpose: s_kcore_domains restricts
    hub2 citations to spoke residues < 12 (so the peel has a weak
    tail to shed); s_triangle_domains does not.
    """
    if doc_id % 4 == 0:
        return text
    t = text + " https://s%d.example.com/p/%d" % (doc_id % 23, doc_id)
    if doc_id % 3 == 0:
        t += " http://mirror.example.org/m"
    if doc_id % 5 == 0 and (not hub2_below_12 or doc_id % 23 < 12):
        t += " http://hub2.example.org/x"
    return t


def edges_from_docs(rows, hub2_below_12):
    und = set()
    for doc_id, text in rows:
        doms = set()
        for u in URL_RE.findall(planted_text(doc_id, text, hub2_below_12)):
            m = DOM_RE.match(u)
            if m:
                doms.add(m.group(1))
        doms = sorted(doms)
        for i in range(len(doms)):
            for j in range(i + 1, len(doms)):
                und.add((doms[i], doms[j]))
    return und


def ref_kcore(und, k=2, rounds=4):
    edges = set(und)
    for _ in range(rounds):
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= k}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def ref_tri_per_vertex(und):
    deg = {}
    adj = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in deg}
    vs = sorted(deg)
    for i, a in enumerate(vs):
        for b in vs[i + 1:]:
            if b not in adj[a]:
                continue
            for c in vs:
                if c <= b:
                    continue
                if c in adj[a] and c in adj[b]:
                    tri[a] += 1
                    tri[b] += 1
                    tri[c] += 1
    return {v: (deg[v], tri[v]) for v in deg}


def ref_bfs(und, seeds, rounds=3):
    """Independent BFS: plain frontier loop over dict adjacency."""
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for layer in range(1, rounds + 1):
        nxt = set()
        for v in frontier:
            for n in adj.get(v, ()):
                if n not in dist:
                    nxt.add(n)
        for n in nxt:
            dist[n] = layer
        frontier = nxt
    return dist


def ref_link_predict(und, max_hub=64, min_common=1):
    """Independent RA-index reference: dict adjacency, per-intermediate
    neighbor-pair loop (no wedge SQL algebra), existing edges removed.
    """
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    cand = {}
    for z, nbrs in adj.items():
        d = len(nbrs)
        if d > max_hub:
            continue
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                key = (ns[i], ns[j])
                cn, ra = cand.get(key, (0, 0))
                cand[key] = (cn + 1, ra + 1000000 // d)
    return {k: v for k, v in cand.items()
            if k not in und and v[0] >= min_common}


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

    random.seed(47)
    fails = 0
    for trial in range(trials):
        n_docs = random.randint(1, 40)
        ids = random.sample(range(0, 240), n_docs)
        rows = []
        for doc_id in ids:
            words = " ".join(random.choice(["alpha", "beta", "gamma", "note"])
                             for _ in range(random.randint(0, 4)))
            # injected links reach shapes the planting never makes
            extra = ""
            for _ in range(random.randint(0, 3)):
                extra += " https://x%d.org/a" % random.randint(0, 6)
            if random.random() < 0.3:
                extra += " http://mirror.example.org/m"
            rows.append((doc_id, (words + extra).strip()))

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES " +
            ",".join(f"({d}, '{t}')" for d, t in rows) +
            ") t(doc_id, text)")

        want_k = ref_kcore(edges_from_docs(rows, hub2_below_12=True))
        got_k = {r[0]: r[1]
                 for r in con.sql(oracles["s_kcore_domains"]).fetchall()}
        und = edges_from_docs(rows, hub2_below_12=False)
        want_t = ref_tri_per_vertex(und)
        got_t = {r[0]: (r[1], r[2])
                 for r in con.sql(oracles["s_triangle_domains"]).fetchall()}
        # link prediction and bfs plant like kcore (hub2 restricted < 12)
        und_k = edges_from_docs(rows, hub2_below_12=True)
        want_lp = ref_link_predict(und_k)
        got_lp = {(r[0], r[1]): (r[2], r[3])
                  for r in con.sql(oracles["s_link_predict"]).fetchall()}
        want_b = ref_bfs(und_k, ["hub2.example.org"], rounds=3)
        got_b = {r[0]: r[1]
                 for r in con.sql(oracles["s_bfs_layers"]).fetchall()}

        if (got_k != want_k or got_t != want_t or got_lp != want_lp
                or got_b != want_b):
            fails += 1
            print(f"MISMATCH trial {trial} (docs={n_docs}, edges={len(und)})")
            for nm, g, w in [("kcore", got_k, want_k),
                             ("tri", got_t, want_t),
                             ("linkpred", got_lp, want_lp),
                             ("bfs", got_b, want_b)]:
                if g != w:
                    ks = [k for k in set(g) | set(w) if g.get(k) != w.get(k)]
                    print(f"  {nm} diff {ks[:4]}: got "
                          f"{[g.get(k) for k in ks[:4]]} want "
                          f"{[w.get(k) for k in ks[:4]]}")
    print(f"trials={trials} fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
