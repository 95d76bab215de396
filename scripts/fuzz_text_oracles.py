#!/usr/bin/env python3
"""Fuzz the SHIPPED t_lm_surprise / t_lm_kneser_ney /
t_lm_stupid_backoff / t_bm25_topk oracle SQL against
independent Python references (Python floats are IEEE doubles, so
the references replicate the documented op order exactly).

Adversarial corpora: quote/delimiter characters in tokens, repeated
tokens (tf extremes), docs shorter than the n-gram order, empty-ish
docs, and corpora where the baked-in BM25 query terms are ubiquitous
or absent.

Usage: python3 scripts/fuzz_text_oracles.py <verifyOutDir> [trials]
"""
import json
import math
import random
import re
import sys

import duckdb

BM25_QUERIES = [(1, "hash join"), (2, "window agg stream"),
                (3, "fast vector scan")]
K1, B, TOPK = 1.2, 0.75, 10


def toks(s):
    return [w for w in re.split(r"\s+", s.strip().lower()) if w]


def ref_lm(corpus, reference, order=2):
    def ngrams(t, n):
        return [tuple(t[i:i + n]) for i in range(len(t) - n + 1)]
    pc, gc, vocab = {}, {}, set()
    for t in map(toks, reference):
        vocab.update(t)
        for g in ngrams(t, order - 1):
            pc[g] = pc.get(g, 0) + 1
        for g in ngrams(t, order):
            gc[g] = gc.get(g, 0) + 1
    v = len(vocab)
    out = {}
    for did, text in corpus:
        grams = ngrams(toks(text), order)
        s = 0
        for g in grams:
            c1 = pc.get(g[:order - 1], 0)
            c12 = gc.get(g, 0)
            s += math.floor((c1 + v) / (c12 + 1) * 1e6)
        mean = s / len(grams) / 1e6 if grams else 0.0
        out[did] = (len(grams), s, mean)
    return out


def ref_kn(corpus, reference):
    def bigrams(t):
        return [tuple(t[i:i + 2]) for i in range(len(t) - 1)]
    pc, gc, vocab = {}, {}, set()
    for t in map(toks, reference):
        vocab.update(t)
        for w in t[:-1]:  # tokens in PREFIX position (all but last)
            pc[w] = pc.get(w, 0) + 1
        for g in bigrams(t):
            gc[g] = gc.get(g, 0) + 1
    v = len(vocab)
    nw, nc = {}, {}
    for (w1, w2) in gc:
        nw[w1] = nw.get(w1, 0) + 1
        nc[w2] = nc.get(w2, 0) + 1
    nt = len(gc)
    out = {}
    for did, text in corpus:
        grams = bigrams(toks(text))
        s = 0
        for (w1, w2) in grams:
            pcont = (nc.get(w2, 0) + 1) / (nt + v)
            c1 = pc.get(w1, 0)
            if c1 > 0:
                pkn = (max(gc.get((w1, w2), 0) - 0.75, 0.0)
                       + (0.75 * nw.get(w1, 0)) * pcont) / c1
            else:
                pkn = pcont
            s += math.floor(1e6 / pkn)
        mean = s / len(grams) / 1e6 if grams else 0.0
        out[did] = (len(grams), s, mean)
    return out


def ref_sb(corpus, reference):
    def bigrams(t):
        return [tuple(t[i:i + 2]) for i in range(len(t) - 1)]
    pc, gc, uc = {}, {}, {}
    for t in map(toks, reference):
        for w in t:
            uc[w] = uc.get(w, 0) + 1
        for w in t[:-1]:  # prefix-position totals
            pc[w] = pc.get(w, 0) + 1
        for g in bigrams(t):
            gc[g] = gc.get(g, 0) + 1
    n = sum(uc.values())
    v = len(uc)
    out = {}
    for did, text in corpus:
        grams = bigrams(toks(text))
        s = 0
        for (w1, w2) in grams:
            c12 = gc.get((w1, w2), 0)
            if c12 > 0:
                sb = c12 / pc[w1]
            else:
                sb = 0.4 * (uc.get(w2, 0) + 1) / (n + v)
            s += math.floor(1e6 / sb)
        mean = s / len(grams) / 1e6 if grams else 0.0
        out[did] = (len(grams), s, mean)
    return out


def ref_bm25(corpus, queries, k):
    doc_toks = [(did, toks(t)) for did, t in corpus]
    n = len(corpus)
    total = sum(len(t) for _, t in doc_toks)
    out = {}
    for qid, qtext in queries:
        terms = list(dict.fromkeys(toks(qtext)))
        cand = []
        for did, t in doc_toks:
            matched = [w for w in terms if w in t]
            if not matched:
                continue
            s = 0
            for w in matched:
                tf = t.count(w)
                df = sum(1 for _, u in doc_toks if w in u)
                idf = ((n - df) + 0.5) / (df + 0.5)
                norm = K1 * ((1 - B) + B * (len(t) / (total / n)))
                tfpart = (tf * (K1 + 1)) / (tf + norm)
                s += math.floor(idf * tfpart * 1e6)
            cand.append((did, len(matched), s))
        cand.sort(key=lambda c: (-c[2], c[0]))
        for rnk, (did, nt, s) in enumerate(cand[:k], start=1):
            out[(qid, did)] = (nt, s, rnk)
    return out


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    lm_sql = oracles["t_lm_surprise"]
    lm3_sql = oracles["t_lm_surprise3"]
    bm_sql = oracles["t_bm25_topk"]
    kn_sql = oracles["t_lm_kneser_ney"]
    sb_sql = oracles["t_lm_stupid_backoff"]

    random.seed(99)
    query_words = [w for _, q in BM25_QUERIES for w in q.split()]
    fails = 0
    for trial in range(trials):
        vocab = random.choice([
            ["a", "b", "aa"], ["x'y", "z.", "<t>", "q"],
            query_words + ["pad", "x"], ["hash", "hash", "join", "w"]])
        def sentence():
            return " ".join(random.choices(vocab, k=random.randint(0, 14)))
        docs = [(i, sentence()) for i in range(random.randint(3, 40))]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES " +
                    ",".join("(%d, '%s')" % (i, d.replace("'", "''"))
                             for i, d in docs) + ") t(doc_id, text)")
        # lm gate: score %10=7 against reference %2=0
        want_lm = ref_lm([d for d in docs if d[0] % 10 == 7],
                         [t for i, t in docs if i % 2 == 0])
        got_lm = {r[0]: (r[1], r[2], r[3]) for r in con.sql(lm_sql).fetchall()}
        want_lm3 = ref_lm([d for d in docs if d[0] % 10 == 1],
                          [t for i, t in docs if i % 2 == 1], order=3)
        got_lm3 = {r[0]: (r[1], r[2], r[3]) for r in con.sql(lm3_sql).fetchall()}
        # kn gate: score %10=4 against reference %2=0
        want_kn = ref_kn([d for d in docs if d[0] % 10 == 4],
                         [t for i, t in docs if i % 2 == 0])
        got_kn = {r[0]: (r[1], r[2], r[3]) for r in con.sql(kn_sql).fetchall()}
        # stupid backoff gate: score %10=4 against reference %2=0
        want_sb = ref_sb([d for d in docs if d[0] % 10 == 4],
                         [t for i, t in docs if i % 2 == 0])
        got_sb = {r[0]: (r[1], r[2], r[3]) for r in con.sql(sb_sql).fetchall()}
        # bm25 gate: corpus %2=1
        want_bm = ref_bm25([d for d in docs if d[0] % 2 == 1],
                           BM25_QUERIES, TOPK)
        got_bm = {(r[0], r[1]): (r[2], r[3], r[4])
                  for r in con.sql(bm_sql).fetchall()}
        if (got_lm != want_lm or got_lm3 != want_lm3 or got_bm != want_bm
                or got_kn != want_kn or got_sb != want_sb):
            fails += 1
            print(f"MISMATCH trial {trial}: docs={docs}")
            if got_lm != want_lm:
                print(f"  lm got  {got_lm}\n  lm want {want_lm}")
            if got_lm3 != want_lm3:
                print(f"  lm3 got  {got_lm3}\n  lm3 want {want_lm3}")
            if got_bm != want_bm:
                print(f"  bm got  {got_bm}\n  bm want {want_bm}")
            if got_kn != want_kn:
                print(f"  kn got  {got_kn}\n  kn want {want_kn}")
            if got_sb != want_sb:
                print(f"  sb got  {got_sb}\n  sb want {want_sb}")
    print(f"trials={trials} fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
