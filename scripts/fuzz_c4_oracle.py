#!/usr/bin/env python3
"""Fuzz the SHIPPED t_c4_filters oracle SQL against an independent
Python reference of the documented C4 rules.

The real-data gate already caught one engine divergence in this
oracle's corner space (DuckDB's array_to_string on an EMPTY list is
NULL where Spark's array_join is '') — this fuzzer keeps that class
covered: corpora with zero kept lines, terminal-quote endings,
trailing-space lines, unicode, case-mixed lorem ipsum, brace-only
pages, exactly-3-sentence boundaries, and empty documents.

The gate's oracle reads from a planted subquery (doc_id % 4 = 3
slice, three plant branches by doc_id % 3); the reference replicates
the slice and the plant exactly.

Usage: python3 scripts/fuzz_c4_oracle.py <verifyOutDir> [trials]
"""
import hashlib
import json
import random
import re
import sys

import duckdb

TOK_RE = re.compile(r"[\t\n\x0b\f\r ]+")


def words(line):
    return len([t for t in TOK_RE.split(line.strip(" ")) if t != ""])


def ref(text):
    lines = text.split("\n")
    kept = [l for l in lines
            if re.search(r'[.!?"]\r?$', l.rstrip(" ")) and words(l) >= 5]
    cleaned = "\n".join(kept)
    sentences = len(re.findall(r"[.!?]+", cleaned))
    lorem = "lorem ipsum" in text.lower()
    brace = "{" in text
    return (len(lines), len(kept),
            hashlib.md5(cleaned.encode()).hexdigest(), sentences,
            lorem, brace, sentences >= 3 and not lorem and not brace)


def plant(doc_id, text):
    if doc_id % 3 == 0:
        return text + "."
    if doc_id % 3 == 1:
        return text + ".\n" + text + "!\n" + text + "?"
    return text + " {lorem ipsum}"


WORDS = ["alpha", "bb", "naïve", "☃", "x", "LoReM", "IpSuM", "{", "end."]
TAILS = [".", "!", "?", '"', "", " ", "...", ".  ", "?!", ".\r", "\r"]


def synth_doc(rnd):
    if rnd.random() < 0.1:
        return ""
    n_lines = rnd.randint(1, 6)
    out = []
    for _ in range(n_lines):
        line = " ".join(
            WORDS[rnd.randrange(len(WORDS))] for _ in range(rnd.randint(0, 8)))
        out.append(line + TAILS[rnd.randrange(len(TAILS))])
    return "\n".join(out)


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["t_c4_filters"]

    rnd = random.Random(53)
    fails = 0
    for trial in range(trials):
        n = rnd.choice([1, 4, 12])
        rows = []
        for i in range(n):
            doc_id = rnd.choice([12 * i + 3, 12 * i + 7, 12 * i + 11,
                                 12 * i + 2])
            rows.append((doc_id, synth_doc(rnd)))
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        got = [tuple(r) for r in con.execute(sql).fetchall()]
        con.close()

        want = [(doc_id,) + ref(plant(doc_id, text))
                for doc_id, text in sorted(rows) if doc_id % 4 == 3]
        if got != want:
            fails += 1
            diff = [(g, w) for g, w in zip(got, want) if g != w][:2]
            print(f"FAIL trial {trial}: rows {len(got)} vs {len(want)}, "
                  f"first diffs {diff}")

    print(f"{trials - fails}/{trials} trials matched")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
