#!/usr/bin/env python3
"""Fuzz the SHIPPED t_gopher_rep oracle SQL against an independent
Python reference of the documented repetition rules.

The oracle is a nontrivial reformulation (unnest + census CTEs +
window argmax vs the operator's explode/groupBy/struct-min), and the
real-data gate plants its duplication with a single doubling, so it
can pass while the census is wrong in general — e.g. a tie-break that
orders grams differently, a line split that drops trailing empties, a
char count that measures bytes instead of codepoints, or a ppm floor
that rounds. Corpora here are adversarial: unicode (multi-byte chars
whose byte order must still match codepoint comparisons), empty lines
and trailing newlines, tab/space runs, top-gram count ties, periodic
token streams with many duplicated n-grams, and single-token and
empty documents.

The gate's oracle reads from a planted subquery (doc_id % 4 = 2 slice,
text doubled when doc_id % 8 = 2); the reference replicates the slice
and the plant exactly.

Usage: python3 scripts/fuzz_gopher_oracle.py <verifyOutDir> [trials]
"""
import json
import random
import re
import sys

import duckdb

TOK_RE = re.compile(r"[\t\n\x0b\f\r ]+")


def tokens(text):
    return [t for t in TOK_RE.split(text.strip(" ").lower()) if t != ""]


def grams(toks, n):
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def ppm(num, den):
    return num * 1000000 // den if den > 0 else 0


def ref(text, top_n=2, dup_n=5):
    lines = text.split("\n")
    n_lines = len(lines)
    counts = {}
    for l in lines:
        counts[l] = counts.get(l, 0) + 1
    dup_lines = sum(c - 1 for c in counts.values())
    line_chars = sum(len(l) for l in lines)
    dup_line_chars = sum(len(l) * (c - 1) for l, c in counts.items())
    toks = tokens(text)
    tok_chars = len(" ".join(toks))
    tc = {}
    for g in grams(toks, top_n):
        tc[g] = tc.get(g, 0) + 1
    top_chars = 0
    if tc:
        g, c = min(tc.items(), key=lambda kv: (-kv[1], kv[0]))
        top_chars = c * len(g)
    dc = {}
    for g in grams(toks, dup_n):
        dc[g] = dc.get(g, 0) + 1
    dup_gram_chars = sum(c * len(g) for g, c in dc.items() if c > 1)
    return (n_lines, ppm(dup_lines, n_lines),
            ppm(dup_line_chars, line_chars),
            ppm(top_chars, tok_chars), ppm(dup_gram_chars, tok_chars))


WORDS = ["a", "bb", "ccc", "the", "naïve", "☃", "x", "yy", "漢字", "zz-1"]


def synth_doc(rnd):
    kind = rnd.random()
    if kind < 0.08:
        return ""
    if kind < 0.15:
        return rnd.choice(WORDS)
    n_lines = rnd.randint(1, 6)
    lines = []
    for _ in range(n_lines):
        n_tok = rnd.randint(0, 12)
        sep = rnd.choice([" ", "  ", "\t", " \t "])
        base = sep.join(rnd.choice(WORDS) for _ in range(n_tok))
        if rnd.random() < 0.3:  # periodic repetition inside the line
            base = " ".join([base] * rnd.randint(2, 3))
        lines.append(base)
    # duplicate some lines; sometimes a trailing newline (empty line)
    lines += [rnd.choice(lines) for _ in range(rnd.randint(0, 2))]
    doc = "\n".join(lines)
    if rnd.random() < 0.2:
        doc += "\n"
    return doc


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["t_gopher_rep"]

    rnd = random.Random(31)
    fails = 0
    for trial in range(trials):
        n = rnd.choice([1, 3, 8, 20])
        rows = []
        for i in range(n):
            # cover both plant residues (2, 6 mod 8) and off-slice ids
            doc_id = rnd.choice(
                [8 * i + 2, 8 * i + 6, 8 * i + 1, 8 * i + 3])
            rows.append((doc_id, synth_doc(rnd)))
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        got = [tuple(r) for r in con.execute(sql).fetchall()]
        con.close()

        want = []
        for doc_id, text in sorted(rows):
            if doc_id % 4 != 2:
                continue
            planted = text + "\n" + text if doc_id % 8 == 2 else text
            want.append((doc_id,) + ref(planted))
        if got != want:
            fails += 1
            diff = [(g, w) for g, w in zip(got, want) if g != w][:2]
            print(f"FAIL trial {trial}: rows {len(got)} vs {len(want)}, "
                  f"first diffs {diff}")

    print(f"{trials - fails}/{trials} trials matched")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
