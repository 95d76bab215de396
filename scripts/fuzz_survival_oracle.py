#!/usr/bin/env python3
"""Fuzz the SHIPPED ev_survival oracle SQL against an independent
Python Kaplan-Meier reference on adversarial activity logs: single
users, duration ties, all-censored cohorts, one-event (duration-0)
users, and users whose plant residue truncates them to a single day.

The oracle reads `events(event_id, ts TIMESTAMP, user_id, event_type,
value)` with the gate's plant (day <= user_id % 29, epoch-day offset
19723 = 2024-01-01); the harness materializes one table per trial.

Usage: python3 scripts/fuzz_survival_oracle.py <verifyOutDir> [trials]
"""
import json
import random
import sys

import duckdb

DAY_US = 86400 * 1000**2
EPOCH0 = 19723  # 2024-01-01 in epoch days
GAP = 5


def ref_km(rows):
    """rows: (event_id, ts_us, user_id). Independent direct loop."""
    spans = {}
    for eid, tsus, uid in rows:
        day = tsus // DAY_US - EPOCH0
        if day > uid % 29:
            continue
        fd, ld = spans.get(uid, (day, day))
        spans[uid] = (min(fd, day), max(ld, day))
    if not spans:
        return []
    horizon = max(ld for _, ld in spans.values())
    census = {}
    for fd, ld in spans.values():
        t = ld - fd
        death = 1 if ld + GAP <= horizon else 0
        d, c = census.get(t, (0, 0))
        census[t] = (d + death, c + (1 - death))
    out = []
    n = len(spans)
    s = 1000000
    for t in sorted(census):
        d, c = census[t]
        s = s * (n - d) // n
        out.append((t, n, d, c, s))
        n -= d + c
    return out


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["ev_survival"]

    random.seed(47)
    fails = 0
    for trial in range(trials):
        n_users = random.randint(1, 20)
        rows = []
        eid = 0
        for _ in range(n_users):
            uid = random.randint(0, 400)
            # a cluster of activity days, some beyond the plant cutoff
            for _ in range(random.randint(1, 8)):
                eid += 1
                day = random.randint(0, 29)
                tsus = (EPOCH0 + day) * DAY_US + random.randint(0, DAY_US - 1)
                rows.append((eid, tsus, uid))
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT * FROM (VALUES " +
            ",".join(f"({e}, make_timestamp({t}), {u}, 'x', 1.0)"
                     for e, t, u in rows) +
            ") t(event_id, ts, user_id, event_type, value)")
        got = [tuple(map(int, r)) for r in con.sql(sql).fetchall()]
        want = ref_km(rows)
        if got != want:
            fails += 1
            print(f"MISMATCH trial {trial} (users={n_users})")
            print("  got ", got[:6])
            print("  want", want[:6])
        con.close()
    print(f"trials={trials} fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
