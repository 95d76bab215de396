#!/usr/bin/env python3
"""Fuzz the SHIPPED ev_ewma / ev_scd2 / ev_rfm oracle SQL against
independent Python references on adversarial event logs: equal
timestamps (tie-breaks), single-event users, long alternating runs
(SCD2), negative/zero values, and quartile boundaries at user counts
not divisible by 4.

The oracles read an `events(event_id, ts TIMESTAMP, user_id,
event_type, value)` table; the harness materializes one per trial.

Usage: python3 scripts/fuzz_event_oracles.py <verifyOutDir> [trials]
"""
import json
import random
import sys

import duckdb

DAY_NS = 86400 * 1000**3


def ref_ewma(rows, alpha=0.25):
    by_user = {}
    for eid, tsus, uid, et, val in sorted(rows, key=lambda r: (r[1], r[0])):
        by_user.setdefault(uid, []).append(val)
    out = {}
    for uid, vals in by_user.items():
        e = vals[0]
        for x in vals[1:]:
            e = alpha * x + (1.0 - alpha) * e
        out[uid] = (len(vals), vals[-1], e)
    return out


def ref_holt(rows, alpha=0.5, beta=0.25):
    by_user = {}
    for eid, tsus, uid, et, val in sorted(rows, key=lambda r: (r[1], r[0])):
        by_user.setdefault(uid, []).append(val)
    out = {}
    for uid, vals in by_user.items():
        l, b = vals[0], 0.0
        for x in vals[1:]:
            l1 = alpha * x + (1.0 - alpha) * (l + b)
            b = beta * (l1 - l) + (1.0 - beta) * b
            l = l1
        out[uid] = (len(vals), l, b, l + b)
    return out


def ref_scd2(rows):
    by_user = {}
    for eid, tsus, uid, et, val in sorted(rows, key=lambda r: (r[1], r[0])):
        by_user.setdefault(uid, []).append((tsus, et))
    out = set()
    for uid, evs in by_user.items():
        runs = []
        for tsus, et in evs:
            if not runs or runs[-1][1] != et:
                runs.append([tsus, et])
        for i, (start, et) in enumerate(runs):
            end = runs[i + 1][0] if i + 1 < len(runs) else None
            out.add((uid, i + 1, et, start, end))
    return out


def ref_rfm(rows):
    per = {}
    for eid, tsus, uid, et, val in rows:
        n, last, tot = per.get(uid, (0, 0, 0.0))
        per[uid] = (n + 1, max(last, tsus), tot)
    # monetary via exact decimal sum like the oracle's DECIMAL chain
    from decimal import Decimal
    mon = {}
    for eid, tsus, uid, et, val in rows:
        mon[uid] = mon.get(uid, Decimal(0)) + Decimal(str(val)).quantize(
            Decimal("0.000001"))
    max_ts = max(p[1] for p in per.values())
    nu = len(per)
    base = {u: ((max_ts - p[1]) * 1000 // DAY_NS, p[0], float(mon[u]))
            for u, p in per.items()}

    def quart(order):
        ranked = sorted(base, key=order)
        return {u: (i * 4) // nu + 1 for i, u in enumerate(ranked)}

    rq = quart(lambda u: (base[u][0], u))
    fq = quart(lambda u: (-base[u][1], u))
    mq = quart(lambda u: (-base[u][2], u))
    return {u: (base[u][0], base[u][1], base[u][2],
                rq[u], fq[u], mq[u], rq[u] * 100 + fq[u] * 10 + mq[u])
            for u in base}


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

    random.seed(31)
    fails = 0
    for trial in range(trials):
        n_users = random.randint(1, 13)
        rows = []
        eid = 0
        # uids are multiples of 10 so EVERY user sits inside the
        # ev_scd2 gate's user_id % 10 = 0 slice (ids 1..n would leave
        # the scd2 check vacuous on most trials)
        for uid in range(10, (n_users + 1) * 10, 10):
            for _ in range(random.randint(1, 12)):
                eid += 1
                # microsecond timestamps; deliberate tie collisions
                tsus = random.randint(0, 5) * DAY_NS // 1000 \
                    + random.choice([0, 1, 1, 2]) * 1000
                rows.append((eid, tsus, uid,
                             random.choice(["a", "b", "c"]),
                             round(random.uniform(-5, 50), 3)))
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT * FROM (VALUES " +
            ",".join(f"({e}, make_timestamp({t}), {u}, '{et}', "
                     f"CAST({v!r} AS DOUBLE))"
                     for e, t, u, et, v in rows) +
            ") t(event_id, ts, user_id, event_type, value)")

        got_e = {r[0]: (r[1], r[2], r[3])
                 for r in con.sql(oracles["ev_ewma"]).fetchall()}
        want_e = ref_ewma(rows)
        # DuckDB returns NAIVE datetimes; .timestamp() would apply the
        # HOST timezone — pin to UTC so epochs compare on any machine
        from datetime import timezone

        def us(dt):
            return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1e6)

        got_s = {(r[0], r[1], r[2], us(r[3]), us(r[4]) if r[4] else None)
                 for r in con.sql(oracles["ev_scd2"]).fetchall()}
        want_s = ref_scd2([r for r in rows if r[2] % 10 == 0])
        got_r = {r[0]: tuple(r[1:]) for r in con.sql(oracles["ev_rfm"]).fetchall()}
        want_r = ref_rfm(rows)
        # holt gates on user_id % 3 = 1 (uid 10, 40, ... here)
        got_h = {r[0]: (r[1], r[2], r[3], r[4])
                 for r in con.sql(oracles["ev_holt"]).fetchall()}
        want_h = ref_holt([r for r in rows if r[2] % 3 == 1])
        ok = (got_e == want_e and got_s == want_s and got_r == want_r
              and got_h == want_h)
        if not ok:
            fails += 1
            print(f"MISMATCH trial {trial} (users={n_users}, rows={len(rows)})")
            for nm, g, w in [("ewma", got_e, want_e), ("rfm", got_r, want_r),
                             ("holt", got_h, want_h)]:
                if g != w:
                    ks = [k for k in set(g) | set(w) if g.get(k) != w.get(k)]
                    print(f"  {nm} diff {ks[:3]}: got "
                          f"{[g.get(k) for k in ks[:3]]} want "
                          f"{[w.get(k) for k in ks[:3]]}")
            if got_s != want_s:
                print(f"  scd2 got-want {sorted(got_s - want_s)[:3]} "
                      f"want-got {sorted(want_s - got_s)[:3]}")
    print(f"trials={trials} fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
