"""As-of join and range join: tie semantics, boundary inclusivity, and
partition isolation on small hand-built frames."""

import datetime as dt

from pyspark.sql import functions as F

from sketchlib.relational import asof_join, range_join


def _ts(sec):
    return dt.datetime(2024, 1, 1, 0, 0, sec)


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(10)), (3, 10, _ts(2)), (4, 20, _ts(7))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts(3), 100.0), (10, _ts(10), 200.0), (20, _ts(9), 300.0)],
        "user_id long, ts timestamp, value double")
    out = {r["event_id"]: r["value_asof"] for r in
           asof_join(left, right, ["user_id"], "ts", ["value"]).collect()}
    assert out[1] == 100.0       # latest right at ts<=5 is ts=3
    assert out[2] == 200.0       # tie: right at the SAME ts is visible
    assert out[3] is None        # nothing at or before ts=2
    assert out[4] is None        # partition isolation: user 20's right is at ts=9>7


def test_asof_partition_isolation(spark):
    left = spark.createDataFrame([(1, 1, _ts(50))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(2, _ts(1), 9.0)],
                                  "user_id long, ts timestamp, value double")
    (row,) = asof_join(left, right, ["user_id"], "ts", ["value"]).collect()
    assert row["value_asof"] is None  # other user's rows never leak


def test_range_join_boundaries(spark):
    left = spark.createDataFrame([(1, 7, _ts(30))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(7, _ts(s)) for s in (19, 20, 25, 30, 31)] + [(8, _ts(25))],
        "user_id long, ts timestamp")
    # window [-10s, 0s]: inclusive bounds 20..30, same user only
    got = sorted(r["r_ts"].second for r in
                 range_join(left, right, ["user_id"], "ts", "ts",
                            -10_000_000, 0).collect())
    assert got == [20, 25, 30]


def _random_events(rng, n, n_users, sec_range):
    return [(i, int(rng.integers(1, n_users + 1)),
             _ts(0) + dt.timedelta(seconds=float(rng.integers(0, sec_range))))
            for i in range(n)]


def test_asof_matches_bruteforce_random(spark):
    """Randomized cross-check vs a trivial O(n^2) python reference."""
    import numpy as np

    rng = np.random.default_rng(123)
    lrows = _random_events(rng, 150, 6, 500)
    rrows = [(u, t, float(i)) for i, (_, u, t) in
             enumerate(_random_events(rng, 80, 6, 500))]
    # dedupe right on (user, ts) keeping max value — ties must be
    # well-defined for both implementations
    best = {}
    for u, t, v in rrows:
        best[(u, t)] = max(best.get((u, t), -1.0), v)
    rrows = [(u, t, v) for (u, t), v in best.items()]

    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(rrows, "user_id long, ts timestamp, value double")
    got = {r["event_id"]: r["value_asof"] for r in
           asof_join(left, right, ["user_id"], "ts", ["value"]).collect()}

    for eid, u, t in lrows:
        cands = [(rt, v) for (ru, rt, v) in rrows if ru == u and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[eid] == want, (eid, got[eid], want)


def test_range_join_matches_bruteforce_random(spark):
    import numpy as np

    rng = np.random.default_rng(321)
    lrows = _random_events(rng, 100, 4, 400)
    rrows = _random_events(rng, 120, 4, 400)
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(u, t) for _, u, t in rrows],
                                  "user_id long, ts timestamp")
    lo, hi = -30_000_000, 45_000_000  # [-30s, +45s]
    pairs = range_join(left, right, ["user_id"], "ts", "ts", lo, hi)
    got = sorted((r["event_id"], r["r_ts"]) for r in pairs.collect())

    want = sorted(
        (eid, rt) for eid, lu, lt in lrows for _, ru, rt in rrows
        if lu == ru and lo <= (rt - lt).total_seconds() * 1e6 <= hi)
    assert got == want


def test_sessionize_matches_bruteforce_random(spark):
    import numpy as np

    from sketchlib.relational import sessionize

    rng = np.random.default_rng(777)
    rows = _random_events(rng, 200, 5, 20_000)
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    gap = 600  # 10 minutes
    got = {r["event_id"]: r["session_id"] for r in
           sessionize(df, ["user_id"], "ts", gap,
                      order_tiebreak=["event_id"]).collect()}

    by_user: dict = {}
    for eid, u, t in rows:
        by_user.setdefault(u, []).append((t, eid))
    for u, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for t, eid in evs:
            if prev is None or (t - prev).total_seconds() > gap:
                sid += 1
            prev = t
            assert got[eid] == sid, (u, eid, got[eid], sid)


def test_range_join_crosses_bucket_edges(spark):
    """Pairs must be found even when left and right land in different
    width-sized buckets (the explode covers adjacent buckets)."""
    left = spark.createDataFrame(
        [(i, 1, _ts(i)) for i in range(10, 50, 7)],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(s)) for s in range(0, 59)],
        "user_id long, ts timestamp")
    out = range_join(left, right, ["user_id"], "ts", "ts",
                     -5_000_000, 5_000_000)
    counts = {r["event_id"]: r["c"] for r in
              out.groupBy("event_id").agg(F.count("*").alias("c")).collect()}
    # every (interior) left row has exactly 11 right rows in [-5s, +5s]
    assert all(c == 11 for c in counts.values()) and len(counts) == 6
