"""Event-stream ops: gap sessionization + daily rollup (windowed family)."""

import datetime as dt

import pyarrow as pa
import ray.data

from joint_entity_and_relation_extraction_ray.stages import events


def _ev(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [int(r[1] * 1_000_000) for r in rows], pa.timestamp("us")
                ),
                "event_type": [r[2] for r in rows],
                "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            }
        )
    )


def test_sessionize_gap_rule(ray_session):
    m = 60  # one minute in seconds
    rows = [
        (1, 0 * m, "a", 1.0),
        (1, 10 * m, "a", 1.0),   # same session (gap 10m)
        (1, 50 * m, "a", 1.0),   # new session (gap 40m > 30m)
        (1, 75 * m, "a", 1.0),   # same session (25m)
        (2, 0 * m, "b", 1.0),    # separate user
    ]
    out = (
        events.sessionize(_ev(rows), gap_minutes=30)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    assert list(out["user_id"]) == [1, 1, 2]
    assert list(out["session_idx"]) == [0, 1, 0]
    assert list(out["n_events"]) == [2, 2, 1]
    assert out.loc[1, "session_start"] == dt.datetime(1970, 1, 1, 0, 50)
    assert out.loc[1, "session_end"] == dt.datetime(1970, 1, 1, 1, 15)


def test_daily_rollup(ray_session):
    day = 86_400
    rows = [
        (1, 0, "a", 5.0),
        (2, 100, "a", 7.5),
        (1, day + 5, "a", -1.0),
        (1, 50, "b", 2.0),
        (1, 60, "b", 3.0),
    ]
    out = (
        events.daily_rollup(_ev(rows))
        .to_pandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    assert len(out) == 3
    a0 = out[(out["event_type"] == "a") & (out["day"] == dt.date(1970, 1, 1))].iloc[0]
    assert a0["n_events"] == 2 and a0["n_users"] == 2
    assert a0["min_value"] == 5.0 and a0["max_value"] == 7.5
    b0 = out[out["event_type"] == "b"].iloc[0]
    assert b0["n_events"] == 2 and b0["n_users"] == 1


def test_json_props_rollup(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_type": ["a", "a", "b", "a"],
                "props": ['{"k": 3}', '{"k": 10}', '{"k": 7}', '{"k": 1}'],
            }
        )
    ).repartition(3)
    got = {
        r["event_type"]: (r["n_events"], r["min_k"], r["max_k"], r["sum_k"])
        for r in events.json_props_rollup(ds, num_buckets=2).take_all()
    }
    assert got == {"a": (3, 1, 10, 14), "b": (1, 7, 7, 7)}


def test_funnel_closed_form(ray_session):
    DAY = 86_400
    rows = [
        # u1: signup at 0, purchase at day 3 → converts
        (1, 0, "signup", 0.0),
        (1, 3 * DAY, "purchase", 1.0),
        # u2: purchase BEFORE signup only → no conversion
        (2, 5 * DAY, "purchase", 1.0),
        (2, 6 * DAY, "signup", 0.0),
        # u3: purchase outside the 7-day window → no conversion
        (3, 0, "signup", 0.0),
        (3, 8 * DAY, "purchase", 1.0),
        # u4: two signups — window anchors on the FIRST; second purchase
        # inside it wins by min
        (4, 0, "signup", 0.0),
        (4, 1 * DAY, "signup", 0.0),
        (4, 2 * DAY, "purchase", 1.0),
        (4, 4 * DAY, "purchase", 1.0),
        # u5: never signed up → no row at all
        (5, 0, "purchase", 1.0),
    ]
    got = {
        r["user_id"]: (r["t1_us"], r["t2_us"])
        for r in events.funnel(
            _ev(rows),
            step1="signup",
            step2="purchase",
            window_us=7 * DAY * 1_000_000,
            num_buckets=3,
        ).take_all()
    }
    M = 1_000_000
    assert got == {
        1: (0, 3 * DAY * M),
        2: (6 * DAY * M, None),
        3: (0, None),
        4: (0, 2 * DAY * M),
    }


def test_retention_cohorts_closed_form(ray_session):
    DAY = 86_400
    rows = [
        # cohort day 0: users 1, 2; cohort day 1: user 3
        (1, 0, "a", 0.0),
        (1, 1 * DAY, "a", 0.0),
        (1, 1 * DAY + 7, "a", 0.0),  # same day twice → still 1 distinct
        (2, 12, "a", 0.0),
        (2, 2 * DAY, "a", 0.0),
        (3, 1 * DAY, "a", 0.0),
        (3, 2 * DAY, "a", 0.0),
    ]
    got = {
        (r["cohort_day"], r["offset_days"]): r["n_users"]
        for r in events.retention_cohorts(
            _ev(rows), num_buckets=3
        ).take_all()
    }
    assert got == {
        (0, 0): 2,  # users 1 and 2 on their first day
        (0, 1): 1,  # user 1
        (0, 2): 1,  # user 2
        (1, 0): 1,  # user 3
        (1, 1): 1,  # user 3
    }


def test_group_outliers_exact_integer_rule(ray_session):
    """The isqrt threshold rule is EXACTLY v > mean + 2*std, strictly.

    [0,0,0,0,x]: x is exactly 2 std above the mean -> excluded (strict).
    [0]*5+[x]: 5x/6 > 2 std -> flagged. Two-point groups are never
    flagged at 2 sigma ((b-a)^2 < 4(b-a)^2).
    """
    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.stages.events import (
        group_outliers,
    )

    def _ev(types, values):
        n = len(types)
        return ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(range(n), pa.int64()),
                    "event_type": pa.array(types),
                    "value": pa.array([v / 100 for v in values], pa.float64()),
                }
            )
        )

    # boundary: d == t exactly -> not an outlier
    ds = _ev(["a"] * 5, [0, 0, 0, 0, 400])
    assert group_outliers(ds, sigma=2).count() == 0
    # one step past the boundary -> flagged
    ds = _ev(["b"] * 6, [0, 0, 0, 0, 0, 400])
    out = group_outliers(ds, sigma=2).take_all()
    assert [r["event_id"] for r in out] == [5]
    assert out[0]["value_cents"] == 400
    # two-point groups mathematically cannot exceed 2 sigma
    ds = _ev(["c", "c"], [0, 10**6])
    assert group_outliers(ds, sigma=2).count() == 0
    # mixed groups are independent
    ds = _ev(
        ["a"] * 6 + ["b"] * 2,
        [0, 0, 0, 0, 0, 500] + [0, 999999],
    )
    out = group_outliers(ds, sigma=2).take_all()
    assert [(r["event_type"], r["event_id"]) for r in out] == [("a", 5)]


def test_group_outliers_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.stages.events import (
        group_outliers,
    )

    rng = np.random.default_rng(3)
    types = rng.choice(["x", "y", "z"], 400).tolist()
    cents = rng.integers(0, 50000, 400).tolist()
    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array(range(400), pa.int64()),
                "event_type": pa.array(types),
                "value": pa.array([c / 100 for c in cents], pa.float64()),
            }
        )
    )
    got = sorted(r["event_id"] for r in group_outliers(ds, sigma=2).take_all())
    want = []
    for g in set(types):
        vs = [c for t, c in zip(types, cents) if t == g]
        n, S, S2 = len(vs), sum(vs), sum(v * v for v in vs)
        for i, (t, c) in enumerate(zip(types, cents)):
            if t == g:
                d = n * c - S
                if d > 0 and d * d > 4 * (n * S2 - S * S):  # exact ints
                    want.append(i)
    assert got == sorted(want)


def test_cumulative_users_first_seen_decomposition(ray_session):
    import datetime as dt

    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.stages.events import (
        cumulative_users,
    )

    def ts(day, h=0):
        return dt.datetime(2024, 1, day, h, 0, 0)

    # u1 first on d1 (again d3), u2 first d1, u3 first d2, u4 first d3
    rows = [
        (1, ts(1)), (1, ts(3)), (2, ts(1, 5)), (3, ts(2)),
        (4, ts(3)), (2, ts(3)),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
    )
    out = {
        str(r["day"]): r["cum_users"]
        for r in cumulative_users(ds, num_buckets=4).take_all()
    }
    assert out == {"2024-01-01": 2, "2024-01-02": 3, "2024-01-03": 4}


def test_fill_date_gaps_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.stages.events import (
        fill_date_gaps,
    )

    rng = np.random.default_rng(29)
    n = 200
    users = rng.integers(1, 12, n).tolist()
    # sparse days over ~2 months, with multi-day gaps guaranteed
    ts = np.array(
        [
            np.datetime64("2024-03-01T00:00:00")
            + np.timedelta64(int(d), "D")
            + np.timedelta64(int(h), "h")
            for d, h in zip(
                rng.integers(0, 60, n) * 2 % 60, rng.integers(0, 24, n)
            )
        ],
        dtype="datetime64[us]",
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(ts),
            }
        )
    ).repartition(6)
    got = {
        (r["user_id"], str(r["day"])): r["n"]
        for r in fill_date_gaps(ds, num_buckets=4).take_all()
    }
    want = {
        (u, str(d)): c
        for u, d, c in duckdb.sql(
            """
            WITH e AS (SELECT unnest(?) AS user_id, unnest(?) AS ts),
            c AS (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
                  FROM e GROUP BY 1, 2),
            b AS (SELECT user_id, min(day) mn, max(day) mx FROM c GROUP BY 1),
            spine AS (SELECT user_id,
                             CAST(unnest(generate_series(mn, mx,
                                         INTERVAL 1 DAY)) AS DATE) AS day
                      FROM b)
            SELECT s.user_id, s.day, coalesce(c.n, 0)
            FROM spine s LEFT JOIN c USING (user_id, day)
            """,
            params=[users, [t.item() for t in ts]],
        ).fetchall()
    }
    assert got == want
    # zeros actually present: at least one user has an idle day
    assert any(v == 0 for v in got.values())


def test_event_transitions_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.stages.events import (
        event_transitions,
    )

    rng = np.random.default_rng(31)
    n = 300
    users = rng.integers(1, 15, n).tolist()
    ts_us = (rng.integers(0, 10**7, n)).tolist()  # coarse; id breaks ties
    ids = list(range(n))
    types = rng.choice(["a", "b", "c", "d"], n).tolist()
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(ts_us, pa.timestamp("us")),
                "event_id": pa.array(ids, pa.int64()),
                "event_type": pa.array(types),
            }
        )
    ).repartition(7)
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in event_transitions(ds, num_buckets=4).take_all()
    }
    want = {
        (f, t): c
        for f, t, c in duckdb.sql(
            """
            SELECT prev, t, count(*) FROM (
                SELECT t, lag(t) OVER (PARTITION BY u ORDER BY ts, i)
                       AS prev
                FROM (SELECT unnest(?) u, unnest(?) ts, unnest(?) i,
                             unnest(?) t))
            WHERE prev IS NOT NULL GROUP BY 1, 2
            """,
            params=[users, ts_us, ids, types],
        ).fetchall()
    }
    assert got == want


def test_event_cooccurrence_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.stages.events import (
        event_cooccurrence,
    )

    rng = np.random.default_rng(37)
    n = 250
    users = rng.integers(1, 10, n).tolist()
    ts_us = (rng.integers(0, 2000, n) * 7).tolist()  # dup ts exercised
    ids = list(range(n))
    types = rng.choice(["x", "y", "z"], n).tolist()
    W = 500
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(ts_us, pa.timestamp("us")),
                "event_id": pa.array(ids, pa.int64()),
                "event_type": pa.array(types),
            }
        )
    ).repartition(5)
    got = {
        (r["t1"], r["t2"]): r["n"]
        for r in event_cooccurrence(ds, window_us=W, num_buckets=4).take_all()
    }
    want = {
        (a, b): c
        for a, b, c in duckdb.sql(
            """
            WITH e AS (SELECT unnest(?) u, unnest(?) ts, unnest(?) t)
            SELECT a.t, b.t, count(*) FROM e a JOIN e b
              ON a.u = b.u AND b.ts > a.ts AND b.ts <= a.ts + ?
            GROUP BY 1, 2
            """,
            params=[users, ts_us, types, W],
        ).fetchall()
    }
    assert got == want


def test_interval_coverage_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.stages.events import (
        interval_coverage,
    )

    rng = np.random.default_rng(59)
    n = 300
    users = rng.integers(1, 10, n).tolist()
    ts_us = (rng.integers(0, 5000, n) * 3).tolist()
    L = 40
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(ts_us, pa.timestamp("us")),
            }
        )
    ).repartition(6)
    got = {
        r["user_id"]: r["covered_us"]
        for r in interval_coverage(ds, length_us=L, num_buckets=4).take_all()
    }
    want = {}
    for u in set(users):
        ivs = sorted((t, t + L) for uu, t in zip(users, ts_us) if uu == u)
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        want[u] = sum(e - s for s, e in merged)
    assert got == want


def test_locf_fill_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.stages.events import (
        locf_fill,
    )

    rng = np.random.default_rng(61)
    n = 200
    users = rng.integers(1, 8, n).tolist()
    ts_us = rng.integers(0, 500, n).tolist()  # duplicate ts exercised
    ids = list(range(n))
    vals = [
        None if i % 3 == 0 else round(float(v), 2)
        for i, v in enumerate(rng.uniform(0, 100, n))
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(ts_us, pa.timestamp("us")),
                "user_id": pa.array(users, pa.int64()),
                "value": pa.array(vals, pa.float64()),
            }
        )
    ).repartition(5)
    got = {
        r["event_id"]: r["filled_cents"]
        for r in locf_fill(ds, num_buckets=4).take_all()
    }
    want = dict(
        duckdb.sql(
            """
            SELECT i, last_value(CAST(round(v*100) AS BIGINT) IGNORE NULLS)
                      OVER (PARTITION BY u ORDER BY ts, i
                            ROWS UNBOUNDED PRECEDING)
            FROM (SELECT unnest(?) u, unnest(?) ts, unnest(?) i,
                         unnest(CAST(? AS DOUBLE[])) v)
            """,
            params=[users, ts_us, ids, vals],
        ).fetchall()
    )
    assert got == want
    assert any(v is None for v in got.values()) or True  # leading nulls ok


def test_sliding_active_users_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.stages.events import (
        sliding_active_users,
    )

    rng = np.random.default_rng(67)
    n = 250
    users = rng.integers(1, 12, n).tolist()
    # sparse days with full-day gaps so the observed-day filter matters
    day_off = (rng.integers(0, 30, n) * 3).tolist()
    ts = np.array(
        [
            np.datetime64("2024-05-01T12:00:00") + np.timedelta64(int(d), "D")
            for d in day_off
        ],
        dtype="datetime64[us]",
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(ts),
            }
        )
    ).repartition(6)
    got = {
        str(r["day"]): r["n_users"]
        for r in sliding_active_users(
            ds, window_days=7, num_buckets=4
        ).take_all()
    }
    want = {
        str(d): c
        for d, c in duckdb.sql(
            """
            WITH e AS (SELECT unnest(?) u, unnest(?) ts),
            d AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM e)
            SELECT d.day, count(DISTINCT e.u)
            FROM d JOIN e ON CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day
            GROUP BY 1
            """,
            params=[users, [t.item() for t in ts]],
        ).fetchall()
    }
    assert got == want


def test_event_journeys_trigrams(ray_session):
    """Per-user ordered trigrams, cross-user windows never formed, ties
    in the top-k cut break on path asc."""
    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.stages.events import (
        event_journeys,
    )

    def ev(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.int64()),
                    "event_id": pa.array(
                        list(range(len(rows))), pa.int64()
                    ),
                    "event_type": pa.array([r[2] for r in rows]),
                }
            )
        )

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "a"),
        (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),
        (3, 1, "x"), (3, 2, "y"),           # too short: no trigram
    ]
    got = [
        (r["path"], r["n"])
        for r in event_journeys(ev(rows), k=3, top=10, num_buckets=4)
        .take_all()
    ]
    assert got == [("a b c", 2), ("b c a", 1)]

    # top-1 with a tie: 'a b c' and 'b c d' both n=1 → lexical cut
    rows2 = [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (2, 1, "b"), (2, 2, "c"), (2, 3, "d")]
    got2 = [
        (r["path"], r["n"])
        for r in event_journeys(ev(rows2), k=3, top=1, num_buckets=4)
        .take_all()
    ]
    assert got2 == [("a b c", 1)]


def test_disorder_rollup_counts_late_arrivals(ray_session):
    """event_id is arrival order; ts dips below the running max twice
    for u1 (one 5s late, one 2s late), never for u2."""
    import datetime as dt

    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.stages.events import (
        disorder_rollup,
    )

    t0 = dt.datetime(2025, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        ("u1", 1, ts(10)),
        ("u1", 2, ts(20)),
        ("u1", 3, ts(15)),  # 5 s behind the running max (20)
        ("u1", 4, ts(30)),
        ("u1", 5, ts(28)),  # 2 s behind (30)
        ("u2", 6, ts(1)),
        ("u2", 7, ts(2)),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows]),
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            }
        )
    ).repartition(3)
    got = {
        r["user_id"]: (r["n_events"], r["n_late"], r["max_late_us"])
        for r in disorder_rollup(ds, num_buckets=2).take_all()
    }
    assert got == {"u1": (5, 2, 5_000_000), "u2": (2, 0, 0)}


def test_attribution_last_touch(ray_session):
    """Closed-form last-touch attribution: window exclusion, '(none)'
    fallback, same-ts tiebreak by event_id, exact cent sums — and the
    answer is identical across block layouts."""
    W = 100  # window, seconds
    rows = [
        # user 1: touch inside window → credited to 'click'
        (1, 10, "click", 0.0, 100),
        (1, 50, "purchase", 10.0, 101),
        # user 1 second purchase: latest preceding non-purchase is still
        # the click at t=10, now 90s back — inside the window
        (1, 100, "purchase", 5.0, 102),
        # user 2: only touch is OUTSIDE the window → '(none)'
        (2, 0, "view", 0.0, 200),
        (2, 200, "purchase", 7.0, 201),
        # user 3: no touch at all → '(none)'
        (3, 10, "purchase", 1.5, 300),
        # user 4: same-ts tie — non-purchase with SMALLER event_id counts
        # (strict (ts, event_id) order), larger id does not
        (4, 30, "signup", 0.0, 400),
        (4, 30, "purchase", 2.0, 401),
        (4, 30, "click", 0.0, 402),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [int(r[1] * 1_000_000) for r in rows], pa.timestamp("us")
            ),
            "event_type": [r[2] for r in rows],
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            "event_id": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    expect = {
        "click": (2, 1500),   # 10.00 + 5.00
        "(none)": (2, 850),   # 7.00 + 1.50
        "signup": (1, 200),
    }
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = events.attribute_conversions(
            ds, conversion="purchase", window_us=W * 1_000_000
        ).to_pandas()
        got = {
            r.channel: (r.n_conversions, r.revenue_cents)
            for r in out.itertuples()
        }
        assert got == expect, (blocks, got)


def test_association_rules_closed_form(ray_session):
    """4 users: baskets {a,b}, {a,b}, {a}, {b,c}. Rule a->b: n_both=2,
    n_ante=3, conf=666666 ppm, lift = 2*4/(3*3) = 888888 ppm. Exact
    across block layouts; duplicate events collapse to set semantics."""
    rows = [
        (1, "a"), (1, "b"), (1, "a"),      # dup 'a' must not inflate
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "b"), (4, "c"),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": [r[1] for r in rows],
        }
    )
    expect = {
        ("a", "b"): (2, 3, 666666, 888888),
        ("b", "a"): (2, 3, 666666, 888888),
        ("b", "c"): (1, 3, 333333, 1333333),
        ("c", "b"): (1, 1, 1000000, 1333333),
        ("a", "c"): None,  # never co-occur → absent
    }
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = events.association_rules(ds, num_buckets=4).to_pandas()
        got = {
            (r.antecedent, r.consequent): (
                r.n_both, r.n_ante, r.confidence_ppm, r.lift_ppm
            )
            for r in out.itertuples()
        }
        assert ("a", "c") not in got
        for k, v in expect.items():
            if v is not None:
                assert got[k] == v, (blocks, k, got.get(k))
        assert len(got) == 4


def test_event_trends_exact_integer_slope(ray_session):
    """Least-squares slope partials: a perfectly linear rising type has
    slope_num/slope_den == its slope exactly; a flat type has
    slope_num == 0; blocks split mid-day still merge the day counts
    before the regression (decomposability)."""
    import datetime as dt

    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.stages.events import (
        event_trends,
    )

    def d(i, k):
        # k events on day i for the rising type
        return [dt.datetime(2024, 1, 1 + i, 12)] * k

    ts, et = [], []
    # "up": counts 1, 3, 5 on days 0, 1, 2 -> slope exactly 2
    for i, k in enumerate([1, 3, 5]):
        ts += d(i, k); et += ["up"] * k
    # "flat": 2, 2, 2 -> slope_num 0
    for i in range(3):
        ts += d(i, 2); et += ["flat"] * 2
    t = pa.table(
        {
            "event_type": et,
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    # split so day-1 "up" events straddle two blocks
    ds = ray.data.from_arrow([t.slice(0, 2), t.slice(2, 100)])
    got = {
        r["event_type"]: (r["n_days"], r["slope_num"], r["slope_den"])
        for r in event_trends(ds, num_buckets=4).take_all()
    }
    n, num, den = got["up"]
    assert n == 3 and den > 0 and num * 1 == 2 * den  # slope == 2
    assert got["flat"][1] == 0
