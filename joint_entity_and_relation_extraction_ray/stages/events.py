"""Event-stream operators over the driver's `events` table — the
windowed / sessionized-aggregate family (SURVEY.md §2.2 "streaming
semantics"; batch-with-streaming-execution, no watermarks needed).

Both operators are single-shuffle: events co-locate by key via the
split→reduce bucket shuffle and the window logic runs vectorized
(polars) inside each bucket. Gap-based sessionization is the canonical
op Ray Data has no primitive for — the documented partitioning
assumption is "one user's events fit in a reducer", the same assumption
every sessionizer makes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.shuffle import bucket_group_apply


def read_events(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def sessionize(
    events: ray.data.Dataset,
    *,
    gap_minutes: int = 30,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds `gap_minutes` → one row per (user_id,
    session_idx) with event count and start/end timestamps."""

    def _sess(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t).sort(["user_id", "ts"])
        gap = pl.duration(minutes=gap_minutes)
        df = df.with_columns(
            (
                (pl.col("ts") - pl.col("ts").shift(1).over("user_id")) > gap
            )
            .fill_null(False)
            .cast(pl.Int64)
            .cum_sum()
            .over("user_id")
            .alias("session_idx")
        )
        out = (
            df.group_by(["user_id", "session_idx"])
            .agg(
                pl.len().alias("n_events"),
                pl.col("ts").min().alias("session_start"),
                pl.col("ts").max().alias("session_end"),
            )
            .sort(["user_id", "session_idx"])
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("session_idx", pa.int64()),
                    ("n_events", pa.int64()),
                    ("session_start", pa.timestamp("us")),
                    ("session_end", pa.timestamp("us")),
                ]
            )
        )

    return bucket_group_apply(
        events.select_columns(["user_id", "ts"]),
        "user_id",
        _sess,
        num_buckets=num_buckets,
    )


def daily_rollup(
    events: ray.data.Dataset, *, num_buckets: int = 32
) -> ray.data.Dataset:
    """Per (event_type, day): event count, distinct users, value min/max.

    min/max are selections (bit-exact, oracle-safe) — a sum would be
    float-order-dependent across block layouts."""

    def _roll(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t.drop_columns(["_gkey"]))
        out = (
            df.with_columns(pl.col("ts").dt.date().alias("day"))
            .group_by(["event_type", "day"])
            .agg(
                pl.len().alias("n_events"),
                pl.col("user_id").n_unique().alias("n_users"),
                pl.col("value").min().alias("min_value"),
                pl.col("value").max().alias("max_value"),
            )
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("event_type", pa.string()),
                    ("day", pa.date32()),
                    ("n_events", pa.int64()),
                    ("n_users", pa.int64()),
                    ("min_value", pa.float64()),
                    ("max_value", pa.float64()),
                ]
            )
        )

    # partial per-block combine would miscount n_users (distinct is not
    # decomposable without sketches) so raw rows must shuffle — but the
    # bucket key is the COMPOSITE (event_type, day): event_type alone is
    # low-cardinality and one hot type would pin an entire type's raw rows
    # on a single reducer at scale. The epoch-day floor matches
    # ``dt.date()`` for any sign, so a (type, date) group never splits
    # across buckets.
    def _with_gkey(t: pa.Table) -> pa.Table:
        days = (
            t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        gkey = pc.binary_join_element_wise(
            t["event_type"].cast(pa.string()),
            pa.array(days.astype("U"), pa.string()),
            ":",
        )
        return t.append_column("_gkey", gkey)

    keyed = events.select_columns(
        ["event_type", "ts", "user_id", "value"]
    ).map_batches(_with_gkey, batch_format="pyarrow", zero_copy_batch=True)
    return bucket_group_apply(keyed, "_gkey", _roll, num_buckets=num_buckets)


def daily_rollup_approx(
    events: ray.data.Dataset, *, num_buckets: int = 32
) -> ray.data.Dataset:
    """Sketch-based daily rollup: identical shape to :func:`daily_rollup`
    but ``n_users`` is an HLL estimate (±~1.6%), which makes the whole
    aggregate DECOMPOSABLE — each block pre-aggregates to one partial row
    per (event_type, day) holding counts, min/max and a 4 KB register
    array, and the shuffle moves partials instead of raw rows. At 100 TB
    this is the difference between shipping every user id and shipping
    blocks × groups × 4 KB (driver brief: per-block combiner before the
    groupby; exact distinct is not decomposable without a sketch).
    """
    from ..functions.sketch import (
        hll_add,
        hll_count,
        hll_deserialize,
        hll_empty,
        hll_serialize,
    )

    def _partial(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "day": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "min_value": pa.array([], pa.float64()),
                    "max_value": pa.array([], pa.float64()),
                    "hll": pa.array([], pa.binary()),
                }
            )
        days = (
            t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        df = pl.from_arrow(
            pa.table(
                {
                    "event_type": t["event_type"],
                    "day": pa.array(days, pa.int64()),
                    "user_id": t["user_id"],
                    "value": t["value"],
                }
            )
        )
        grp = df.group_by(["event_type", "day"]).agg(
            pl.len().alias("n_events"),
            pl.col("value").min().alias("min_value"),
            pl.col("value").max().alias("max_value"),
            pl.col("user_id").alias("users"),
        )
        sketches = [
            hll_serialize(hll_add(hll_empty(), np.asarray(u)))
            for u in grp["users"].to_list()
        ]
        out = grp.drop("users").to_arrow()
        return out.append_column("hll", pa.array(sketches, pa.binary()))

    partials = events.select_columns(
        ["event_type", "ts", "user_id", "value"]
    ).map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)

    def _with_gkey(t: pa.Table) -> pa.Table:
        gkey = pc.binary_join_element_wise(
            t["event_type"].cast(pa.string()),
            pc.cast(t["day"], pa.string()),
            ":",
        )
        return t.append_column("_gkey", gkey)

    keyed = partials.map_batches(
        _with_gkey, batch_format="pyarrow", zero_copy_batch=True
    )

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "day": pa.array([], pa.date32()),
                    "n_events": pa.array([], pa.int64()),
                    "n_users_approx": pa.array([], pa.int64()),
                    "min_value": pa.array([], pa.float64()),
                    "max_value": pa.array([], pa.float64()),
                }
            )
        df = pl.from_arrow(t.drop_columns(["_gkey"]))
        grp = df.group_by(["event_type", "day"]).agg(
            pl.col("n_events").sum().alias("n_events"),
            pl.col("min_value").min().alias("min_value"),
            pl.col("max_value").max().alias("max_value"),
            pl.col("hll").alias("sketches"),
        )
        n_users = [
            hll_count(
                np.maximum.reduce([hll_deserialize(s) for s in sketches])
            )
            for sketches in grp["sketches"].to_list()
        ]
        out = grp.drop("sketches").with_columns(
            pl.Series("n_users_approx", n_users, dtype=pl.Int64),
            pl.from_epoch(pl.col("day"), time_unit="d").cast(pl.Date),
        )
        return out.select(
            ["event_type", "day", "n_events", "n_users_approx",
             "min_value", "max_value"]
        ).to_arrow().cast(
            pa.schema(
                [
                    ("event_type", pa.string()),
                    ("day", pa.date32()),
                    ("n_events", pa.int64()),
                    ("n_users_approx", pa.int64()),
                    ("min_value", pa.float64()),
                    ("max_value", pa.float64()),
                ]
            )
        )

    return bucket_group_apply(keyed, "_gkey", _merge, num_buckets=num_buckets)


def json_props_rollup(
    events: ray.data.Dataset, *, num_buckets: int = 8
) -> ray.data.Dataset:
    """Per event_type over the JSON ``props`` payload: count + min/max/sum
    of the integer ``$.k`` field (SURVEY.md §2.2 scalar functions — JSON
    extraction; integer aggregates so the DuckDB oracle compare is exact).

    Fully decomposable: each block parses JSON vectorized (polars
    json_path_match, no per-row Python) and collapses to one partial row
    per event_type; only partials shuffle.
    """

    def _partial(t: pa.Table) -> pa.Table:
        import polars as pl

        out_schema = pa.schema(
            [
                ("event_type", pa.string()),
                ("n_events", pa.int64()),
                ("min_k", pa.int64()),
                ("max_k", pa.int64()),
                ("sum_k", pa.int64()),
            ]
        )
        if not t.num_rows:
            return out_schema.empty_table()
        df = pl.from_arrow(t).with_columns(
            pl.col("props").str.json_path_match("$.k").cast(pl.Int64).alias("k")
        )
        out = df.group_by("event_type").agg(
            pl.len().cast(pl.Int64).alias("n_events"),
            pl.col("k").min().alias("min_k"),
            pl.col("k").max().alias("max_k"),
            pl.col("k").sum().alias("sum_k"),
        )
        return out.to_arrow().cast(out_schema)

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t)
        out = df.group_by("event_type").agg(
            pl.col("n_events").sum().alias("n_events"),
            pl.col("min_k").min().alias("min_k"),
            pl.col("max_k").max().alias("max_k"),
            pl.col("sum_k").sum().alias("sum_k"),
        )
        return out.to_arrow().cast(t.schema)

    partials = events.select_columns(["event_type", "props"]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucket_group_apply(
        partials, "event_type", _merge, num_buckets=num_buckets
    )


def gap_rollup(
    events: ray.data.Dataset,
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-user inter-event-gap rollup — the LAG window-function family
    (``ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)``) reduced to
    integer metrics: per user, the number of gaps and the sum / max gap
    in epoch microseconds.

    One user_id-bucketed shuffle co-locates each user's events; the
    per-bucket diff runs vectorized in polars on int64 epoch-us. With
    duplicate timestamps the sorted sequence is the same multiset under
    any tie order, so the gap multiset — hence every output — is
    deterministic. Users with a single event emit no row (no gaps),
    matching the SQL WHERE gap IS NOT NULL."""

    def _gaps(t: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(t)
            .with_columns(pl.col("ts").cast(pl.Int64).alias("us"))
            .sort(["user_id", "us"])
            .with_columns(
                (pl.col("us") - pl.col("us").shift(1).over("user_id")).alias(
                    "gap"
                )
            )
            .drop_nulls("gap")
        )
        out = (
            df.group_by("user_id")
            .agg(
                pl.len().cast(pl.Int64).alias("n_gaps"),
                pl.col("gap").sum().alias("sum_gap_us"),
                pl.col("gap").max().alias("max_gap_us"),
            )
        )
        return out.select(
            ["user_id", "n_gaps", "sum_gap_us", "max_gap_us"]
        ).to_arrow()

    return bucket_group_apply(
        events.select_columns(["user_id", "ts"]),
        "user_id",
        _gaps,
        num_buckets=num_buckets,
    )


def running_total(
    events: ray.data.Dataset,
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-row cumulative sum — the ``SUM(x) OVER (PARTITION BY user
    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)`` window shape:
    each event annotated with the user's running total of ``value`` in
    integer cents.

    ``event_id`` breaks timestamp ties so the per-row prefix sums are
    deterministic (a pure ``ORDER BY ts`` leaves equal-ts prefixes
    ambiguous). One user-bucketed shuffle; the cum-sum runs vectorized
    per bucket. Cents via round(value*100): exact on 2-decimal inputs,
    where the scaled double is never a representable .5 boundary, so
    every rounding mode agrees."""

    def _cum(t: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(t)
            .with_columns(
                (pl.col("value") * 100).round(0).cast(pl.Int64).alias("cents")
            )
            .sort(["user_id", "ts", "event_id"])
            .with_columns(
                pl.col("cents").cum_sum().over("user_id").alias(
                    "running_cents"
                )
            )
        )
        return df.select(["user_id", "event_id", "running_cents"]).to_arrow()

    return bucket_group_apply(
        events.select_columns(["user_id", "event_id", "ts", "value"]),
        "user_id",
        _cum,
        num_buckets=num_buckets,
    )


def funnel(
    events: ray.data.Dataset,
    *,
    step1: str,
    step2: str,
    window_us: int,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Two-step conversion funnel: per user who performed ``step1``, the
    epoch-us of their FIRST ``step1`` event (``t1_us``) and of the first
    ``step2`` event at-or-after it within ``window_us`` (``t2_us``,
    null = did not convert).

    One user-bucketed shuffle; all window logic is vectorized per bucket
    (min / filtered-min — deterministic under timestamp ties). This is
    the sessionize/gap_rollup partitioning assumption: one user's events
    fit in a reducer."""

    def _fun(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t).with_columns(
            pl.col("ts").cast(pl.Int64).alias("us")
        )
        s = (
            df.filter(pl.col("event_type") == step1)
            .group_by("user_id")
            .agg(pl.col("us").min().alias("t1_us"))
        )
        p = (
            df.filter(pl.col("event_type") == step2)
            .join(s, on="user_id")
            .filter(
                (pl.col("us") >= pl.col("t1_us"))
                & (pl.col("us") <= pl.col("t1_us") + window_us)
            )
            .group_by(["user_id", "t1_us"])
            .agg(pl.col("us").min().alias("t2_us"))
        )
        out = s.join(p, on=["user_id", "t1_us"], how="left")
        return out.select(["user_id", "t1_us", "t2_us"]).to_arrow().cast(
            pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("t1_us", pa.int64()),
                    ("t2_us", pa.int64()),
                ]
            )
        )

    return bucket_group_apply(
        events.select_columns(["user_id", "event_type", "ts"]),
        "user_id",
        _fun,
        num_buckets=num_buckets,
    )


def retention_cohorts(
    events: ray.data.Dataset,
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Cohort retention: users grouped by first-seen day (the cohort);
    for each (cohort_day, offset_days) the count of DISTINCT cohort
    users active that day. Days are integer days-since-epoch so the
    compare is timezone- and type-free.

    Exact distinct in ONE corpus shuffle: events bucket by user_id, so a
    user's whole history is in exactly one bucket — the per-bucket
    (cohort, offset) distinct-user counts are disjoint partials that
    merge by plain sum (the same argument as ngram_counts' n_docs). The
    shuffle ships (user_id, day) int pairs; the merge ships tiny
    (cohort, offset, n) partials."""

    def _day(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"].combine_chunks(), pa.int64())
        return pa.table(
            {
                "user_id": t["user_id"],
                "day": pc.divide(us, 86_400_000_000),
            }
        )

    days = events.select_columns(["user_id", "ts"]).map_batches(
        _day, batch_format="pyarrow", zero_copy_batch=True
    )

    def _partial(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t)
        first = df.group_by("user_id").agg(
            pl.col("day").min().alias("cohort_day")
        )
        act = (
            df.join(first, on="user_id")
            .select(
                pl.col("cohort_day"),
                (pl.col("day") - pl.col("cohort_day")).alias("offset_days"),
                pl.col("user_id"),
            )
            .unique()
        )
        return (
            act.group_by(["cohort_day", "offset_days"])
            .agg(pl.len().cast(pl.Int64).alias("n_users"))
            .to_arrow()
        )

    partials = bucket_group_apply(
        days, "user_id", _partial, num_buckets=num_buckets
    )

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t)
            .group_by(["cohort_day", "offset_days"])
            .agg(pl.col("n_users").sum())
            .to_arrow()
        )

    return bucket_group_apply(partials, "cohort_day", _merge, num_buckets=8)


def group_outliers(
    events: ray.data.Dataset,
    *,
    sigma: int = 2,
) -> ray.data.Dataset:
    """Per-group high outliers — events whose value sits strictly more
    than ``sigma`` standard deviations ABOVE their event_type's mean —
    in EXACT integer arithmetic (oracle-equal by construction).

    Two-pass decomposable shape: (1) per-block partial (n, Σv, Σv²) per
    group via :func:`grouped_summary` (one row per (block, group) moves;
    raw rows never shuffle); (2) the tiny per-group stats collect to the
    driver, fold into an integer threshold, broadcast, and the corpus
    streams through a vectorized filter — no second shuffle.

    Exactness without bignum in the hot path: for integer cents v,

        v > mean + sigma·std  ⟺  (n·v − S)² > sigma²·(n·Σv² − S²)
                              ⟺  n·v − S > isqrt(sigma²·(n·Σv² − S²))

    (integers: d > t where t = isqrt(rhs), since t² ≤ rhs < (t+1)²).
    The threshold t is computed ONCE per group in arbitrary-precision
    Python; the per-row test ``n·v − S > t`` is plain vectorized int64.
    Overflow bound: n·max(v) < 2⁶³ holds to ~10¹⁴ rows at 10⁵ cents;
    beyond that the partials widen to 128-bit (schema.stable_hash64's
    documented escalation), the shape is unchanged.
    """
    import math

    from .relational import grouped_summary

    def _prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "value_cents": cents,
                "cents2": pc.multiply(cents, cents),
            }
        )

    prep = events.select_columns(
        ["event_id", "event_type", "value"]
    ).map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)

    stats_rows = grouped_summary(
        prep,
        by=["event_type"],
        aggs={
            "n": ("value_cents", "count"),
            "sv": ("value_cents", "sum"),
            "sv2": ("cents2", "sum"),
        },
    ).take_all()  # one row per event_type — driver-small by contract
    thresholds = {}
    for r in stats_rows:
        n, sv, sv2 = int(r["n"]), int(r["sv"]), int(r["sv2"])
        rhs = sigma * sigma * (n * sv2 - sv * sv)  # ≥ 0 (Cauchy–Schwarz)
        thresholds[r["event_type"]] = (n, sv, math.isqrt(rhs))
    ref = ray.put(thresholds) if ray.is_initialized() else thresholds

    def _filt(t: pa.Table) -> pa.Table:
        th = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        et = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value_cents"].to_numpy(zero_copy_only=False)
        uq, inv = np.unique(et, return_inverse=True)
        trip = np.array([th[u] for u in uq], dtype=np.int64)[inv]
        keep = trip[:, 0] * v - trip[:, 1] > trip[:, 2]
        return t.select(["event_id", "event_type", "value_cents"]).filter(
            pa.array(keep)
        )

    return prep.map_batches(
        _filt, batch_format="pyarrow", zero_copy_batch=True
    )


def cumulative_users(
    events: ray.data.Dataset, *, num_buckets: int = 32
) -> ray.data.Dataset:
    """Cumulative DISTINCT users per day — exact, without ever holding a
    user set: cumulative distinct decomposes as "users whose FIRST day
    ≤ d". min-day per user is a decomposable aggregate (per-block
    (user, min day) partials → one user-bucketed min merge), the per-day
    new-user counts are day-cardinality-sized, and the running sum runs
    once over that tiny table. Raw events never shuffle; the only
    full-width exchange carries one row per (block, user)."""
    import polars as pl

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).with_columns(
            pl.col("ts").dt.date().alias("day")
        )
        return df.group_by("user_id").agg(pl.col("day").min()).to_arrow()

    parts = events.select_columns(["user_id", "ts"]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def _min_then_count(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        first = df.group_by("user_id").agg(pl.col("day").min())
        return (
            first.group_by("day")
            .agg(pl.len().cast(pl.Int64).alias("new_users"))
            .to_arrow()
        )

    per_day = bucket_group_apply(
        parts, "user_id", _min_then_count, num_buckets=num_buckets
    )
    # buckets partition users, so per-day new-user counts merge by sum;
    # the day table is driver-small by construction
    tbl = pa.concat_tables(
        [t for t in ray.get(per_day.to_arrow_refs()) if t.num_rows],
        promote_options="default",
    )
    import polars as pl2

    out = (
        pl2.from_arrow(tbl)
        .group_by("day")
        .agg(pl2.col("new_users").sum())
        .sort("day")
        .with_columns(
            pl2.col("new_users").cum_sum().cast(pl2.Int64).alias("cum_users")
        )
        .select(["day", "cum_users"])
    )
    return ray.data.from_arrow(out.to_arrow())


def fill_date_gaps(
    ds: ray.data.Dataset, *, by: str = "user_id", num_buckets: int = 32
) -> ray.data.Dataset:
    """Date-spine gap filling: each key's sparse daily event counts made
    DENSE from its first to its last active day, missing days as 0 —
    the resample/reindex step every per-entity time-series model needs
    before training. Rows ``(by, day:date32, n:int64)``.

    Decomposable: blocks reduce to (by, day, n) partials (the combiner),
    one ``by``-bucketed shuffle moves only those partials, and the dense
    spine is GENERATED inside the reducer (pl.int_ranges over epoch
    days + explode) — spine rows never cross the wire. Assumes one key's
    day span fits in a reducer (a few KB per entity-year)."""
    import polars as pl

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([by, "ts"]))
        return (
            df.with_columns(pl.col("ts").dt.date().alias("day"))
            .group_by([by, "day"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    def _dense(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        if df.height == 0:
            return pa.table(
                {
                    by: pa.array([], t.schema.field(by).type),
                    "day": pa.array([], pa.date32()),
                    "n": pa.array([], pa.int64()),
                }
            )
        sparse = (
            df.group_by([by, "day"])
            .agg(pl.col("n").sum())
            .with_columns(pl.col("day").cast(pl.Int32).alias("d"))
        )
        spine = (
            sparse.group_by(by)
            .agg(
                pl.col("d").min().alias("lo"),
                pl.col("d").max().alias("hi"),
            )
            .with_columns(
                pl.int_ranges(
                    pl.col("lo"), pl.col("hi") + 1, dtype=pl.Int32
                ).alias("d")
            )
            .explode("d")
            .select([by, "d"])
        )
        out = (
            spine.join(
                sparse.select([by, "d", "n"]), on=[by, "d"], how="left"
            )
            .with_columns(
                pl.col("n").fill_null(0),
                pl.col("d").cast(pl.Date).alias("day"),
            )
            .select([by, "day", "n"])
        )
        return out.to_arrow()

    partials = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucket_group_apply(partials, by, _dense, num_buckets=num_buckets)


def event_journeys(
    events: ray.data.Dataset,
    *,
    k: int = 3,
    top: int = 50,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Top user-journey k-grams: the ``top`` most common length-``k``
    windows of consecutive event types over each user's time-ordered
    stream — rows ``(path, n)``, path = space-joined types, ranked
    (n desc, path asc) so the cut is deterministic under ties. The
    sequence-pattern generalization of :func:`event_transitions`
    (bigrams); SQL mirror: chained ``lead() OVER (PARTITION BY user_id
    ORDER BY ts, event_id)``.

    One user-bucketed shuffle co-locates each user's events; per bucket
    a vectorized polars shift chain emits |types|^k-bounded partial
    counts, a tiny second shuffle merges, and only the bounded count
    table ever sorts — raw events shuffle once."""
    import polars as pl

    _PATH_SCHEMA = pa.schema([("path", pa.string()), ("n", pa.int64())])

    def _paths(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        cols = [pl.col("event_type")] + [
            pl.col("event_type").shift(-i).over("user_id")
            for i in range(1, k)
        ]
        out = (
            df.with_columns(path=pl.concat_str(cols, separator=" "))
            .drop_nulls("path")
            .group_by("path")
            .agg(pl.len().cast(pl.Int64).alias("n"))
        )
        return out.to_arrow().cast(_PATH_SCHEMA)

    def _merge(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by("path")
            .agg(pl.col("n").sum())
            .to_arrow()
            .cast(_PATH_SCHEMA)
        )

    per_user = bucket_group_apply(
        events.select_columns(["user_id", "ts", "event_id", "event_type"]),
        "user_id",
        _paths,
        num_buckets=num_buckets,
    )
    merged = bucket_group_apply(per_user, "path", _merge, num_buckets=4)
    return merged.sort(["n", "path"], descending=[True, False]).limit(top)


def event_transitions(
    events: ray.data.Dataset, *, num_buckets: int = 32
) -> ray.data.Dataset:
    """Markov transition counts over each user's time-ordered event
    sequence — rows ``(from_type, to_type, n)``: how often one event
    type immediately follows another (the bigram feature sequence models
    train on). SQL: ``lag(event_type) OVER (PARTITION BY user_id ORDER
    BY ts, event_id)`` + GROUP BY.

    One user-bucketed shuffle co-locates each user's events (the
    sequence floor); per bucket a vectorized polars shift produces
    |types|²-bounded partial counts, and a tiny second merge sums them —
    raw events never shuffle twice. (ts, event_id) is a total order, so
    the result is deterministic under timestamp ties."""
    import polars as pl

    def _trans(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        return (
            df.with_columns(
                from_type=pl.col("event_type").shift(1).over("user_id")
            )
            .drop_nulls("from_type")
            .group_by(["from_type", "event_type"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .rename({"event_type": "to_type"})
            .to_arrow()
        )

    def _merge(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by(["from_type", "to_type"])
            .agg(pl.col("n").sum())
            .to_arrow()
        )

    per_user = bucket_group_apply(
        events.select_columns(["user_id", "ts", "event_id", "event_type"]),
        "user_id",
        _trans,
        num_buckets=num_buckets,
    )
    return bucket_group_apply(per_user, "from_type", _merge, num_buckets=4)


def event_cooccurrence(
    events: ray.data.Dataset,
    *,
    window_us: int,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Temporal co-occurrence counts: for every ordered pair of events
    by the SAME user with ``0 < ts_b − ts_a ≤ window_us``, count per
    (t1, t2) type pair — the market-basket statistic over an event
    stream. SQL mirror: the band self-join.

    One user-bucketed shuffle; per user the sorted sweep finds each
    event's window with two ``searchsorted`` calls and the pair counts
    accumulate into a |types|² matrix via flat ``np.add.at`` — the pair
    LIST is never materialized (the band join's output can be quadratic;
    its COUNTS per type pair are bounded). Partial matrices merge in a
    tiny second shuffle."""
    import polars as pl

    def _cooc(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        if df.height == 0:
            return pa.table(
                {
                    "t1": pa.array([], pa.string()),
                    "t2": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        types, codes_s = np.unique(
            df["event_type"].to_numpy(), return_inverse=True
        )
        T = len(types)
        counts = np.zeros((T, T), dtype=np.int64)
        ts_all = df["ts"].cast(pl.Int64).to_numpy()
        uid = df["user_id"].to_numpy()
        bounds = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1], True])
        for s, e in zip(bounds[:-1], bounds[1:]):
            ts = ts_all[s:e]
            codes = codes_s[s:e]
            lo = np.searchsorted(ts, ts, side="right")
            hi = np.searchsorted(ts, ts + window_us, side="right")
            lens = hi - lo
            total = int(lens.sum())
            if total == 0:
                continue
            # flat [lo_i, hi_i) index ranges without a python loop
            starts = np.repeat(lo, lens)
            offs = np.arange(total) - np.repeat(
                np.cumsum(lens) - lens, lens
            )
            cols = codes[starts + offs]
            rows = np.repeat(codes, lens)
            np.add.at(counts.reshape(-1), rows * T + cols, 1)
        r, c = np.nonzero(counts)
        return pa.table(
            {
                "t1": pa.array(types[r], pa.string()),
                "t2": pa.array(types[c], pa.string()),
                "n": pa.array(counts[r, c], pa.int64()),
            }
        )

    def _merge(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by(["t1", "t2"])
            .agg(pl.col("n").sum())
            .to_arrow()
        )

    per_user = bucket_group_apply(
        events.select_columns(["user_id", "ts", "event_id", "event_type"]),
        "user_id",
        _cooc,
        num_buckets=num_buckets,
    )
    return bucket_group_apply(per_user, "t1", _merge, num_buckets=4)


def interval_coverage(
    events: ray.data.Dataset,
    *,
    length_us: int,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Union-of-intervals coverage per user: treat every event as an
    activity interval ``[ts, ts + length_us)``, merge overlaps, and
    report the total covered microseconds — the gaps-and-islands
    computation behind "active time" metrics (billing, engagement).
    Rows ``(user_id, covered_us:int64)``, exact integer arithmetic.

    One user-bucketed shuffle of (user_id, ts) only; per bucket the
    island detection is fully vectorized polars: an interval starts a
    new island iff its start exceeds the running max end of all earlier
    intervals (cum_max + shift), islands sum as max(end) − min(start)."""
    import polars as pl

    def _cov(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t.select(["user_id", "ts"]))
            .sort(["user_id", "ts"])
            .with_columns(s=pl.col("ts").cast(pl.Int64))
            .with_columns(e=pl.col("s") + length_us)
        )
        prev_max_e = pl.col("e").cum_max().shift(1).over("user_id")
        df = (
            df.with_columns(
                new=(pl.col("s") > prev_max_e)
                .fill_null(True)
                .cast(pl.Int64)
            )
            .with_columns(island=pl.col("new").cum_sum().over("user_id"))
        )
        return (
            df.group_by(["user_id", "island"])
            .agg((pl.col("e").max() - pl.col("s").min()).alias("cov"))
            .group_by("user_id")
            .agg(pl.col("cov").sum().alias("covered_us"))
            .to_arrow()
        )

    return bucket_group_apply(
        events.select_columns(["user_id", "ts"]),
        "user_id",
        _cov,
        num_buckets=num_buckets,
    )


def locf_fill(
    events: ray.data.Dataset,
    *,
    value_col: str = "value",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """LOCF (last observation carried forward): null measurements take
    the user's most recent non-null value in (ts, event_id) order — the
    standard sensor/metrics gap repair. SQL mirror: ``last_value(x
    IGNORE NULLS) OVER (PARTITION BY user ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING)``. Rows (event_id, filled_cents) — leading nulls stay
    null. Exact integer cents.

    One user-bucketed shuffle (the PARTITION BY floor); per bucket a
    vectorized polars sort + grouped forward_fill."""
    import polars as pl

    def _fill(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        return (
            df.with_columns(
                pl.col("cents").forward_fill().over("user_id")
                .alias("filled_cents")
            )
            .select(["event_id", "filled_cents"])
            .to_arrow()
        )

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "ts": t["ts"],
                "user_id": t["user_id"],
                "cents": pc.cast(
                    pc.round(pc.multiply(t[value_col], 100.0)), pa.int64()
                ),
            }
        )

    prep = events.select_columns(
        ["event_id", "ts", "user_id", value_col]
    ).map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    return bucket_group_apply(prep, "user_id", _fill, num_buckets=num_buckets)


def sliding_active_users(
    events: ray.data.Dataset,
    *,
    window_days: int = 7,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """EXACT trailing-window distinct users per day (the 7-day-active
    metric) with no day-level distinct anywhere: a user counts toward
    day D iff they were active in [D−w+1, D], i.e. each active day
    contributes a w-day coverage interval — merge each user's intervals
    (gaps-and-islands), explode the covered days, and the per-day counts
    are EXACT because user-bucketed reducers hold disjoint user sets
    (disjoint distincts sum). Rows (day:date32, n_users:int64), limited
    to days that actually appear in the stream.

    Shuffle payload: per-block DISTINCT (user, day) pairs, then one
    user-bucketed shuffle; the second shuffle moves per-(bucket, day)
    partial counts only. The observed-day floor is applied via a
    broadcast min/max from the same partials — no extra corpus pass."""
    import polars as pl

    def _pairs(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["user_id", "ts"]))
            .with_columns(
                pl.col("ts").dt.date().cast(pl.Int32).alias("d")
            )
            .select(["user_id", "d"])
            .unique()
            .to_arrow()
        )

    pairs = events.map_batches(
        _pairs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # observed-day SET (tiny: distinct calendar days), broadcast into the
    # reducers so uncovered-but-windowed days are dropped like the SQL
    from ..stages.relational import distinct_keys

    days = sorted(
        r["d"] for r in distinct_keys(pairs, "d", num_buckets=4).take_all()
    )
    lo, hi = days[0], days[-1]
    observed = np.zeros(hi - lo + 1, dtype=bool)
    observed[np.asarray(days) - lo] = True

    w = window_days

    def _cover(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).unique().sort(["user_id", "d"])
        if df.height == 0:
            return pa.table(
                {
                    "day": pa.array([], pa.int32()),
                    "n": pa.array([], pa.int64()),
                }
            )
        # interval [d, d+w-1] per active day; merge per user, explode
        df = df.with_columns(e=pl.col("d") + (w - 1))
        prev_max_e = pl.col("e").cum_max().shift(1).over("user_id")
        df = (
            df.with_columns(
                new=(pl.col("d") > prev_max_e + 1)
                .fill_null(True)
                .cast(pl.Int64)
            )
            .with_columns(island=pl.col("new").cum_sum().over("user_id"))
        )
        isl = (
            df.group_by(["user_id", "island"])
            .agg(pl.col("d").min().alias("s"), pl.col("e").max().alias("t"))
            # shift coverage to [d, d+w-1]; a user covers day X iff some
            # active d ∈ [X-w+1, X]
            .with_columns(
                pl.int_ranges(
                    pl.col("s"), pl.col("t") + 1, dtype=pl.Int32
                ).alias("day")
            )
            .explode("day")
            .filter((pl.col("day") >= lo) & (pl.col("day") <= hi))
        )
        keep = pl.Series(observed[isl["day"].to_numpy() - lo])
        return (
            isl.filter(keep)
            .group_by("day")
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    per_bucket = bucket_group_apply(
        pairs, "user_id", _cover, num_buckets=num_buckets
    )

    def _merge(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by("day")
            .agg(pl.col("n").sum().alias("n_users"))
            .with_columns(pl.col("day").cast(pl.Date))
            .to_arrow()
        )

    return bucket_group_apply(per_bucket, "day", _merge, num_buckets=4)


def time_weighted_value(
    events: ray.data.Dataset, *, num_buckets: int = 32
) -> ray.data.Dataset:
    """Time-weighted value integral per user — each event's value holds
    until the user's next event (step function), so the integral is
    Σ cents·Δt; the last event contributes nothing (no closing edge).
    Rows ``(user_id, weighted_cents_s, dur_s)`` in exact integers
    (durations floored to whole seconds on BOTH engines so the products
    stay well inside int64); the time-weighted average is the
    driver-side rational weighted/dur.

    One user-bucketed shuffle; per bucket a vectorized polars sort +
    lead-diff."""
    import polars as pl

    def _tw(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t)
            .drop_nulls("cents")
            .sort(["user_id", "ts", "event_id"])
            .with_columns(
                dur_s=(
                    (
                        pl.col("ts").shift(-1).over("user_id").cast(pl.Int64)
                        - pl.col("ts").cast(pl.Int64)
                    )
                    // 1_000_000
                )
            )
            .drop_nulls("dur_s")
        )
        return (
            df.with_columns(w=pl.col("cents") * pl.col("dur_s"))
            .group_by("user_id")
            .agg(
                pl.col("w").sum().alias("weighted_cents_s"),
                pl.col("dur_s").sum(),
            )
            .to_arrow()
        )

    def _prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "ts": t["ts"],
                "user_id": t["user_id"],
                "cents": pc.cast(
                    pc.round(pc.multiply(t["value"], 100.0)), pa.int64()
                ),
            }
        )

    prep = events.select_columns(
        ["event_id", "ts", "user_id", "value"]
    ).map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    return bucket_group_apply(prep, "user_id", _tw, num_buckets=num_buckets)


def multi_grain_counts(
    events: ray.data.Dataset, *, num_buckets: int = 8
) -> ray.data.Dataset:
    """Event counts at THREE time grains in one corpus pass — rows
    ``(grain ∈ {day, week, month}, period:date32, n)``; week starts
    Monday and month on the 1st on both engines (parity asserted in
    tests). Per block each event reduces to three (grain, period)
    partial counts (the combiner); one tiny bucketed merge."""
    import polars as pl

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["ts"]))
        outs = []
        for grain, every in (("day", "1d"), ("week", "1w"), ("month", "1mo")):
            outs.append(
                df.select(
                    grain=pl.lit(grain),
                    period=pl.col("ts").dt.truncate(every).dt.date(),
                )
                .group_by(["grain", "period"])
                .agg(pl.len().cast(pl.Int64).alias("n"))
            )
        return pl.concat(outs).to_arrow()

    def _merge(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by(["grain", "period"])
            .agg(pl.col("n").sum())
            .to_arrow()
        )

    partials = events.select_columns(["ts"]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucket_group_apply(partials, "grain", _merge, num_buckets=num_buckets)


def user_streaks(
    events: ray.data.Dataset, *, num_buckets: int = 32
) -> ray.data.Dataset:
    """Longest consecutive-day activity streak per user — rows
    ``(user_id, longest_streak:int64)`` (the classic gaps-and-islands
    `day - dense_rank` trick, vectorized). Blocks reduce to distinct
    (user, epoch-day) pairs before the one user-bucketed shuffle."""
    import polars as pl

    def _pairs(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["user_id", "ts"]))
            .with_columns(pl.col("ts").dt.date().cast(pl.Int32).alias("d"))
            .select(["user_id", "d"])
            .unique()
            .to_arrow()
        )

    pairs = events.map_batches(
        _pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    def _streak(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).unique().sort(["user_id", "d"])
        if df.height == 0:
            return pa.table(
                {
                    "user_id": pa.array([], t.schema.field("user_id").type),
                    "longest_streak": pa.array([], pa.int64()),
                }
            )
        return (
            df.with_columns(
                isl=pl.col("d")
                - pl.int_range(pl.len()).over("user_id").cast(pl.Int32)
            )
            .group_by(["user_id", "isl"])
            .agg(pl.len().cast(pl.Int64).alias("run"))
            .group_by("user_id")
            .agg(pl.col("run").max().alias("longest_streak"))
            .to_arrow()
        )

    return bucket_group_apply(
        pairs, "user_id", _streak, num_buckets=num_buckets
    )


def disorder_rollup(
    events: ray.data.Dataset, *, num_buckets: int = 64
) -> ray.data.Dataset:
    """Stream-quality monitor: per user, how many events arrived OUT OF
    ORDER → ``(user_id, n_events, n_late, max_late_us)`` where arrival
    order is ``event_id`` (the ingest sequence), an event is late when
    its ``ts`` is strictly below the running maximum of everything that
    arrived before it, and ``max_late_us`` is the worst lag in int64
    microseconds (0 when none) — the number a streaming deployment
    watches to size its watermark / allowed-lateness.

    One user-bucketed shuffle; inside each bucket the running max is a
    vectorized cummax over the event_id sort. Pure ints end to end."""
    import numpy as np
    import polars as pl

    from ..functions.shuffle import bucket_group_apply

    OUT = pa.schema(
        [
            ("user_id", pa.string()),
            ("n_events", pa.int64()),
            ("n_late", pa.int64()),
            ("max_late_us", pa.int64()),
        ]
    )

    def _per_user(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return OUT.empty_table()
        df = (
            pl.from_arrow(t.select(["user_id", "event_id", "ts"]))
            .sort(["user_id", "event_id"])
            .with_columns(ts_us=pl.col("ts").cast(pl.Int64))
            .with_columns(
                prev_max=pl.col("ts_us")
                .cum_max()
                .shift(1)
                .over("user_id")
            )
            .with_columns(
                late=(pl.col("ts_us") < pl.col("prev_max")).fill_null(False),
                lag_us=(pl.col("prev_max") - pl.col("ts_us")).clip(
                    lower_bound=0
                ),
            )
        )
        return (
            df.group_by("user_id")
            .agg(
                pl.len().cast(pl.Int64).alias("n_events"),
                pl.col("late").sum().cast(pl.Int64).alias("n_late"),
                pl.col("lag_us")
                .max()
                .fill_null(0)
                .cast(pl.Int64)
                .alias("max_late_us"),
            )
            .to_arrow()
            .cast(OUT)
        )

    return bucket_group_apply(
        events, "user_id", _per_user, num_buckets=num_buckets
    ).sort("user_id")


def attribute_conversions(
    events: ray.data.Dataset,
    *,
    conversion: str = "purchase",
    window_us: int = 7 * 86_400_000_000,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Last-touch marketing attribution: every *conversion* event is
    credited to the same user's latest strictly-preceding
    NON-conversion event (total order ``(ts, event_id)``) whose ``ts``
    is within ``window_us`` of the conversion; conversions with no such
    touch fall under channel ``'(none)'``. Output is one row per
    channel: ``(channel, n_conversions, revenue_cents)`` with revenue
    in exact int64 cents so the sum is layout-independent.

    This is a windowed AS-OF SELF-join — the shape Ray Data has no
    primitive for — done in ONE user-bucketed shuffle: a user's whole
    history lands in a single reducer, where the as-of lookup is a
    vectorized forward-fill over the ``(ts, event_id)`` sort (the
    latest preceding non-conversion is, by construction, the last
    non-null above each row). Per-bucket partials are disjoint channel
    counts that merge by plain sum in a tiny second shuffle; raw events
    never move twice. Partitioning assumption: one user's events fit in
    a reducer — the same assumption as `sessionize`.
    """
    import polars as pl

    OUT = pa.schema(
        [
            ("channel", pa.string()),
            ("n_conversions", pa.int64()),
            ("revenue_cents", pa.int64()),
        ]
    )

    def _per_user(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return OUT.empty_table()
        is_conv = pl.col("event_type") == conversion
        df = (
            pl.from_arrow(
                t.select(["user_id", "event_id", "ts", "event_type", "value"])
            )
            .sort(["user_id", "ts", "event_id"])
            .with_columns(ts_us=pl.col("ts").cast(pl.Int64))
            .with_columns(
                nc_ts=pl.when(~is_conv).then(pl.col("ts_us")),
                nc_type=pl.when(~is_conv).then(pl.col("event_type")),
            )
            .with_columns(
                nc_ts=pl.col("nc_ts").forward_fill().over("user_id"),
                nc_type=pl.col("nc_type").forward_fill().over("user_id"),
            )
        )
        conv = df.filter(is_conv).with_columns(
            channel=pl.when(
                pl.col("nc_ts").is_not_null()
                & (pl.col("nc_ts") >= pl.col("ts_us") - window_us)
            )
            .then(pl.col("nc_type"))
            .otherwise(pl.lit("(none)")),
            cents=(pl.col("value") * 100.0).round(0).cast(pl.Int64),
        )
        return (
            conv.group_by("channel")
            .agg(
                pl.len().cast(pl.Int64).alias("n_conversions"),
                pl.col("cents").sum().cast(pl.Int64).alias("revenue_cents"),
            )
            .to_arrow()
            .cast(OUT)
        )

    partials = bucket_group_apply(
        events, "user_id", _per_user, num_buckets=num_buckets
    )

    def _merge(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return OUT.empty_table()
        return (
            pl.from_arrow(t)
            .group_by("channel")
            .agg(
                pl.col("n_conversions").sum(),
                pl.col("revenue_cents").sum(),
            )
            .to_arrow()
            .cast(OUT)
        )

    return bucket_group_apply(partials, "channel", _merge, num_buckets=4)


def association_rules(
    events: ray.data.Dataset,
    *,
    min_support: int = 1,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Market-basket association rules over per-user baskets: basket =
    the set of DISTINCT event types a user ever fired; for every ordered
    type pair (a, b) with co-support ≥ ``min_support`` emit
    ``(antecedent, consequent, n_both, n_ante, confidence_ppm,
    lift_ppm)`` — confidence = P(b|a), lift = P(a,b)/(P(a)·P(b)), both
    as exact integer parts-per-million (``//`` floor division) so the
    result is bit-identical across engines and block layouts.

    Differs from :func:`event_cooccurrence` (temporal window pairs,
    order matters, multiplicity counts): baskets are set-semantic and
    window-free — the Apriori pair statistic.

    One user-bucketed shuffle of (user_id, event_type) pairs: a user's
    basket lands whole in one reducer, so per-bucket distinct baskets
    are disjoint and their pair/item counts are partials that merge by
    plain sum (|types|²-bounded, tiny). The user count N rides along as
    a per-bucket distinct-user partial. No second pass over the corpus.
    """
    import polars as pl

    OUT = pa.schema(
        [
            ("antecedent", pa.string()),
            ("consequent", pa.string()),
            ("n_both", pa.int64()),
            ("n_ante", pa.int64()),
            ("confidence_ppm", pa.int64()),
            ("lift_ppm", pa.int64()),
        ]
    )
    PARTIAL = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("n", pa.int64())]
    )

    def _partial(t: pa.Table) -> pa.Table:
        # distinct (user, type); emit pair rows (a,b), item rows (a,""),
        # and one ("","") row per user — all merge by sum downstream
        df = (
            pl.from_arrow(t.select(["user_id", "event_type"]))
            .unique()
            .sort(["user_id", "event_type"])
        )
        if df.height == 0:
            return PARTIAL.empty_table()
        pairs = (
            df.join(df, on="user_id")
            .filter(pl.col("event_type") != pl.col("event_type_right"))
            .group_by(["event_type", "event_type_right"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .rename({"event_type": "a", "event_type_right": "b"})
        )
        items = (
            df.group_by("event_type")
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .rename({"event_type": "a"})
            .with_columns(pl.lit("").alias("b"))
            .select(["a", "b", "n"])
        )
        users = pl.DataFrame(
            {"a": [""], "b": [""], "n": [df["user_id"].n_unique()]}
        ).with_columns(pl.col("n").cast(pl.Int64))
        return pl.concat(
            [pairs.select(["a", "b", "n"]), items, users]
        ).to_arrow().cast(PARTIAL)

    partials = bucket_group_apply(
        events.select_columns(["user_id", "event_type"]),
        "user_id",
        _partial,
        num_buckets=num_buckets,
    )

    def _with_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_gkey", pc.binary_join_element_wise(t["a"], t["b"], "\x00")
        )

    keyed = partials.map_batches(
        _with_key, batch_format="pyarrow", zero_copy_batch=True
    )

    def _sum(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.drop_columns(["_gkey"]))
            .group_by(["a", "b"])
            .agg(pl.col("n").sum())
            .to_arrow()
            .cast(PARTIAL)
        )

    # counts are |types|² + |types| + 1 rows — tiny; finish driver-side
    merged = bucket_group_apply(keyed, "_gkey", _sum, num_buckets=4)
    cdf = pl.from_arrow(
        pa.concat_tables(
            [ray.get(r) for r in merged.to_arrow_refs()],
            promote_options="default",
        )
    )
    n_users = int(cdf.filter((pl.col("a") == "") & (pl.col("b") == ""))["n"][0])
    supp = {
        r["a"]: r["n"]
        for r in cdf.filter(
            (pl.col("b") == "") & (pl.col("a") != "")
        ).iter_rows(named=True)
    }
    rows = []
    for r in cdf.filter((pl.col("b") != "")).iter_rows(named=True):
        if r["n"] < min_support:
            continue
        na = supp[r["a"]]
        rows.append(
            {
                "antecedent": r["a"],
                "consequent": r["b"],
                "n_both": r["n"],
                "n_ante": na,
                "confidence_ppm": r["n"] * 1_000_000 // na,
                "lift_ppm": r["n"] * n_users * 1_000_000
                // (na * supp[r["b"]]),
            }
        )
    if not rows:
        return ray.data.from_arrow(OUT.empty_table())
    return ray.data.from_arrow(
        pa.Table.from_pylist(rows, schema=OUT)
    )


def event_trends(
    events: ray.data.Dataset,
    *,
    key: str = "event_type",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Per-event-type linear trend of daily volume, in EXACT integer
    arithmetic: least-squares slope over (day, daily_count) points kept
    as the un-divided pair ``slope_num = n·Σxy − Σx·Σy`` /
    ``slope_den = n·Σx² − (Σx)²`` — rows ``(event_type, n_days,
    slope_num, slope_den)``. The drift monitor ("is tool-call volume
    trending down?") without floats: sign(slope) = sign(slope_num) since
    the denominator is ≥ 0, and any consumer can divide at display
    time. Days with zero events are NOT gap-filled (compose with
    `fill_date_gaps` when they should be); x = days since epoch.

    Fully decomposable: per-block partial (event_type, day, n) counts
    shrink the stream before the single event_type-bucketed shuffle;
    the per-type reduce merges day counts and computes the four sums
    vectorized. Σ terms stay in int64 (x ~ 2·10⁴, centuries of daily
    counts fit with 10⁵× headroom). ``key`` generalizes the group
    column — the same operator serves predicate-assertion drift on the
    KG stream (kg_pred_trend) by projection alone."""
    import polars as pl

    from ..functions.shuffle import bucket_group_apply

    PARTIAL = pa.schema(
        [
            (key, pa.string()),
            ("day", pa.date32()),
            ("n", pa.int64()),
        ]
    )
    OUT = pa.schema(
        [
            (key, pa.string()),
            ("n_days", pa.int64()),
            ("slope_num", pa.int64()),
            ("slope_den", pa.int64()),
        ]
    )

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([key, "ts"]))
        return (
            df.with_columns(pl.col("ts").dt.date().alias("day"))
            .group_by([key, "day"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .select([key, "day", "n"])
            .to_arrow()
            .cast(PARTIAL)
        )

    def _trend(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return OUT.empty_table()
        return (
            pl.from_arrow(t)
            .group_by([key, "day"])
            .agg(pl.col("n").sum())
            .with_columns(
                x=pl.col("day").cast(pl.Int32).cast(pl.Int64),
                y=pl.col("n"),
            )
            .group_by(key)
            .agg(
                pl.len().cast(pl.Int64).alias("n_days"),
                pl.col("x").sum().alias("sx"),
                pl.col("y").sum().alias("sy"),
                (pl.col("x") * pl.col("y")).sum().alias("sxy"),
                (pl.col("x") * pl.col("x")).sum().alias("sxx"),
            )
            .select(
                key,
                "n_days",
                (pl.col("n_days") * pl.col("sxy") - pl.col("sx") * pl.col("sy"))
                .alias("slope_num"),
                (pl.col("n_days") * pl.col("sxx") - pl.col("sx") * pl.col("sx"))
                .alias("slope_den"),
            )
            .to_arrow()
            .cast(OUT)
        )

    partial = events.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucket_group_apply(
        partial, key, _trend, num_buckets=num_buckets
    )
