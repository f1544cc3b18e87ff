"""Relational ops Ray Data lacks: as-of join, group top-k, exact quantiles.

Semantics are pinned against tiny closed-form cases (plus a DuckDB
cross-check for the quantile index rule) — the driver re-verifies all
three against full SQL oracles at sf0.01.
"""

import math

import duckdb
import pyarrow as pa
import ray.data

from joint_entity_and_relation_extraction_ray.stages.relational import (
    asof_join,
    group_topk,
    value_quantiles,
)


def _ds(d, types=None):
    cols = {}
    for k, v in d.items():
        t = (types or {}).get(k)
        cols[k] = pa.array(v, t) if t else pa.array(v)
    return ray.data.from_arrow(pa.table(cols))


def test_asof_backward_basic(ray_session):
    left = _ds({"k": [1, 1, 1, 2], "ts": [5, 15, 2, 9], "lid": [0, 1, 2, 3]})
    right = _ds(
        {
            "k": [1, 1, 2],
            "ts": [3, 10, 100],
            "r_ts": [3, 10, 100],
            "val": [30.0, 100.0, 9.0],
        }
    )
    out = asof_join(
        left, right, by="k", on="ts", right_cols=["r_ts", "val"], num_buckets=4
    )
    rows = {r["lid"]: (r["r_ts"], r["val"]) for r in out.take_all()}
    assert rows[0] == (3, 30.0)  # ts=5 → latest prior right ts=3
    assert rows[1] == (10, 100.0)  # ts=15 → ts=10
    assert rows[2] == (None, None)  # ts=2 → nothing prior
    assert rows[3] == (None, None)  # key 2 has only a future right row
    assert out.count() == 4  # LEFT join keeps all left rows


def test_asof_equal_ts_matches(ray_session):
    # `on` equality counts as "prior" (l.ts >= r.ts)
    left = _ds({"k": [7], "ts": [10], "lid": [0]})
    right = _ds({"k": [7], "ts": [10], "r_ts": [10], "val": [1.5]})
    (row,) = asof_join(
        left, right, by="k", on="ts", right_cols=["r_ts", "val"], num_buckets=2
    ).take_all()
    assert (row["r_ts"], row["val"]) == (10, 1.5)


def test_group_topk_rank_and_ties(ray_session):
    ds = _ds(
        {
            "g": [1, 1, 1, 1, 2],
            "v": [5.0, 9.0, 9.0, 1.0, 4.0],
            "id": [10, 11, 12, 13, 14],
        }
    )
    out = group_topk(
        ds, by="g", sort_col="v", k=2, descending=True, tiebreak="id", num_buckets=4
    ).take_all()
    got = sorted((r["g"], r["rank"], r["id"], r["v"]) for r in out)
    # g=1: ties on v=9 broken by ascending id → 11 then 12; g=2: single row
    assert got == [(1, 1, 11, 9.0), (1, 2, 12, 9.0), (2, 1, 14, 4.0)]


def test_group_topk_combiner_matches_global(ray_session):
    # many small blocks: per-block pre-truncation must not lose the winner
    import numpy as np

    rng = np.random.default_rng(7)
    n = 5000
    t = pa.table(
        {
            "g": pa.array(rng.integers(0, 37, n), pa.int64()),
            "v": pa.array(rng.random(n), pa.float64()),
            "id": pa.array(np.arange(n), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(23)
    out = group_topk(
        ds, by="g", sort_col="v", k=3, descending=True, tiebreak="id", num_buckets=8
    ).to_pandas()
    expect = duckdb.sql(
        """
        SELECT g, id, rank FROM (
          SELECT g, id, row_number() OVER
            (PARTITION BY g ORDER BY v DESC, id) AS rank FROM t) s
        WHERE rank <= 3
        """
    ).fetchdf()
    a = out[["g", "id", "rank"]].sort_values(["g", "rank"]).reset_index(drop=True)
    b = expect.sort_values(["g", "rank"]).reset_index(drop=True)
    assert a.astype(int).equals(b.astype(int))


def test_value_quantiles_matches_duckdb_disc(ray_session):
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    ds = _ds({"x": vals}, {"x": pa.int64()})
    out = {
        r["q"]: r["value"]
        for r in value_quantiles(ds, "x", qs, num_buckets=4).take_all()
    }
    for q in qs:
        want = duckdb.sql(
            f"SELECT quantile_disc(x, {q}) FROM (SELECT unnest({vals}) AS x)"
        ).fetchone()[0]
        assert out[q] == want, q
    # the index rule itself: element at ceil(q*n)-1 of the ascending sort
    srt = sorted(vals)
    for q in qs:
        assert out[q] == srt[max(0, math.ceil(q * len(vals)) - 1)]
