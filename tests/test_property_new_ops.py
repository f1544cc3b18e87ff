"""Property tests: the new per-key operators must agree with DuckDB for
arbitrary data and be invariant to block layout (the combiner-validity
property a distributed op can silently lose)."""

import duckdb
import pyarrow as pa
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

SMALL = st.integers(min_value=0, max_value=6)


def _ds(cols: dict, nblocks: int):
    return ray.data.from_arrow(pa.table(cols)).repartition(nblocks)


@settings(max_examples=12, deadline=None)
@given(
    data=st.lists(
        st.tuples(SMALL, SMALL, st.integers(0, 3)), min_size=1, max_size=60
    ),
    nblocks=st.integers(1, 5),
)
def test_latest_by_key_property(ray_session, data, nblocks):
    from joint_entity_and_relation_extraction_ray.stages.relational import (
        latest_by_key,
    )

    ks = [d[0] for d in data]
    ts = [d[1] for d in data]
    ids = list(range(len(data)))
    got = {
        r["k"]: (r["ts"], r["id"])
        for r in latest_by_key(
            _ds({"k": ks, "ts": ts, "id": ids}, nblocks),
            key="k", order_by="ts", tiebreak="id", num_buckets=3,
        ).take_all()
    }
    want = {
        k: (t, i)
        for k, t, i in duckdb.sql(
            "SELECT k, ts, id FROM (SELECT *, row_number() OVER "
            "(PARTITION BY k ORDER BY ts DESC, id) rn FROM (SELECT "
            "unnest(?) k, unnest(?) ts, unnest(?) id)) WHERE rn = 1",
            params=[ks, ts, ids],
        ).fetchall()
    }
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    data=st.lists(st.tuples(SMALL, SMALL), min_size=1, max_size=60),
    nblocks=st.integers(1, 5),
)
def test_group_ranks_property(ray_session, data, nblocks):
    from joint_entity_and_relation_extraction_ray.stages.relational import (
        group_ranks,
    )

    gs = [str(d[0]) for d in data]
    vs = [d[1] for d in data]
    got = {
        (r["g"], r["value"]): (r["rnk"], r["cume_n"], r["n_rows"])
        for r in group_ranks(
            _ds({"g": gs, "v": vs}, nblocks), by="g", col="v", num_buckets=3
        ).take_all()
    }
    want = {
        (g, v): (rk, cn, nr)
        for g, v, rk, cn, nr in duckdb.sql(
            "SELECT DISTINCT g, v, rank() OVER (PARTITION BY g ORDER BY v),"
            " count(*) OVER (PARTITION BY g ORDER BY v),"
            " count(*) OVER (PARTITION BY g) FROM "
            "(SELECT unnest(?) g, unnest(?) v)",
            params=[gs, vs],
        ).fetchall()
    }
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    data=st.lists(st.tuples(SMALL, SMALL), min_size=1, max_size=60),
    nblocks=st.integers(1, 5),
)
def test_group_mode_property(ray_session, data, nblocks):
    from joint_entity_and_relation_extraction_ray.stages.relational import (
        group_mode,
    )

    ks = [f"k{d[0]}" for d in data]
    vs = [f"v{d[1]}" for d in data]
    got = {
        r["k"]: (r["mode"], r["n_mode"], r["n_rows"])
        for r in group_mode(
            _ds({"k": ks, "v": vs}, nblocks), by="k", col="v", num_buckets=3
        ).take_all()
    }
    want = {
        k: (m, nm, nr)
        for k, m, nm, nr in duckdb.sql(
            "WITH per AS (SELECT k, v, count(*) n FROM (SELECT unnest(?) k,"
            " unnest(?) v) GROUP BY 1,2),"
            " tot AS (SELECT k, sum(n) nr FROM per GROUP BY 1)"
            " SELECT p.k, p.v, p.n, t.nr FROM per p JOIN tot t USING (k)"
            " QUALIFY row_number() OVER (PARTITION BY p.k"
            " ORDER BY p.n DESC, p.v) = 1",
            params=[ks, vs],
        ).fetchall()
    }
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    data=st.lists(st.tuples(SMALL, st.integers(0, 9)), min_size=1,
                  max_size=60),
    nblocks=st.integers(1, 5),
)
def test_group_mad_property(ray_session, data, nblocks):
    from joint_entity_and_relation_extraction_ray.stages.relational import (
        group_mad,
    )

    ks = [d[0] for d in data]
    vs = [d[1] for d in data]
    got = {
        r["k"]: (r["median"], r["mad"])
        for r in group_mad(
            _ds({"k": ks, "v": vs}, nblocks), by="k", col="v", num_buckets=3
        ).take_all()
    }
    want = {
        k: (m, d)
        for k, m, d in duckdb.sql(
            "WITH base AS (SELECT unnest(?) k, unnest(?) v),"
            " med AS (SELECT k, quantile_disc(v, 0.5) m FROM base GROUP BY 1)"
            " SELECT b.k, any_value(med.m),"
            " quantile_disc(abs(b.v - med.m), 0.5)"
            " FROM base b JOIN med ON b.k = med.k GROUP BY 1",
            params=[ks, vs],
        ).fetchall()
    }
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    data=st.lists(st.tuples(SMALL, SMALL), min_size=1, max_size=60),
    nblocks=st.integers(1, 5),
)
def test_scd2_intervals_property(ray_session, data, nblocks):
    from joint_entity_and_relation_extraction_ray.stages.relational import (
        scd2_intervals,
    )

    ks = [d[0] for d in data]
    ts = [d[1] for d in data]
    ids = list(range(len(data)))
    got = {
        r["id"]: r["valid_to"]
        for r in scd2_intervals(
            _ds({"k": ks, "ts": ts, "id": ids}, nblocks),
            key="k", order_by="ts", tiebreak="id", num_buckets=3,
        ).take_all()
    }
    want = {
        i: vt
        for i, vt in duckdb.sql(
            "SELECT id, lead(ts) OVER (PARTITION BY k ORDER BY ts, id)"
            " FROM (SELECT unnest(?) k, unnest(?) ts, unnest(?) id)",
            params=[ks, ts, ids],
        ).fetchall()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=1,
        max_size=50,
    ),
    nblocks=st.integers(1, 4),
)
def test_event_bursts_property(ray_session, data, nblocks):
    """max sliding-window count == brute force for arbitrary streams
    (window = 3600s; ts in seconds scaled to µs)."""
    import datetime as dt

    from joint_entity_and_relation_extraction_ray.pipelines.corpus_ops import (
        q_event_bursts,
    )
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    users = [d[0] for d in data]
    secs = [d[1] for d in data]
    t0 = dt.datetime(2025, 1, 1)
    tss = [t0 + dt.timedelta(seconds=s) for s in secs]
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array(users, pa.int64()),
                    "ts": pa.array(tss, pa.timestamp("us")),
                }
            ),
            os.path.join(td, "events.parquet"),
        )
        got = {
            r["user_id"]: r["max_burst"]
            for r in q_event_bursts(td).take_all()
        }
    want = {}
    byu = {}
    for u, s in zip(users, secs):
        byu.setdefault(u, []).append(s)
    for u, ss in byu.items():
        ss.sort()
        want[u] = max(
            sum(1 for x in ss if s <= x <= s + 3600) for s in ss
        )
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    data=st.lists(
        st.tuples(SMALL, SMALL, st.integers(0, 2), st.integers(0, 8)),
        min_size=1,
        max_size=50,
    ),
    nblocks=st.integers(1, 4),
)
def test_validity_intervals_property(ray_session, data, nblocks):
    """Change-point timeline == brute force for arbitrary (subj, pred,
    obj, ts) streams with duplicate timestamps and objects, at any
    block layout."""
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        validity_intervals,
    )

    subj = [f"s{d[0]}" for d in data]
    pred = [f"p{d[1]}" for d in data]
    obj = [f"o{d[2]}" for d in data]
    ts = [d[3] for d in data]
    t = pa.table(
        {
            "subj_id": subj,
            "pred": pred,
            "obj_id": obj,
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    ds = ray.data.from_arrow(t).repartition(nblocks)
    got = sorted(
        (
            r["subj_id"],
            r["pred"],
            r["obj_id"],
            int(r["valid_from"].timestamp() * 1e6),
            None
            if r["valid_to"] is None
            else int(r["valid_to"].timestamp() * 1e6),
        )
        for r in validity_intervals(ds, num_buckets=3).take_all()
    )

    # brute force: dedup min obj per (s, p, ts); keep change points;
    # lead() for valid_to
    best = {}
    for s, p, o, x in zip(subj, pred, obj, ts):
        k = (s, p, x)
        best[k] = o if k not in best else min(best[k], o)
    per_group = {}
    for (s, p, x), o in sorted(best.items()):
        per_group.setdefault((s, p), []).append((x, o))
    want = []
    for (s, p), seq in per_group.items():
        kept = [
            (x, o)
            for i, (x, o) in enumerate(seq)
            if i == 0 or o != seq[i - 1][1]
        ]
        for i, (x, o) in enumerate(kept):
            vt = kept[i + 1][0] if i + 1 < len(kept) else None
            want.append((s, p, o, x, vt))
    assert got == sorted(want)


@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(SMALL, st.integers(0, 1), SMALL), min_size=1, max_size=40
    ),
    nblocks=st.integers(1, 4),
)
def test_regular_path_pairs_property(ray_session, edges, nblocks):
    """RPQ p1·p2* min-hop pairs == brute-force BFS over pair frontiers
    for arbitrary directed multigraphs at any block layout."""
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        regular_path_pairs,
    )

    subj = [f"n{e[0]}" for e in edges]
    pred = [f"p{e[1]}" for e in edges]
    obj = [f"n{e[2]}" for e in edges]
    t = pa.table({"subj_id": subj, "pred": pred, "obj_id": obj})
    ds = ray.data.from_arrow(t).repartition(nblocks)
    K = 3
    got = sorted(
        (r["src"], r["dst"], r["hops"])
        for r in regular_path_pairs(ds, max_star_hops=K).take_all()
    )

    p1 = min(pred)
    p2 = max(pred)
    first = {(s, o) for s, p, o in zip(subj, pred, obj) if p == p1}
    star = {}
    for s, p, o in zip(subj, pred, obj):
        if p == p2:
            star.setdefault(s, set()).add(o)
    dist = {pair: 1 for pair in first}
    frontier = dict(dist)
    for h in range(2, K + 2):
        nxt = {}
        for (s, d), _ in frontier.items():
            for o in star.get(d, ()):
                if (s, o) not in dist:
                    nxt[(s, o)] = h
        dist.update(nxt)
        frontier = nxt
    want = sorted((s, d, h) for (s, d), h in dist.items())
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    data=st.lists(
        st.tuples(SMALL, st.integers(0, 9), st.integers(1, 5)),
        min_size=1,
        max_size=60,
    ),
    nblocks=st.integers(1, 4),
)
def test_group_weighted_median_property(ray_session, data, nblocks):
    """Lower weighted median == the SQL RANGE-framed cumulative-window
    crossing for arbitrary grouped weighted data at any block layout."""
    from joint_entity_and_relation_extraction_ray.stages.relational import (
        group_weighted_median,
    )

    gs = [f"g{d[0]}" for d in data]
    vs = [float(d[1]) for d in data]
    ws = [float(d[2]) for d in data]
    ds = _ds({"g": gs, "v": vs, "w": ws}, nblocks)
    got = {
        r["g"]: (r["wmedian"], r["total_w"])
        for r in group_weighted_median(
            ds, by="g", value_col="v", weight_col="w", num_buckets=3
        ).take_all()
    }
    want = {
        g: (m, tw)
        for g, m, tw in duckdb.sql(
            "WITH s AS (SELECT unnest(?) g, CAST(round(unnest(?)) AS "
            "BIGINT) v, CAST(round(unnest(?)) AS BIGINT) w), "
            "c AS (SELECT g, v, sum(w) OVER (PARTITION BY g ORDER BY v)"
            " cw, sum(w) OVER (PARTITION BY g) tw FROM s) "
            "SELECT g, min(v), min(tw) FROM c WHERE 2*cw >= tw GROUP BY 1",
            params=[gs, vs, ws],
        ).fetchall()
    }
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    data=st.lists(st.integers(0, 9), min_size=1, max_size=60),
    k=st.integers(1, 5),
    nblocks=st.integers(1, 4),
)
def test_equidepth_histogram_property(ray_session, data, k, nblocks):
    """Per-tile (n, lo, hi) == DuckDB ntile(k) for arbitrary values with
    heavy ties, at any block layout."""
    from joint_entity_and_relation_extraction_ray.stages.relational import (
        equidepth_histogram,
    )

    vs = [float(v) for v in data]
    ids = list(range(len(data)))
    ds = _ds({"v": vs, "id": ids}, nblocks)
    got = sorted(
        (r["tile"], r["n"], r["lo"], r["hi"])
        for r in equidepth_histogram(
            ds, value_col="v", tie_col="id", k=k, num_buckets=3
        ).take_all()
    )
    want = sorted(
        duckdb.sql(
            "WITH r AS (SELECT v, ntile(?) OVER (ORDER BY v, id) tile "
            "FROM (SELECT unnest(?) v, unnest(?) id)) "
            "SELECT tile, CAST(count(*) AS BIGINT), min(v), max(v) "
            "FROM r GROUP BY 1",
            params=[k, vs, ids],
        ).fetchall()
    )
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.tuples(SMALL, st.integers(0, 1), st.integers(0, 2), st.integers(0, 8)),
        min_size=1,
        max_size=40,
    ),
    cuts=st.tuples(st.integers(0, 8), st.integers(0, 8)),
    nblocks=st.integers(1, 4),
)
def test_snapshot_diff_property(ray_session, data, cuts, nblocks):
    """snapshot_diff == (brute-force snapshot at t1) FULL JOIN (at t2)
    with unchanged pairs dropped, for arbitrary assertion streams and
    arbitrary cutoffs (including reversed and equal)."""
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        snapshot_diff,
    )

    subj = [f"s{d[0]}" for d in data]
    pred = [f"p{d[1]}" for d in data]
    obj = [f"o{d[2]}" for d in data]
    ts = [d[3] for d in data]
    t1, t2 = cuts
    t = pa.table(
        {
            "subj_id": subj,
            "pred": pred,
            "obj_id": obj,
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    ds = ray.data.from_arrow(t).repartition(nblocks)
    got = sorted(
        (r["subj_id"], r["pred"], r["obj_before"], r["obj_after"], r["change"])
        for r in snapshot_diff(
            ds, t1_us=t1, t2_us=t2, num_buckets=3
        ).take_all()
    )

    def snapshot(at):
        best = {}
        for s, p, o, x in zip(subj, pred, obj, ts):
            k = (s, p, x)
            best[k] = o if k not in best else min(best[k], o)
        out = {}
        for (s, p, x), o in sorted(best.items()):
            if x <= at:
                out[(s, p)] = o  # later x overwrites: covering interval
        return out

    s1, s2 = snapshot(t1), snapshot(t2)
    want = []
    for k in set(s1) | set(s2):
        b, a = s1.get(k), s2.get(k)
        if b == a:
            continue
        change = "added" if b is None else "removed" if a is None else "changed"
        want.append((k[0], k[1], b, a, change))
    assert got == sorted(want)


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(SMALL, st.integers(0, 1), SMALL), min_size=1, max_size=30
    ),
    nblocks=st.integers(1, 4),
)
def test_closure_rollup_property(ray_session, edges, nblocks):
    """closure_rollup == brute-force p+ BFS rollup (distinct reach count
    and max min-hop depth) on the MIN predicate for arbitrary
    multigraphs."""
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        closure_rollup,
    )

    subj = [f"n{e[0]}" for e in edges]
    pred = [f"p{e[1]}" for e in edges]
    obj = [f"n{e[2]}" for e in edges]
    t = pa.table({"subj_id": subj, "pred": pred, "obj_id": obj})
    ds = ray.data.from_arrow(t).repartition(nblocks)
    K = 4
    got = sorted(
        (r["src"], r["n_desc"], r["depth"])
        for r in closure_rollup(ds, max_hops=K).take_all()
    )

    p = min(pred)
    adj = {}
    for s, pr, o in zip(subj, pred, obj):
        if pr == p:
            adj.setdefault(s, set()).add(o)
    want = []
    for src in sorted(adj):
        dist = {}
        frontier = {src}
        for h in range(1, K + 1):
            nxt = set()
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = h
                        nxt.add(v)
            frontier = nxt
        if dist:
            want.append((src, len(dist), max(dist.values())))
    assert got == sorted(want)


@settings(max_examples=40, deadline=None)
@given(
    scores=st.lists(st.integers(0, 6), min_size=1, max_size=40),
    kk=st.integers(1, 12),
    seed=st.integers(0, 10**6),
)
def test_topk_total_order_matches_python_sort(scores, kk, seed):
    """similarity._topk_total_order must return EXACTLY the kk smallest
    indices under (score asc, id asc) — argpartition alone picked
    arbitrary members of boundary ties (review r5). Heavy-tie score
    range [0, 6] forces boundary ties in most examples."""
    import numpy as np

    from joint_entity_and_relation_extraction_ray.stages.similarity import (
        _topk_total_order,
    )

    rng = np.random.default_rng(seed)
    row = np.asarray(scores, dtype=np.int64)
    ids = rng.permutation(len(row)).astype(np.int64)
    got = _topk_total_order(row, ids, kk)
    want = sorted(range(len(row)), key=lambda i: (row[i], ids[i]))[:kk]
    assert list(got) == want


@settings(max_examples=15, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.integers(0, 50), min_size=0, max_size=12),
        min_size=1,
        max_size=25,
    ),
)
def test_minhash_chunked_equals_oneshot(docs):
    """The perm-chunked + reduceat minhash (review r5 rewrite) must be
    BIT-identical to the one-shot product-matrix form for any mix of
    empty/non-empty docs in any position."""
    import numpy as np

    from joint_entity_and_relation_extraction_ray.functions import textstats

    shingles = [[f"s{w}" for w in d] for d in docs]
    got = textstats.minhash_signatures(shingles, num_perm=32, seed=7)
    # one-shot reference
    a, b = textstats._perm_params(32, 7)
    flat = [s for d in shingles for s in d]
    offs = [0]
    for d in shingles:
        offs.append(offs[-1] + len(d))
    want = np.full((len(shingles), 32), np.iinfo(np.uint64).max,
                   dtype=np.uint64)
    if flat:
        base = textstats.shingle_hashes(flat)
        with np.errstate(over="ignore"):
            prods = base[:, None] * a[None, :] + b[None, :]
        for i in range(len(shingles)):
            lo, hi = offs[i], offs[i + 1]
            if hi > lo:
                want[i] = prods[lo:hi].min(axis=0)
    assert (got == want).all()
