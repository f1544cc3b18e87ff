"""MRL quantile sketch: the err_bound certificate must hold against
exact quantiles, merging must preserve it, and the distributed operator
must carry it end-to-end."""

import numpy as np
import pyarrow as pa
import ray.data

from joint_entity_and_relation_extraction_ray.functions.qsketch import (
    QuantileSketch,
)


def _true_rank(sorted_vals: np.ndarray, v: float) -> int:
    # number of elements <= v (the rank the lower-quantile rule targets)
    return int(np.searchsorted(sorted_vals, v, side="right"))


def _assert_certificate(s: QuantileSketch, data: np.ndarray):
    sv = np.sort(data)
    n = len(data)
    assert s.n == n
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        got = s.query(q)
        target = max(1, int(np.ceil(q * n)))
        r = _true_rank(sv, got)
        # got's possible true ranks span [rank_lt+1, rank_le]; the
        # certificate says the chosen rank is within err_bound of target
        r_lo = int(np.searchsorted(sv, got, side="left")) + 1
        assert (
            r_lo - s.err_bound <= target <= r + s.err_bound
        ), (q, got, target, r_lo, r, s.err_bound, n)


def test_sketch_certificate_holds_random():
    rng = np.random.default_rng(41)
    for n in (10, 1_000, 50_000):
        data = rng.normal(0, 1e6, n)
        s = QuantileSketch(k=128)
        for chunk in np.array_split(data, max(1, n // 777)):
            s.add_batch(chunk)
        _assert_certificate(s, data)
        # the sketch must actually be small
        assert s.size() <= 128 * (int(np.log2(max(n, 128) / 128)) + 3)


def test_sketch_merge_certificate_holds():
    rng = np.random.default_rng(43)
    data = rng.exponential(100.0, 30_000)
    parts = np.array_split(data, 57)
    sketches = []
    for p in parts:
        s = QuantileSketch(k=64)
        s.add_batch(p)
        sketches.append(s)
    total = QuantileSketch(k=64)
    for s in sketches:
        total.merge(s)
    _assert_certificate(total, data)


def test_sketch_exact_when_small():
    # below k items no compaction ever happens: err_bound 0, exact
    s = QuantileSketch(k=256)
    vals = np.arange(100, dtype=np.float64)
    s.add_batch(vals)
    assert s.err_bound == 0
    assert s.query(0.5) == 49.0  # ceil(0.5*100)=50th value = 49
    assert s.query(1.0) == 99.0


def test_value_quantiles_approx_operator(ray_session):
    from joint_entity_and_relation_extraction_ray.stages.relational import (
        value_quantiles_approx,
    )

    rng = np.random.default_rng(47)
    data = rng.normal(0, 1000, 20_000)
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(data, pa.float64())})
    ).repartition(23)
    rows = value_quantiles_approx(ds, "v", [0.25, 0.5, 0.75]).take_all()
    assert [r["q_permille"] for r in rows] == [250, 500, 750]
    sv = np.sort(data)
    for r in rows:
        assert r["n"] == len(data)
        target = max(1, int(np.ceil(r["q_permille"] / 1000 * len(data))))
        r_le = int(np.searchsorted(sv, r["value"], side="right"))
        r_lo = int(np.searchsorted(sv, r["value"], side="left")) + 1
        assert r_lo - r["err_bound"] <= target <= r_le + r["err_bound"]
        # and the bound is tight enough to be useful: < 2% of n
        assert r["err_bound"] < 0.02 * len(data)
