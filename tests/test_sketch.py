"""HyperLogLog sketch: accuracy, merge associativity, and the
sketch-based daily rollup vs the exact one."""

import numpy as np
import pyarrow as pa
import ray.data

from joint_entity_and_relation_extraction_ray.functions.sketch import (
    hll_add,
    hll_count,
    hll_deserialize,
    hll_empty,
    hll_merge,
    hll_serialize,
)


def test_hll_accuracy_large():
    regs = hll_add(hll_empty(), np.arange(100_000, dtype=np.int64))
    est = hll_count(regs)
    assert abs(est - 100_000) / 100_000 < 0.05  # p=12 → ~1.6% std err


def test_hll_small_range_linear_counting():
    regs = hll_add(hll_empty(), np.arange(50, dtype=np.int64))
    assert abs(hll_count(regs) - 50) <= 2


def test_hll_merge_equals_single_pass():
    a = hll_add(hll_empty(), np.arange(0, 60_000, dtype=np.int64))
    b = hll_add(hll_empty(), np.arange(40_000, 100_000, dtype=np.int64))
    merged = hll_merge(a, b)
    single = hll_add(hll_empty(), np.arange(100_000, dtype=np.int64))
    assert np.array_equal(merged, single)  # max-merge is exact on registers
    rt = hll_deserialize(hll_serialize(merged))
    assert np.array_equal(rt, merged)


def test_hll_deterministic_across_chunks():
    vals = np.arange(10_000, dtype=np.int64)
    one = hll_add(hll_empty(), vals)
    parts = hll_empty()
    for chunk in np.array_split(vals, 7):
        hll_add(parts, chunk)
    assert np.array_equal(one, parts)


def test_daily_rollup_approx_matches_exact_within_bound(ray_session):
    from joint_entity_and_relation_extraction_ray.stages import events

    rng = np.random.default_rng(5)
    n = 20_000
    t = pa.table(
        {
            "user_id": pa.array(
                rng.integers(0, 3_000, size=n), pa.int64()
            ),
            "ts": pa.array(
                rng.integers(0, 5 * 86_400_000_000, size=n),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(
                [["click", "view", "buy"][i % 3] for i in range(n)],
                pa.string(),
            ),
            "value": pa.array(rng.random(size=n), pa.float64()),
        }
    )
    ds = ray.data.from_arrow(t)
    exact = (
        events.daily_rollup(ds)
        .to_pandas()
        .set_index(["event_type", "day"])
        .sort_index()
    )
    approx = (
        events.daily_rollup_approx(ds)
        .to_pandas()
        .set_index(["event_type", "day"])
        .sort_index()
    )
    assert len(exact) == len(approx)
    j = exact.join(approx, rsuffix="_a")
    assert (j["n_events"] == j["n_events_a"]).all()
    assert (j["min_value"] == j["min_value_a"]).all()
    assert (j["max_value"] == j["max_value_a"]).all()
    rel = (j["n_users_approx"] - j["n_users"]).abs() / j["n_users"]
    assert rel.max() < 0.05, rel.max()
