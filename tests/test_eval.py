"""Distributed exact-match eval (J4/R9/R10): prf_counts / prf_counts_by
with planted false positives and false negatives — the driver compare only
exercises the degenerate exact case (tp == n_pred == n_gold)."""

import pandas as pd
import pyarrow as pa
import ray.data

from joint_entity_and_relation_extraction_ray.functions.eval import (
    prf_counts,
    prf_counts_by,
)

KEYS = ["conv_id", "turn_idx", "pred"]


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "pred": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


GOLD = [
    ("c1", 0, "uses"),
    ("c1", 1, "uses"),
    ("c2", 0, "owns"),
    ("c2", 1, "owns"),
    ("c3", 0, "likes"),
]
# pred: misses (c2,1,owns) and (c3,0,likes); adds a spurious ("c9",9,"uses")
# and a spurious predicate ("c9",8,"made"); duplicates one true row (must
# count once — eval is over DISTINCT key tuples).
PRED = [
    ("c1", 0, "uses"),
    ("c1", 0, "uses"),
    ("c1", 1, "uses"),
    ("c2", 0, "owns"),
    ("c9", 9, "uses"),
    ("c9", 8, "made"),
]


def test_prf_counts_with_fp_fn(ray_session):
    out = prf_counts(_ds(PRED), _ds(GOLD), KEYS).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["n_pred"], row["n_gold"], row["tp"]) == (5, 5, 3)


def test_prf_counts_by_group_breakdown(ray_session):
    out = (
        prf_counts_by(_ds(PRED), _ds(GOLD), KEYS, by="pred")
        .to_pandas()
        .set_index("pred")
        .sort_index()
    )
    want = pd.DataFrame(
        {
            "pred": ["likes", "made", "owns", "uses"],
            "n_pred": [0, 1, 1, 3],
            "n_gold": [1, 0, 2, 2],
            "tp": [0, 0, 1, 2],
        }
    ).set_index("pred")
    assert out.astype(int).equals(want)
