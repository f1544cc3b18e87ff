"""Evaluation: span/triple exact-match P/R/F1 (SURVEY.md §2.1 R9/R10,
§2.2 J4 golden-diff) — distributed set intersection via joins, counts only
(never materializes the match set on the driver)."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from .joins import join_auto


def _distinct_on(ds: ray.data.Dataset, keys: list[str]) -> ray.data.Dataset:
    from ray.data.aggregate import Count

    return (
        ds.select_columns(keys)
        .groupby(keys)
        .aggregate(Count(alias_name="_c"))
        .select_columns(keys)
    )


def prf_counts(
    pred: ray.data.Dataset, gold: ray.data.Dataset, keys: list[str]
) -> ray.data.Dataset:
    """→ one row (n_pred, n_gold, tp) of DISTINCT key-tuple counts.

    P = tp/n_pred, R = tp/n_gold (micro, exact-match) — derivable
    integers; the ≥0.95 contract checks them in pytest."""
    p = _distinct_on(pred, keys).materialize()
    g = _distinct_on(gold, keys).materialize()
    tp = join_auto(p, g, on=tuple(keys)).count()
    return ray.data.from_arrow(
        pa.table(
            {
                "n_pred": pa.array([p.count()], pa.int64()),
                "n_gold": pa.array([g.count()], pa.int64()),
                "tp": pa.array([tp], pa.int64()),
            }
        )
    )
