"""Bucketed one-shuffle group application.

``bucket_group_apply`` hash-buckets rows by a key column and runs ONE Ray
shuffle (``groupby(bucket).map_groups``); the callback sees each bucket as
a single Arrow table and does vectorized per-key work locally. Compared to
a per-key ``groupby`` this moves the same rows but pays one shuffle round
instead of two (partial + final), and the callback can emit several
logical outputs in one pass (tagged rows).

Hot-key note: a combiner applied in ``map_batches`` BEFORE calling this
(reduce per key per block) caps any key's shuffle fan-in at the block
count, which keeps buckets bounded even under Zipfian keys — the
complementary mechanism to the explicit (key, salt) two-phase aggregation
in stages/canonical.py.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import ray.data

from ..schema import stable_bucket

BUCKET_COL = "_bucket"


def with_bucket(
    ds: ray.data.Dataset, key: str, num_buckets: int
) -> ray.data.Dataset:
    def _add(t: pa.Table) -> pa.Table:
        b = stable_bucket(t[key].to_numpy(zero_copy_only=False), num_buckets)
        return t.append_column(BUCKET_COL, pa.array(b, pa.int32()))

    return ds.map_batches(_add, batch_format="pyarrow", zero_copy_batch=True)


def bucket_group_apply(
    ds: ray.data.Dataset,
    key: str,
    fn: Callable[[pa.Table], pa.Table],
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """One-shuffle grouped apply: all rows of a key land in one bucket;
    ``fn(bucket_table)`` runs vectorized per bucket (key col included,
    bucket col dropped before the callback)."""

    def _apply(group: pa.Table) -> pa.Table:
        return fn(group.drop_columns([BUCKET_COL]))

    return (
        with_bucket(ds, key, num_buckets)
        .groupby(BUCKET_COL)
        .map_groups(_apply, batch_format="pyarrow")
    )
