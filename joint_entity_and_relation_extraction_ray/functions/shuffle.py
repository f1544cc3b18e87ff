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


SIDE_COL = "_side"


def cobucket_apply(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_bucket: Callable[[pa.Table], "pa.Array"],
    right_bucket: Callable[[pa.Table], "pa.Array"],
    fn: Callable[[pa.Table, pa.Table], pa.Table],
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Co-partitioned two-sided apply in ONE shuffle (the big–big join
    primitive): both datasets are tagged and hash-bucketed on their join
    key, unioned, and ``fn(left_rows, right_rows)`` runs per bucket with
    all co-keyed rows local — a bucketed shuffle hash join without the
    planner's all-to-all JoinOperator (which stalled at 10^7-row inputs
    in this environment).

    ``left_bucket`` / ``right_bucket`` map a batch to its bucket-key
    string array (hashed via the same stable hash on both sides, so equal
    keys always co-locate). Schemas are aligned by null-filling the other
    side's columns.
    """
    l_schema = left.schema()
    r_schema = right.schema()
    l_fields = list(zip(l_schema.names, l_schema.types))
    r_fields = [
        (n, t) for n, t in zip(r_schema.names, r_schema.types)
        if n not in l_schema.names
    ]
    all_fields = l_fields + r_fields
    l_names = set(l_schema.names)
    r_names = set(r_schema.names)

    def _tag(side: str, bucket_fn):
        def _fn(t: pa.Table) -> pa.Table:
            keys = bucket_fn(t)
            b = stable_bucket(
                keys.to_numpy(zero_copy_only=False)
                if hasattr(keys, "to_numpy")
                else keys,
                num_buckets,
            )
            cols = {
                BUCKET_COL: pa.array(b, pa.int32()),
                SIDE_COL: pa.array([side] * len(t), pa.string()),
            }
            have = l_names if side == "l" else r_names
            for name, typ in all_fields:
                cols[name] = (
                    t[name].combine_chunks()
                    if name in have
                    else pa.nulls(len(t), typ)
                )
            return pa.table(cols)

        return _fn

    tagged = left.map_batches(
        _tag("l", left_bucket), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(
            _tag("r", right_bucket), batch_format="pyarrow", zero_copy_batch=True
        )
    )

    import pyarrow.compute as pc

    def _apply(group: pa.Table) -> pa.Table:
        body = group.drop_columns([BUCKET_COL])
        lmask = pc.equal(body[SIDE_COL], "l")
        lt = body.filter(lmask).select([n for n, _ in l_fields])
        rt = body.filter(pc.invert(lmask)).select(
            [n for n, _ in zip(r_schema.names, r_schema.types)]
        )
        return fn(lt, rt)

    return (
        tagged.groupby(BUCKET_COL).map_groups(_apply, batch_format="pyarrow")
    )
