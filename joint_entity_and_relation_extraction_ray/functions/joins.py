"""Join strategies (SURVEY.md §2.2 J1–J4, §4.3 "wide shuffles").

Two physical strategies behind one API:

- **broadcast map-side join** — small side is ``ray.put`` into the object
  store ONCE and every ``map_batches`` task runs a zero-copy Acero hash
  join (``pa.Table.join``) of its batch against it. No shuffle, no
  repartition of the big side; the small side is fetched from the local
  plasma store per task (shared-memory read, not a re-ship per batch).
- **shuffle hash join** — ``ray.data.Dataset.join`` (Ray 2.49 hash join)
  with explicit ``num_partitions``; the scale path when both sides are
  large.

``join_auto`` picks broadcast when the small side's row count (cheap —
metadata of a materialized dataset) is under ``broadcast_threshold``.
This is the standard engine-side decision (cf. Spark's
autoBroadcastJoinThreshold); at 10^12-turn scale the canon/label tables
exceed the threshold and the same call sites degrade gracefully to the
shuffle join.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

# ~2M short-string rows ≈ low hundreds of MB in plasma — safely broadcastable
# on any reasonable worker; override per call for wider rows.
BROADCAST_THRESHOLD_ROWS = 2_000_000

# below this, the once-per-actor index build saves less than the actor
# pool's spin-up costs — use the stateless per-task join instead
ACTOR_INDEX_MIN_ROWS = 50_000


def dataset_to_table(ds: ray.data.Dataset) -> pa.Table:
    """Small materialized Dataset → one Arrow table (driver-side; only ever
    used under the broadcast threshold)."""
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        schema = ds.schema()
        return (
            pa.schema(
                [pa.field(n, t) for n, t in zip(schema.names, schema.types)]
            ).empty_table()
            if schema
            else pa.table({})
        )
    return pa.concat_tables(tables, promote_options="default")


class _IndexJoiner:
    """Actor-pool broadcast joiner: the small side's hash index is built
    ONCE per actor (``__init__``), batches join at C speed via
    ``pd.Index.get_indexer`` — no per-batch hash-table rebuild (the naive
    per-task ``pa.Table.join`` rebuilds the build side for every batch,
    which dominated wall time at 10^6-row small sides). Requires a UNIQUE
    single join key on the small side."""

    def __init__(self, ref, key: str, join_type: str):
        import pandas as pd

        side: pa.Table = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.key = key
        self.join_type = join_type
        self.index = pd.Index(side[key].to_numpy(zero_copy_only=False))
        self.payload = side.drop_columns([key])

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.index.get_indexer(
            batch[self.key].to_numpy(zero_copy_only=False)
        )
        if self.join_type == "inner":
            keep = idx >= 0
            left = batch.filter(pa.array(keep))
            right = self.payload.take(idx[keep])
            arrays = left.columns + right.columns
            names = left.column_names + right.column_names
            return pa.Table.from_arrays(arrays, names=names)
        # left outer: misses become nulls
        miss = idx < 0
        safe = idx.copy()
        safe[miss] = 0
        right = self.payload.take(safe)
        if miss.any():
            mask = pa.array(miss)
            right = pa.Table.from_arrays(
                [
                    pa.compute.if_else(
                        mask, pa.nulls(len(batch), col.type), col.combine_chunks()
                    )
                    for col in right.columns
                ],
                names=right.column_names,
            )
        arrays = batch.columns + right.columns
        names = batch.column_names + right.column_names
        return pa.Table.from_arrays(arrays, names=names)


def broadcast_join(
    big: ray.data.Dataset,
    small: pa.Table,
    *,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    join_type: str = "inner",
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Map-side join of every batch of ``big`` against broadcast ``small``.

    Single unique join key → actor-pool index joiner (build once per
    actor). Multi-key or duplicate-key small sides → per-task zero-copy
    Acero join (``pa.Table.join``)."""
    right_on = right_on or on
    if tuple(right_on) != tuple(on):
        small = small.rename_columns(
            [
                dict(zip(right_on, on)).get(c, c)
                for c in small.column_names
            ]
        )
    small = small.combine_chunks()
    ref = ray.put(small) if ray.is_initialized() else small
    keys = list(on)

    unique_single = len(keys) == 1 and (
        pa.compute.count_distinct(small[keys[0]]).as_py() == small.num_rows
    )
    # Tiny sides (dim tables) go through the per-task Acero join below:
    # rebuilding a few-thousand-row hash table per batch is noise, while
    # an actor pool pays seconds of spin-up per join stage.
    if unique_single and small.num_rows >= ACTOR_INDEX_MIN_ROWS:
        from ..stages.linker import default_pool_size

        return big.map_batches(
            _IndexJoiner,
            fn_constructor_kwargs={
                "ref": ref,
                "key": keys[0],
                "join_type": join_type,
            },
            batch_format="pyarrow",
            zero_copy_batch=True,
            # autoscaling pool: several join stages can coexist in one
            # pipeline without pinning every CPU to idle fixed pools
            concurrency=concurrency or (1, default_pool_size()),
        )

    jt = {"inner": "inner", "left_outer": "left outer"}[join_type]

    def _bj(batch: pa.Table) -> pa.Table:
        side = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        # Acero requires exact key-type equality; polars-built sides carry
        # large_string where batches carry string — align side to batch
        for k in keys:
            bt = batch.schema.field(k).type
            if side.schema.field(k).type != bt:
                side = side.set_column(
                    side.column_names.index(k), k, side[k].cast(bt)
                )
        return batch.join(side, keys=keys, join_type=jt)

    return big.map_batches(_bj, batch_format="pyarrow", zero_copy_batch=True)


def join_auto(
    big: ray.data.Dataset,
    small: ray.data.Dataset,
    *,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    join_type: str = "inner",
    num_partitions: int = 16,
    broadcast_threshold: int = BROADCAST_THRESHOLD_ROWS,
) -> ray.data.Dataset:
    """Broadcast the small side when it fits, else shuffle hash join.

    ``small`` is materialized to decide (its count is then free metadata);
    every call site here already materializes it for reuse anyway.
    """
    small = small.materialize()
    if small.count() <= broadcast_threshold:
        return broadcast_join(
            big,
            dataset_to_table(small),
            on=on,
            right_on=right_on,
            join_type=join_type,
        )
    return big.join(
        small,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )
