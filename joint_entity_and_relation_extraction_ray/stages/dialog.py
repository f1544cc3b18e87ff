"""Dialog-structure analytics over the T0 transcript stream.

Operators on the *conversation* axis that read only the light columns
(`conv_id`, `turn_idx`, `role`, `tool`) — never the text payload — so
the shuffles they run move a few bytes per turn even when the corpus
carries multi-KB turns. Each op is one conv-bucketed shuffle (all rows
of a conversation land in one bucket; `functions/shuffle.py
bucket_group_apply`) with a vectorized polars kernel per bucket, then a
tiny second merge shuffle on the result key — the same decomposable
partial→merge shape as the token/role-pattern counters.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.shuffle import bucket_group_apply


def tool_transitions(
    ds: ray.data.Dataset, *, num_buckets: int = 32
) -> ray.data.Dataset:
    """Tool-call bigram counts: for every conversation, the sequence of
    NON-NULL `tool` values ordered by `turn_idx`; each consecutive pair
    (intervening non-tool turns are skipped) contributes one count.
    Rows ``(tool_a, tool_b, n:int64)`` — the agent-trajectory transition
    matrix used to mine common tool-chaining patterns from assistant
    transcripts. SQL mirror: ``LAG(tool) OVER (PARTITION BY conv_id
    ORDER BY turn_idx)`` on the tool-bearing turns.

    Dataflow: project to (conv_id, turn_idx, tool) and drop null tools
    BEFORE the shuffle (tool turns are a minority of the stream), then
    one conv-bucketed shuffle; per bucket a vectorized sort + per-conv
    shift emits bigram partial counts, and a second tiny shuffle on
    `tool_a` merges partials. At 100 TB only (conv_id, turn_idx, tool)
    triples of tool turns move, and the merge input is bounded by
    |tools|² per bucket."""
    import pyarrow.compute as pc

    slim = ds.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "tool"]).filter(
            pc.is_valid(t["tool"])
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    out_schema = pa.schema(
        [("tool_a", pa.string()), ("tool_b", pa.string()), ("n", pa.int64())]
    )

    def _bigrams(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return out_schema.empty_table()
        df = (
            pl.from_arrow(t)
            .sort(["conv_id", "turn_idx"])
            .with_columns(prev=pl.col("tool").shift(1).over("conv_id"))
            .drop_nulls("prev")
        )
        return (
            df.group_by(["prev", "tool"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .rename({"prev": "tool_a", "tool": "tool_b"})
            .to_arrow()
            .cast(out_schema)
        )

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return out_schema.empty_table()
        return (
            pl.from_arrow(t)
            .group_by(["tool_a", "tool_b"])
            .agg(pl.col("n").sum())
            .to_arrow()
            .cast(out_schema)
        )

    partial = bucket_group_apply(
        slim, "conv_id", _bigrams, num_buckets=num_buckets
    )
    return bucket_group_apply(partial, "tool_a", _merge, num_buckets=4)


def tool_stats(
    ds: ray.data.Dataset, *, num_buckets: int = 8
) -> ray.data.Dataset:
    """Per-tool usage profile: invocation count, distinct conversations,
    and the min/max turn position at which the tool fires — rows
    ``(tool, n_calls, n_convs, min_turn, max_turn)``. The "which tools
    matter and where in the dialog do they appear" audit.

    n_calls/min/max are plainly decomposable; the DISTINCT conv count
    uses disjoint conv partials: per block we reduce to distinct
    (tool, conv_id) pairs, the shuffle buckets by conv_id so every
    bucket's pairs are conversation-disjoint, and per-bucket distinct
    counts merge by plain sum — the same exact-distinct decomposition as
    the sliding-active-users op (`stages/events.py`)."""
    import pyarrow.compute as pc

    slim = ds.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "tool"]).filter(
            pc.is_valid(t["tool"])
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    part_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("tool", pa.string()),
            ("n_calls", pa.int64()),
            ("n_convs", pa.int64()),
            ("min_turn", pa.int64()),
            ("max_turn", pa.int64()),
        ]
    )
    out_schema = pa.schema(
        [
            ("tool", pa.string()),
            ("n_calls", pa.int64()),
            ("n_convs", pa.int64()),
            ("min_turn", pa.int64()),
            ("max_turn", pa.int64()),
        ]
    )

    def _partial(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return part_schema.empty_table()
        return (
            pl.from_arrow(t)
            .group_by(["conv_id", "tool"])
            .agg(
                pl.len().cast(pl.Int64).alias("n_calls"),
                pl.lit(1, dtype=pl.Int64).alias("n_convs"),
                pl.col("turn_idx").min().cast(pl.Int64).alias("min_turn"),
                pl.col("turn_idx").max().cast(pl.Int64).alias("max_turn"),
            )
            .to_arrow()
            .cast(part_schema)
        )

    def _bucket_merge(t: pa.Table) -> pa.Table:
        # within a conv bucket, collapse duplicate (conv, tool) partials
        # from different blocks, then roll up to per-tool counts
        import polars as pl

        if not t.num_rows:
            return out_schema.empty_table()
        per_conv = (
            pl.from_arrow(t)
            .group_by(["conv_id", "tool"])
            .agg(
                pl.col("n_calls").sum(),
                pl.col("min_turn").min(),
                pl.col("max_turn").max(),
            )
        )
        return (
            per_conv.group_by("tool")
            .agg(
                pl.col("n_calls").sum(),
                pl.len().cast(pl.Int64).alias("n_convs"),
                pl.col("min_turn").min(),
                pl.col("max_turn").max(),
            )
            .select(["tool", "n_calls", "n_convs", "min_turn", "max_turn"])
            .to_arrow()
            .cast(out_schema)
        )

    def _final(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return out_schema.empty_table()
        return (
            pl.from_arrow(t)
            .group_by("tool")
            .agg(
                pl.col("n_calls").sum(),
                pl.col("n_convs").sum(),  # conv-disjoint buckets: plain sum
                pl.col("min_turn").min(),
                pl.col("max_turn").max(),
            )
            .select(["tool", "n_calls", "n_convs", "min_turn", "max_turn"])
            .to_arrow()
            .cast(out_schema)
        )

    partials = slim.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    per_bucket = bucket_group_apply(
        partials, "conv_id", _bucket_merge, num_buckets=num_buckets
    )
    return bucket_group_apply(per_bucket, "tool", _final, num_buckets=2)
