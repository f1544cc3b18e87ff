"""Transcript source: schema-validated Parquet read (SURVEY.md §2.2 S1/M1/M2).

Reads only declared columns (prune at the read), validates/coerces to the T0
schema, asserts the `(conv_id, turn_idx)` invariant columns are non-null,
and drops empty-text turns — all as vectorized pyarrow work inside
``map_batches`` on zero-copy Arrow batches.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..schema import TRANSCRIPTS, validate_schema


def _validate_batch(batch: pa.Table) -> pa.Table:
    """M1 validate/coerce + M2 turn filter, one vectorized pass."""
    # coerce column order/types to T0 (e.g. turn_idx arriving int64)
    arrays = [batch[f.name].cast(f.type) for f in TRANSCRIPTS]
    t = pa.Table.from_arrays(arrays, schema=TRANSCRIPTS)
    keep = pc.and_(
        pc.and_(pc.is_valid(t["conv_id"]), pc.is_valid(t["turn_idx"])),
        pc.greater(pc.utf8_length(pc.utf8_trim_whitespace(pc.coalesce(t["text"], ""))), 0),
    )
    out = t.filter(keep)
    validate_schema(out, TRANSCRIPTS, "transcripts")
    return out


def read_transcripts(
    path: str | list[str], *, override_num_blocks: int | None = None
) -> ray.data.Dataset:
    """T0 source: pruned parquet read + validate/coerce/filter stage.

    ``path`` may be a directory or an explicit file list (the
    partition-level resume path feeds one file shard at a time)."""
    ds = ray.data.read_parquet(
        path,
        columns=list(TRANSCRIPTS.names),
        override_num_blocks=override_num_blocks,
    )
    return ds.map_batches(
        _validate_batch, batch_format="pyarrow", zero_copy_batch=True
    )
