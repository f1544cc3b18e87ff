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
    path: str | list[str],
    *,
    override_num_blocks: int | None = None,
    evolve_schema: bool = False,
) -> ray.data.Dataset:
    """T0 source: pruned parquet read + validate/coerce/filter stage.

    ``path`` may be a directory or an explicit file list (the
    partition-level resume path feeds one file shard at a time).

    ``evolve_schema=True`` accepts heterogeneous shard layouts — legacy
    files missing NULLABLE T0 columns (``tool``, ``ts``) read as nulls,
    and each block coerces to T0 before validation. The cost is losing
    read-level column pruning on those directories (the scanner can't
    project columns a file lacks), so it is opt-in: point it at mixed
    old/new shard directories during a migration, not at clean tables.
    Files missing a REQUIRED column (conv_id/turn_idx/role/text) still
    fail loudly in the coerce step."""
    if evolve_schema:
        ds = ray.data.read_parquet(
            path, override_num_blocks=override_num_blocks
        )
        return ds.map_batches(
            _coerce_evolving, batch_format="pyarrow", zero_copy_batch=True
        )
    ds = ray.data.read_parquet(
        path,
        columns=list(TRANSCRIPTS.names),
        override_num_blocks=override_num_blocks,
    )
    return ds.map_batches(
        _validate_batch, batch_format="pyarrow", zero_copy_batch=True
    )


_REQUIRED = ("conv_id", "turn_idx", "role", "text")


def _coerce_evolving(batch: pa.Table) -> pa.Table:
    """Schema-evolution coerce: null-fill absent nullable T0 columns,
    then the standard M1/M2 pass."""
    missing = [f.name for f in TRANSCRIPTS if f.name not in batch.column_names]
    bad = [m for m in missing if m in _REQUIRED]
    if bad:
        raise ValueError(f"transcript shard missing required columns {bad}")
    for m in missing:
        f = TRANSCRIPTS.field(m)
        batch = batch.append_column(m, pa.nulls(batch.num_rows, f.type))
    return _validate_batch(batch)


def ordered_turns(ds: ray.data.Dataset) -> ray.data.Dataset:
    """O1 stable turn order: globally sorted ``(conv_id, turn_idx)`` view.

    Ray Data executes unordered by default; pipelines that only need the
    per-turn text-equality INVARIANT join on the key instead (free). This
    explicit sort is for outputs a consumer will READ in order (exports,
    sequence-model training shards). A sort is the Ray-idiomatic choice
    over ``preserve_order=True``, which serializes the whole streaming
    executor to preserve an input order nobody defined for parquet shards.
    """
    return ds.sort(["conv_id", "turn_idx"])


def clean_turns(
    ds: ray.data.Dataset,
    *,
    num_buckets: int = 64,
    assert_dense: bool = False,
) -> ray.data.Dataset:
    """Dirty-input repair (SURVEY.md §2.2 "streaming semantics"): exactly
    one row per ``(conv_id, turn_idx)``.

    Late/duplicate turns keep-first with a DETERMINISTIC tiebreak — rows
    sort by (turn_idx, text, role, tool) inside each conversation, so the
    survivor does not depend on Ray's block arrival order and a rerun over
    the same dirty shard is byte-identical. One conv-bucketed shuffle;
    clean input passes through unchanged (same rows, deterministic
    content). With ``assert_dense`` the op raises on gaps in ``turn_idx``
    (M1's dense-index assumption) instead of silently accepting them.
    """
    from ..functions.shuffle import bucket_group_apply

    def _clean(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return t
        df = (
            pl.from_arrow(t)
            .sort(["conv_id", "turn_idx", "text", "role", "tool"])
            .unique(
                subset=["conv_id", "turn_idx"],
                keep="first",
                maintain_order=True,
            )
        )
        if assert_dense:
            bad = (
                df.group_by("conv_id")
                .agg(
                    (
                        pl.col("turn_idx").sort().cast(pl.Int64)
                        != pl.int_range(pl.len())
                    )
                    .any()
                    .alias("gap")
                )
                .filter(pl.col("gap"))
            )
            if bad.height:
                raise ValueError(
                    "non-dense turn_idx in conv_ids "
                    f"{bad['conv_id'].to_list()[:5]}"
                )
        out = df.to_arrow()
        return pa.Table.from_arrays(
            [out[f.name].cast(f.type) for f in TRANSCRIPTS], schema=TRANSCRIPTS
        )

    return bucket_group_apply(ds, "conv_id", _clean, num_buckets=num_buckets)


def read_transcripts_jsonl(
    path: str | list[str], *, override_num_blocks: int | None = None
) -> ray.data.Dataset:
    """T0 source from JSON-lines shards (the other common transcript
    interchange format) — same validate/coerce/filter stage as the
    parquet reader, so downstream stages see one schema regardless of
    wire format. ``ts`` accepts epoch-microsecond ints or ISO-8601
    strings; missing ``tool`` coerces to null. ``.gz`` shards stream
    through Arrow's gzip decompressor (web corpora ship as .jsonl.gz) —
    decompression happens inside the read tasks, never on the driver."""
    paths = [path] if isinstance(path, str) else list(path)
    read_kwargs: dict = {}
    if any(str(p).endswith(".gz") for p in paths):
        read_kwargs = {
            "arrow_open_stream_args": {"compression": "gzip"},
            "file_extensions": ["gz", "json", "jsonl"],
        }
    ds = ray.data.read_json(
        path, override_num_blocks=override_num_blocks, **read_kwargs
    )

    def _coerce(batch: pa.Table) -> pa.Table:
        cols = {}
        n = batch.num_rows
        for f in TRANSCRIPTS:
            if f.name in batch.column_names:
                c = batch[f.name].combine_chunks()
                # string ts casts through Arrow's ISO-8601 parser, which
                # accepts fractional seconds (strptime's fixed format
                # would reject '...T03:04:05.123456')
                cols[f.name] = c.cast(f.type)
            else:
                cols[f.name] = pa.nulls(n, f.type)
        return pa.Table.from_arrays(
            [cols[f.name] for f in TRANSCRIPTS], schema=TRANSCRIPTS
        )

    return ds.map_batches(
        _coerce, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(_validate_batch, batch_format="pyarrow", zero_copy_batch=True)


def read_transcripts_csv(
    path: str | list[str], *, override_num_blocks: int | None = None
) -> ray.data.Dataset:
    """T0 source from CSV shards — the third interchange format, through
    the SAME coerce + validate/filter stages as the parquet and JSONL
    readers so every downstream stage sees one schema. CSV-specific
    repair: empty strings in nullable string columns (``tool``) become
    true nulls (CSV cannot distinguish them); ``ts`` accepts ISO-8601."""
    ds = ray.data.read_csv(path, override_num_blocks=override_num_blocks)

    def _coerce(batch: pa.Table) -> pa.Table:
        cols = {}
        n = batch.num_rows
        for f in TRANSCRIPTS:
            if f.name in batch.column_names:
                c = batch[f.name].combine_chunks()
                if f.name == "tool" and pa.types.is_string(c.type):
                    c = pc.if_else(pc.equal(pc.coalesce(c, ""), ""), None, c)
                cols[f.name] = c.cast(f.type)
            else:
                cols[f.name] = pa.nulls(n, f.type)
        return pa.Table.from_arrays(
            [cols[f.name] for f in TRANSCRIPTS], schema=TRANSCRIPTS
        )

    return ds.map_batches(
        _coerce, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(_validate_batch, batch_format="pyarrow", zero_copy_batch=True)


def write_transcripts_jsonl(ds: ray.data.Dataset, path: str) -> None:
    """T0 sink: JSON-lines shards (one file per block, the interchange
    format `read_transcripts_jsonl` consumes — the round trip is
    pytest-pinned). Timestamps serialize as ISO-8601 strings so any
    engine can re-ingest them."""
    import pyarrow.compute as _pc

    def _iso(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("ts"),
            "ts",
            # Arrow's %S already carries the fractional seconds
            _pc.strftime(t["ts"], format="%Y-%m-%dT%H:%M:%S"),
        )

    ds.map_batches(
        _iso, batch_format="pyarrow", zero_copy_batch=True
    ).write_json(path)


def write_transcripts_csv(ds: ray.data.Dataset, path: str) -> None:
    """T0 sink: CSV shards (one file per block) closing the third
    interchange format's round trip with `read_transcripts_csv` —
    pytest-pinned. Timestamps serialize as ISO-8601; nullable string
    columns write empty strings (CSV's null), which the reader repairs
    back to true nulls."""
    import pyarrow.compute as _pc

    def _iso(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("ts"),
            "ts",
            _pc.strftime(t["ts"], format="%Y-%m-%dT%H:%M:%S"),
        )

    ds.map_batches(
        _iso, batch_format="pyarrow", zero_copy_batch=True
    ).write_csv(path)


def split_valid(
    ds: ray.data.Dataset, *, materialize: bool = True
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Dead-letter split: route rows M1 would silently drop into a
    QUARANTINE dataset instead → ``(valid, quarantine)`` where valid is
    the byte-identical T0 stream `read_transcripts` would produce and
    quarantine carries every rejected row plus an ``_m1_reason`` column
    (``'null_key'`` | ``'empty_text'``). A 100-TB ingest wants the bad
    rows auditable (written next to the run's metrics), not vanished.

    One flagging pass, vectorized; the upstream is materialized once by
    default so the two filtered views don't recompute the read — pass
    ``materialize=False`` if the caller will only consume one side.
    """

    def _flag(t: pa.Table) -> pa.Table:
        arrays = [t[f.name].cast(f.type) for f in TRANSCRIPTS]
        tt = pa.Table.from_arrays(arrays, schema=TRANSCRIPTS)
        null_key = pc.or_(
            pc.is_null(tt["conv_id"]), pc.is_null(tt["turn_idx"])
        )
        empty = pc.equal(
            pc.utf8_length(
                pc.utf8_trim_whitespace(pc.coalesce(tt["text"], ""))
            ),
            0,
        )
        reason = pc.if_else(
            null_key,
            pa.scalar("null_key", pa.string()),
            pc.if_else(
                empty,
                pa.scalar("empty_text", pa.string()),
                pa.scalar(None, pa.string()),
            ),
        )
        return tt.append_column("_m1_reason", reason)

    flagged = ds.map_batches(
        _flag, batch_format="pyarrow", zero_copy_batch=True
    )
    if materialize:
        flagged = flagged.materialize()

    def _valid(t: pa.Table) -> pa.Table:
        out = t.filter(pc.is_null(t["_m1_reason"])).drop_columns(
            ["_m1_reason"]
        )
        validate_schema(out, TRANSCRIPTS, "transcripts")
        return out

    def _quarantine(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t["_m1_reason"]))

    return (
        flagged.map_batches(
            _valid, batch_format="pyarrow", zero_copy_batch=True
        ),
        flagged.map_batches(
            _quarantine, batch_format="pyarrow", zero_copy_batch=True
        ),
    )
