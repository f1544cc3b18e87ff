"""Zone-map file skipping: a min/max-per-file index on a stat column so
range predicates prune whole parquet files BEFORE a Dataset read plans
any task.

Hive partitioning (``part=<k>`` dirs) prunes on the partition key only;
the second predicate every warehouse query carries — a time range over
an ingest-ordered table, a key range over a sorted export — still scans
every file. A zone map closes that gap for ~zero cost: parquet footers
already carry row-group statistics, so building the index reads KBs of
metadata per file, never data pages. At 100 TB the difference between
"open 2M footers" and "read one 50 MB index table" is the difference
between minutes and a failed driver, which is why the index itself is a
parquet TABLE (typed min/max round-trip — timestamps stay timestamps)
built by parallel Ray tasks and read in one pruned scan.

Contract: pruning is SAFE, never exact — a kept file may contain no
matching row (the filter still runs), but a skipped file provably
contains none (file min/max disjoint from the predicate range).
Files with no statistics for the column are always kept.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

ZONEMAP_PREFIX = "_zonemap"


def _zonemap_path(base_dir: str | Path, col: str) -> Path:
    return Path(base_dir) / f"{ZONEMAP_PREFIX}.{col}.parquet"


def _data_files(base_dir: str | Path) -> list[str]:
    return sorted(
        str(f)
        for f in Path(base_dir).rglob("*.parquet")
        if not f.name.startswith(ZONEMAP_PREFIX)
    )


def build_zonemap(base_dir: str | Path, col: str) -> Path:
    """Scan every parquet file under ``base_dir`` (footer metadata only)
    and write ``_zonemap.<col>.parquet`` with one row per file:
    ``(file, n_rows, vmin, vmax)`` typed by the column's own Arrow type.
    Footer reads are fanned out as Ray tasks (one per file chunk) — the
    driver never opens a data file."""
    files = _data_files(base_dir)
    if not files:
        raise FileNotFoundError(f"no parquet files under {base_dir}")

    @ray.remote
    def _stats(paths: list[str]):
        out = []
        for p in paths:
            md = pq.ParquetFile(p).metadata
            idx = {
                md.schema.column(i).name: i
                for i in range(len(md.schema))
            }
            if col not in idx:
                raise KeyError(f"{p} has no column {col!r}")
            ci = idx[col]
            lo = hi = None
            have = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    have = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            out.append(
                (p, md.num_rows, lo if have else None, hi if have else None)
            )
        return out

    chunk = max(1, len(files) // 64)
    rows = [
        r
        for part in ray.get(
            [
                _stats.remote(files[i : i + chunk])
                for i in range(0, len(files), chunk)
            ]
        )
        for r in part
    ]
    vtype = pq.read_schema(files[0]).field(col).type
    tbl = pa.table(
        {
            "file": pa.array([r[0] for r in rows], pa.string()),
            "n_rows": pa.array([r[1] for r in rows], pa.int64()),
            "vmin": pa.array([r[2] for r in rows], vtype),
            "vmax": pa.array([r[3] for r in rows], vtype),
        }
    )
    out = _zonemap_path(base_dir, col)
    pq.write_table(tbl, out)
    return out


def prune_files(
    base_dir: str | Path, col: str, lo=None, hi=None
) -> list[str]:
    """Files that MAY contain rows with ``lo <= col <= hi`` (either
    bound optional), per the zone map — provably-disjoint files are
    dropped; statless files are kept (safety). Raises if the zone map
    was never built (an implicit full scan hiding behind a typo'd path
    is the worse failure mode)."""
    import pyarrow.compute as pc

    zm = _zonemap_path(base_dir, col)
    if not zm.exists():
        raise FileNotFoundError(
            f"zone map {zm} not built — call build_zonemap first"
        )
    t = pq.read_table(zm)
    statless = pc.is_null(t["vmin"])
    keep = pc.cast(pa.array([True] * t.num_rows), pa.bool_())
    if lo is not None:
        keep = pc.and_(keep, pc.greater_equal(t["vmax"], pa.scalar(lo)))
    if hi is not None:
        keep = pc.and_(keep, pc.less_equal(t["vmin"], pa.scalar(hi)))
    # or_kleene: a statless file's comparisons are null; plain or_ would
    # propagate the null and filter() would DROP the row — the unsafe way
    return sorted(
        t.filter(pc.or_kleene(keep, statless))["file"].to_pylist()
    )


def read_pruned(
    base_dir: str | Path,
    col: str,
    lo=None,
    hi=None,
    *,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Zone-map-pruned range read: plan a ``read_parquet`` over ONLY the
    surviving files, then re-apply the exact predicate (pruning is
    file-granular; the residual filter is one vectorized compare per
    batch). An empty survivor set returns an empty Dataset with the
    table's schema — not an error."""
    import pyarrow.compute as pc

    files = prune_files(base_dir, col, lo, hi)
    if not files:
        schema = pq.read_schema(_data_files(base_dir)[0])
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return ray.data.from_arrow(schema.empty_table())
    # the residual filter needs the stat column; read it even when the
    # caller's projection drops it, and drop it again after filtering
    read_cols = columns
    drop_after = False
    if columns is not None and col not in columns:
        read_cols = [*columns, col]
        drop_after = True
    ds = ray.data.read_parquet(files, columns=read_cols)

    def _residual(t: pa.Table) -> pa.Table:
        mask = pa.array([True] * t.num_rows)
        if lo is not None:
            mask = pc.and_(mask, pc.greater_equal(t[col], pa.scalar(lo)))
        if hi is not None:
            mask = pc.and_(mask, pc.less_equal(t[col], pa.scalar(hi)))
        out = t.filter(mask)
        return out.drop_columns([col]) if drop_after else out

    return ds.map_batches(
        _residual, batch_format="pyarrow", zero_copy_batch=True
    )
