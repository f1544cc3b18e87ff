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
    base = Path(base_dir)
    # Roll forward any MARKED crash-interrupted partition swap FIRST —
    # a bare skip of hidden .part=k.tmp-*/.trash-* dirs would silently
    # return partial data when the hidden copy is the only one (ADVICE
    # r3). Readers never clean UNMARKED debris (clean_orphans stays
    # False): an unmarked .tmp-* may be a CONCURRENT writer's
    # in-progress build — only the single-writer compact/upsert path
    # cleans those (review r4).
    from ..state.checkpoint import recover_partition_swaps

    recover_partition_swaps(base)
    return sorted(
        str(f)
        for f in base.rglob("*.parquet")
        if not f.name.startswith(ZONEMAP_PREFIX)
        # skip hidden dirs: marked swaps were resolved above; anything
        # left hidden is either concurrent staging or writer-side
        # debris, and must not be double-counted
        and not any(
            part.startswith(".") for part in f.relative_to(base).parts
        )
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


def _check_fresh(base_dir: str | Path, indexed_files, index_path: Path):
    """Raise if the index's file set differs from the table's current
    listing — new ingests or a compaction make a skipping index WRONG
    (silently missing rows / dead paths), which is worse than the scan
    it saves. One listing per probe is the single-node price of the
    check; a production deployment versions the index with the table
    manifest instead and skips the listing."""
    current = set(_data_files(base_dir))
    if set(indexed_files) != current:
        raise RuntimeError(
            f"skipping index {index_path} is STALE (file set changed "
            f"since build) — rebuild it"
        )


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
    _check_fresh(base_dir, t["file"].to_pylist(), zm)
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


# --------------------------------------------------------------------------
# Bloom-filter file skipping (point probes on unclustered high-cardinality
# columns — the complement of the min/max zone map, which needs clustering
# to bite)
# --------------------------------------------------------------------------

def _probe_string(sample_file: str, col: str, value) -> str:
    """The probe value rendered EXACTLY as the index build rendered the
    column: cast to the column's own Arrow type, then to string. Python
    str() of a datetime ('2024-01-01 00:00:00') differs from Arrow's
    cast of a timestamp[us] ('2024-01-01 00:00:00.000000') — hashing
    the former against an index built from the latter would prune every
    file, a silent false NEGATIVE."""
    vtype = pq.read_schema(sample_file).field(col).type
    return pa.scalar(value).cast(vtype).cast(pa.string()).as_py()


_BLOOM_K = 6
_HASH_KEY_1 = "0123456789123456"  # pandas' documented default key
_HASH_KEY_2 = "6543210987654321"


def _bloom_positions(values, m: int, k: int = _BLOOM_K):
    """k deterministic bit positions per value via double hashing
    (h1 + i·h2 mod m) — vectorized `pandas.util.hash_array` with two
    fixed keys, the same cross-process-stable hash family as
    `schema.stable_bucket`. Returns an (n, k) int64 array.

    ``k`` defaults to the persisted-index constant ``_BLOOM_K`` — the
    zone-map Bloom files on disk were built with it, and a probe MUST
    use the builder's k or risk false negatives; callers that own both
    sides of the filter (e.g. ``curation.decontaminate_bloom``) may pass
    the FP-optimal ``k = round(bits_per_key·ln 2)`` instead."""
    import numpy as np
    import pandas as pd

    arr = np.asarray(values, dtype=object)
    h1 = pd.util.hash_array(arr, hash_key=_HASH_KEY_1, categorize=False)
    h2 = pd.util.hash_array(arr, hash_key=_HASH_KEY_2, categorize=False)
    i = np.arange(int(k), dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(
        np.int64
    )


def _bloom_path(base_dir: str | Path, col: str) -> Path:
    return Path(base_dir) / f"{ZONEMAP_PREFIX}.bloom.{col}.parquet"


def build_bloom_index(
    base_dir: str | Path, col: str, *, bits_per_row: int = 16
) -> Path:
    """Per-file Bloom filters on ``col``: one row per parquet file with
    ``(file, n_rows, m, bits)`` where ``bits`` is an m-bit filter of the
    file's values (k=6 double hashing, ~0.05% false-positive rate at 16
    bits/row). Point probes on a column the table is NOT clustered by —
    entity ids in an ingest-ordered edge log — skip every file whose
    filter provably excludes the key, no sort required. Build cost is
    one column-pruned scan per file, fanned out as Ray tasks; the index
    is a tiny parquet table read once per probe."""
    import numpy as np

    files = _data_files(base_dir)
    if not files:
        raise FileNotFoundError(f"no parquet files under {base_dir}")

    @ray.remote
    def _filters(paths: list[str]):
        out = []
        for p in paths:
            t = pq.read_table(p, columns=[col])
            vals = t[col].cast(pa.string()).to_numpy(zero_copy_only=False)
            n = len(vals)
            m = max(64, ((n * bits_per_row + 63) // 64) * 64)
            bits = np.zeros(m // 8, dtype=np.uint8)
            if n:
                pos = _bloom_positions(vals, m).ravel()
                np.bitwise_or.at(bits, pos >> 3, 1 << (pos & 7).astype(np.uint8))
            out.append((p, n, m, bits.tobytes()))
        return out

    chunk = max(1, len(files) // 64)
    rows = [
        r
        for part in ray.get(
            [
                _filters.remote(files[i : i + chunk])
                for i in range(0, len(files), chunk)
            ]
        )
        for r in part
    ]
    tbl = pa.table(
        {
            "file": pa.array([r[0] for r in rows], pa.string()),
            "n_rows": pa.array([r[1] for r in rows], pa.int64()),
            "m": pa.array([r[2] for r in rows], pa.int64()),
            "bits": pa.array([r[3] for r in rows], pa.binary()),
        }
    )
    out = _bloom_path(base_dir, col)
    pq.write_table(tbl, out)
    return out


def prune_files_bloom(base_dir: str | Path, col: str, value) -> list[str]:
    """Files that MAY contain ``col == value`` per the Bloom index —
    a file is dropped only when at least one of the key's k bits is
    unset in its filter (provable absence; false positives only ever
    KEEP a file, the safe direction)."""
    import numpy as np

    bp = _bloom_path(base_dir, col)
    if not bp.exists():
        raise FileNotFoundError(
            f"bloom index {bp} not built — call build_bloom_index first"
        )
    t = pq.read_table(bp)
    _check_fresh(base_dir, t["file"].to_pylist(), bp)
    keep = []
    sval = _probe_string(_data_files(base_dir)[0], col, value)
    for f, m, bits in zip(
        t["file"].to_pylist(), t["m"].to_pylist(), t["bits"].to_pylist()
    ):
        arr = np.frombuffer(bits, dtype=np.uint8)
        pos = _bloom_positions([sval], m).ravel()
        if np.all(arr[pos >> 3] & (1 << (pos & 7).astype(np.uint8))):
            keep.append(f)
    return sorted(keep)


def read_point(
    base_dir: str | Path,
    col: str,
    value,
    *,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Bloom-pruned point read: plan ``read_parquet`` over only the
    files whose filter admits the key, then re-apply the exact equality
    predicate (Bloom keeps are probabilistic; the residual filter is
    one vectorized compare). Empty survivor set → typed empty Dataset."""
    import pyarrow.compute as pc

    files = prune_files_bloom(base_dir, col, value)
    if not files:
        schema = pq.read_schema(_data_files(base_dir)[0])
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return ray.data.from_arrow(schema.empty_table())
    read_cols = columns
    drop_after = False
    if columns is not None and col not in columns:
        read_cols = [*columns, col]
        drop_after = True
    ds = ray.data.read_parquet(files, columns=read_cols)

    def _residual(t: pa.Table) -> pa.Table:
        # typed equality: cast the PROBE to the column's type, never the
        # column to a string (same false-negative trap as the hash)
        out = t.filter(
            pc.equal(t[col], pa.scalar(value).cast(t.schema.field(col).type))
        )
        return out.drop_columns([col]) if drop_after else out

    return ds.map_batches(
        _residual, batch_format="pyarrow", zero_copy_batch=True
    )
