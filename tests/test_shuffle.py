"""Bucketed split→reduce shuffle primitives — edge cases.

The shuffle is exercised end-to-end by the canonicalization / graph /
dedup tests; this file pins its boundary behaviors: num_buckets=1 (Ray
does not unpack a 1-tuple under num_returns=1), empty inputs, and
key-locality (all rows of one key land in exactly one reduce call).
"""

import pyarrow as pa
import ray.data

from joint_entity_and_relation_extraction_ray.functions.shuffle import (
    bucket_group_apply,
    cobucket_apply,
)


def _docs(n=10):
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([f"k{i % 3}" for i in range(n)], pa.string()),
                "v": pa.array(list(range(n)), pa.int64()),
            }
        )
    )


def test_bucket_group_apply_single_bucket(ray_session):
    out = bucket_group_apply(_docs(), "k", lambda t: t, num_buckets=1)
    df = out.to_pandas().sort_values("v").reset_index(drop=True)
    assert list(df["v"]) == list(range(10))


def test_cobucket_apply_single_bucket(ray_session):
    def _join(lt: pa.Table, rt: pa.Table) -> pa.Table:
        return lt.join(rt, keys=["k"], join_type="inner")

    right = _docs(3).map_batches(
        lambda t: t.rename_columns(["k", "w"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = cobucket_apply(
        _docs(6),
        right,
        lambda t: t["k"].combine_chunks(),
        lambda t: t["k"].combine_chunks(),
        _join,
        num_buckets=1,
    )
    assert out.count() == 6  # 6 left rows × exactly-one right row per key


def test_bucket_group_apply_key_locality(ray_session):
    # every key's rows must arrive in ONE reduce call: a per-call count per
    # key must equal that key's total count
    def _count(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t)
            .group_by("k")
            .agg(pl.len().alias("n"))
            .to_arrow()
            .cast(pa.schema([("k", pa.string()), ("n", pa.int64())]))
        )

    out = bucket_group_apply(_docs(30), "k", _count, num_buckets=8)
    df = out.to_pandas()
    assert len(df) == 3 and set(df["n"]) == {10}


def test_bucket_group_apply_empty_input(ray_session):
    empty = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.int64())})
    )
    out = bucket_group_apply(empty, "k", lambda t: t, num_buckets=4)
    assert out.count() == 0


def test_empty_buckets_dropped_schema_uniform(ray_session):
    """Empty reduce buckets must NOT surface as blocks: Ray's Project
    operator passes 0-row blocks through unprojected, so a downstream
    select_columns would leak the pre-projection schema (VERDICT r2 #3).
    With 3 keys and 16 buckets most buckets are empty; every emitted
    block must carry the identical post-projection schema."""
    import ray

    def _fn(t: pa.Table) -> pa.Table:
        return t.append_column(
            "extra", pa.array([1] * t.num_rows, pa.int64())
        )

    out = bucket_group_apply(_docs(30), "k", _fn, num_buckets=16)
    proj = out.select_columns(["k", "v"]).materialize()
    schemas = {
        tuple(ray.get(r).schema.names) for r in proj.to_arrow_refs()
    }
    assert schemas == {("k", "v")}
    assert proj.count() == 30

    # all-empty output still yields one typed empty block
    none = bucket_group_apply(
        _docs(6), "k", lambda t: t.slice(0, 0), num_buckets=4
    )
    assert none.count() == 0
    assert none.schema().names == ["k", "v"]

    # cobucket path: same guarantee
    def _join(lt: pa.Table, rt: pa.Table) -> pa.Table:
        return lt.append_column(
            "r_rows", pa.array([rt.num_rows] * lt.num_rows, pa.int64())
        )

    co = cobucket_apply(
        _docs(12),
        _docs(12),
        lambda t: t["k"].combine_chunks(),
        lambda t: t["k"].combine_chunks(),
        _join,
        num_buckets=16,
    )
    cp = co.select_columns(["k", "v"]).materialize()
    cschemas = {
        tuple(ray.get(r).schema.names) for r in cp.to_arrow_refs()
    }
    assert cschemas == {("k", "v")}


def test_parquet_exchange_equivalence_primitive(ray_session, tmp_path,
                                                monkeypatch):
    """`exchange="parquet"` (the multi-node swap path, VERDICT r4 #8)
    must produce exactly the refs-path result: same rows, same key
    locality, typed empty buckets, staging dir cleaned up."""
    monkeypatch.setenv("KGRAY_EXCHANGE_DIR", str(tmp_path))
    seen = []

    def _tag(t: pa.Table) -> pa.Table:
        if t.num_rows:
            seen.append(sorted(set(t["k"].to_pylist())))
        return t

    out = bucket_group_apply(
        _docs(30), "k", _tag, num_buckets=8, exchange="parquet"
    )
    df = out.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    ref = (
        bucket_group_apply(_docs(30), "k", lambda t: t, num_buckets=8)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert df.equals(ref)
    assert not list(tmp_path.glob("bga-*"))  # staging cleaned


def test_parquet_exchange_equivalence_ops(ray_session, tmp_path,
                                          monkeypatch):
    """Two real operators built on bucket_group_apply — MinHash near-dup
    pairs and the events rollup — must return identical results under
    KGRAY_EXCHANGE=parquet (the env flag a multi-node deployment flips
    without touching call sites)."""
    import numpy as np

    from joint_entity_and_relation_extraction_ray.stages import dedup
    from joint_entity_and_relation_extraction_ray.stages.events import (
        sessionize,
    )

    rng = np.random.default_rng(7)
    texts = []
    for i in range(60):
        base = " ".join(f"w{rng.integers(0, 40)}" for _ in range(30))
        texts.append(base)
        if i % 5 == 0:
            texts.append(base + " w1")  # near-dup partner
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(4)

    import datetime as dt

    ev = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(
                    [i % 7 for i in range(200)], pa.int64()
                ),
                "ts": pa.array(
                    [
                        dt.datetime(2026, 1, 1)
                        + dt.timedelta(minutes=int(i * 13 % 997))
                        for i in range(200)
                    ],
                    pa.timestamp("us"),
                ),
            }
        )
    ).repartition(3)

    def _collect(ds):
        df = ds.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    base_pairs = _collect(dedup.minhash_dedup_pairs(docs, threshold=0.5))
    base_sess = _collect(sessionize(ev, num_buckets=8))

    monkeypatch.setenv("KGRAY_EXCHANGE_DIR", str(tmp_path))
    monkeypatch.setenv("KGRAY_EXCHANGE", "parquet")
    pq_pairs = _collect(dedup.minhash_dedup_pairs(docs, threshold=0.5))
    pq_sess = _collect(sessionize(ev, num_buckets=8))

    assert base_pairs.equals(pq_pairs)
    assert len(base_pairs) > 0
    assert base_sess.equals(pq_sess)


def test_parquet_exchange_cobucket_equivalence(ray_session, tmp_path,
                                               monkeypatch):
    """cobucket_apply under exchange="parquet" must equal the refs path
    (same join rows, typed empties, staging cleaned) — both shuffle
    primitives share the multi-node swap path."""
    monkeypatch.setenv("KGRAY_EXCHANGE_DIR", str(tmp_path))

    def _join(lt: pa.Table, rt: pa.Table) -> pa.Table:
        return lt.join(rt, keys=["k"], join_type="inner")

    right = _docs(3).map_batches(
        lambda t: t.rename_columns(["k", "w"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _run(exchange):
        out = cobucket_apply(
            _docs(12),
            right,
            lambda t: t["k"].combine_chunks(),
            lambda t: t["k"].combine_chunks(),
            _join,
            num_buckets=8,
            exchange=exchange,
        )
        df = out.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    assert _run("parquet").equals(_run(None))
    assert not list(tmp_path.glob("cba-*"))  # staging cleaned

    # all-empty left side falls back to the refs path (still correct)
    empty = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.int64())})
    )
    out = cobucket_apply(
        empty,
        right,
        lambda t: t["k"].combine_chunks(),
        lambda t: t["k"].combine_chunks(),
        _join,
        num_buckets=4,
        exchange="parquet",
    )
    assert out.count() == 0


def test_parquet_exchange_empty_input_applies_fn(ray_session, tmp_path,
                                                 monkeypatch):
    """A typed 0-row input under exchange="parquet" must still apply fn
    (falling back to the refs path), matching the refs medium's output
    SCHEMA — returning the input unchanged diverged the two media
    (review r5)."""
    monkeypatch.setenv("KGRAY_EXCHANGE_DIR", str(tmp_path))
    empty = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.int64())})
    )

    def _proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {"k": t["k"], "n": pa.array([1] * t.num_rows, pa.int64())}
        )

    out = bucket_group_apply(
        empty, "k", _proj, num_buckets=4, exchange="parquet"
    )
    ref = bucket_group_apply(empty, "k", _proj, num_buckets=4)
    assert out.count() == 0 == ref.count()
    assert out.schema().names == ref.schema().names == ["k", "n"]


def test_parquet_exchange_cleans_staging_on_failure(ray_session, tmp_path,
                                                    monkeypatch):
    """A failing per-bucket fn must not leak the staged shuffle input
    under $KGRAY_EXCHANGE_DIR (review r5: repeated failing runs used to
    accumulate full input copies until ENOSPC)."""
    import pytest

    monkeypatch.setenv("KGRAY_EXCHANGE_DIR", str(tmp_path))

    def _boom(t: pa.Table) -> pa.Table:
        raise RuntimeError("bucket fn failure")

    with pytest.raises(Exception):
        bucket_group_apply(
            _docs(20), "k", _boom, num_buckets=4, exchange="parquet"
        )
    assert not list(tmp_path.glob("bga-*"))


def test_parquet_exchange_preserves_prestamped_bucket_schema(
    ray_session, tmp_path, monkeypatch
):
    """Ops that PRE-STAMP the house `_bucket` column and pass its NAME
    as the cobucket key (the fused KG path) must work identically under
    the parquet medium: the staged exchange partitions on its own
    reserved `_xpart` column so fn receives the exact refs-path row
    schema, `_bucket` included (review r5: a second appended `_bucket`
    broke every fused/canonical op under KGRAY_EXCHANGE=parquet)."""
    monkeypatch.setenv("KGRAY_EXCHANGE_DIR", str(tmp_path))

    def _mk(n):
        t = _docs(n)
        return t.map_batches(
            lambda b: b.append_column(
                "_bucket",
                pa.array(
                    [(len(x) + i) % 4
                     for i, x in enumerate(b["k"].to_pylist())],
                    pa.int32(),
                ),
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def _fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        # the fused-path convention: fn drops the pre-stamped column
        # itself — it must therefore BE present
        lt = lt.drop_columns(["_bucket"])
        rt = rt.drop_columns(["_bucket"])
        return pa.table(
            {
                "n_l": pa.array([lt.num_rows], pa.int64()),
                "n_r": pa.array([rt.num_rows], pa.int64()),
            }
        )

    def _run(exchange):
        out = cobucket_apply(
            _mk(20), _mk(12), "_bucket", "_bucket", _fn,
            num_buckets=4, exchange=exchange,
        )
        df = out.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    assert _run("parquet").equals(_run(None))


def test_parquet_exchange_schemaless_empty_blocks(ray_session, tmp_path,
                                                  monkeypatch):
    """Ray represents 0-row blocks as 0-COLUMN tables (the groupby-
    aggregate artifact _split_refs defends against): the parquet stamp
    must pass them through as an XPART-only empty instead of raising
    KeyError on the missing key column (review r5)."""
    import ray

    monkeypatch.setenv("KGRAY_EXCHANGE_DIR", str(tmp_path))
    data = pa.table(
        {
            "k": pa.array(["a", "b", "a", "c"], pa.string()),
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    mixed = ray.data.from_arrow_refs(
        [ray.put(data), ray.put(pa.table({}))]  # one schema-less empty
    )
    out = bucket_group_apply(
        mixed, "k", lambda t: t, num_buckets=4, exchange="parquet"
    )
    df = out.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    assert list(df["v"]) == [1, 3, 2, 4]
