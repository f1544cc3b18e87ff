"""Fused canonicalize + graph-materialize dataflow.

The contracted canonicalization (stages/canonical.py) buckets mentions by
conversation to compute (conv, surface)-group reps. A triple's endpoint
groups are derivable from the TRIPLE row itself — `(conv_id,
normalize(subj_surface))` IS the subject mention's group key, because the
scorer emits the identical surface slice for the mention and the triple
endpoint. So one conv-bucketed shuffle over mentions ∪ triples resolves
EVERYTHING the downstream graph needs, and canon / edges / nodes all
derive from that single `TAGGED` dataset with cheap maps + final
aggregates — no mention-keyed big–big joins at all (they were 60% of
pipeline wall at 6M turns).

TAGGED row kinds (superset schema, nulls off-kind):

| kind | columns used |
|------|--------------|
| m    | mention_id, rep, min_ent, surface, ent_type |
| t    | rep=subj_rep, min_ent=subj_ent, obj_rep, obj_ent, pred, ts |
| p    | min_ent=src entity, obj_ent=dst entity (entity-merge edge) |

Canonical label rule (proof in stages/canonical.py): for a group with
linked entities, canonical = CC label of its min entity; otherwise its
rep (min mention_id). The iterative salted hash-to-min CC runs on the
`p`-edges only.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.shuffle import cobucket_apply
from ..functions.text import normalize_surface_array
from ..schema import CANON, stable_bucket, stable_hash64
from .canonical import connected_components, default_partitions

TAGGED = pa.schema(
    [
        ("kind", pa.string()),
        ("mention_id", pa.string()),
        ("rep", pa.string()),
        ("min_ent", pa.string()),
        ("surface", pa.string()),
        ("ent_type", pa.string()),
        ("obj_rep", pa.string()),
        ("obj_ent", pa.string()),
        ("pred", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _grp_keys(conv_col, surface_col) -> pa.Array:
    # fully vectorized: NFC+lower + binary join (Python-per-row normalize
    # over 10^7 rows was a top pipeline cost)
    return pc.binary_join_element_wise(
        conv_col.combine_chunks()
        if hasattr(conv_col, "combine_chunks")
        else conv_col,
        normalize_surface_array(
            surface_col.combine_chunks()
            if hasattr(surface_col, "combine_chunks")
            else surface_col
        ),
        "\x00",
    )


def _grp_hash(conv_col, surface_col) -> pa.Array:
    """int64 group key (see schema.stable_hash64) — 8 bytes through the
    shuffle instead of a ~25-byte string, and int joins in the reducers."""
    keys = _grp_keys(conv_col, surface_col)
    return pa.array(
        stable_hash64(keys.to_numpy(zero_copy_only=False)), pa.int64()
    )


def build_tagged(
    linked: ray.data.Dataset,
    triples: ray.data.Dataset,
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """ONE conv-bucketed shuffle → TAGGED (m/t/p rows). Callers materialize."""

    def _bucket_of(t: pa.Table) -> pa.Array:
        return pa.array(
            stable_bucket(
                t["conv_id"].to_numpy(zero_copy_only=False), num_buckets
            ),
            pa.int32(),
        )

    def _m_proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_bucket": _bucket_of(t),
                "grp": _grp_hash(t["conv_id"], t["surface"]),
                "mention_id": t["mention_id"],
                "entity": t["cand_entity_id"],
                "surface": t["surface"],
                "ent_type": t["ent_type"],
            }
        )

    def _t_proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_bucket": _bucket_of(t),
                "sgrp": _grp_hash(t["conv_id"], t["subj_surface"]),
                "ogrp": _grp_hash(t["conv_id"], t["obj_surface"]),
                "pred": t["pred"],
                "ts": t["ts"],
            }
        )

    m_in = linked.map_batches(_m_proj, batch_format="pyarrow", zero_copy_batch=True)
    t_in = triples.map_batches(_t_proj, batch_format="pyarrow", zero_copy_batch=True)

    def _bucket_fn(lt: pa.Table, rt: pa.Table) -> pa.Table:
        import polars as pl

        l = pl.from_arrow(lt.drop_columns(["_bucket"]))
        rt = rt.drop_columns(["_bucket"])
        groups = l.group_by("grp").agg(
            pl.col("mention_id").min().alias("rep"),
            pl.col("entity").drop_nulls().min().alias("min_ent"),
            pl.col("entity").drop_nulls().n_unique().alias("n_ent"),
        )
        m_out = l.join(groups, on="grp", how="left").select(
            pl.lit("m").alias("kind"),
            pl.col("mention_id"),
            pl.col("rep"),
            pl.col("min_ent"),
            pl.col("surface"),
            pl.col("ent_type"),
            pl.lit(None, dtype=pl.String).alias("obj_rep"),
            pl.lit(None, dtype=pl.String).alias("obj_ent"),
            pl.lit(None, dtype=pl.String).alias("pred"),
            pl.lit(None, dtype=pl.Datetime("us")).alias("ts"),
        )
        parts = [m_out]

        r = pl.from_arrow(rt)
        if r.height:
            g = groups.select("grp", "rep", "min_ent")
            t_out = (
                r.join(g, left_on="sgrp", right_on="grp", how="inner")
                .rename({"rep": "srep", "min_ent": "sent"})
                .join(g, left_on="ogrp", right_on="grp", how="inner")
                .select(
                    pl.lit("t").alias("kind"),
                    pl.lit(None, dtype=pl.String).alias("mention_id"),
                    pl.col("srep").alias("rep"),
                    pl.col("sent").alias("min_ent"),
                    pl.lit(None, dtype=pl.String).alias("surface"),
                    pl.lit(None, dtype=pl.String).alias("ent_type"),
                    pl.col("rep").alias("obj_rep"),
                    pl.col("min_ent").alias("obj_ent"),
                    pl.col("pred"),
                    pl.col("ts"),
                )
            )
            parts.append(t_out)

        multi = groups.filter(pl.col("n_ent") >= 2).select("grp", "min_ent")
        if multi.height:
            pairs = (
                l.join(multi, on="grp", how="inner")
                .filter(pl.col("entity").is_not_null())
                .select("min_ent", "entity")
                .unique()
                .filter(pl.col("entity") != pl.col("min_ent"))
                .select(
                    pl.lit("p").alias("kind"),
                    pl.lit(None, dtype=pl.String).alias("mention_id"),
                    pl.lit(None, dtype=pl.String).alias("rep"),
                    pl.col("min_ent"),
                    pl.lit(None, dtype=pl.String).alias("surface"),
                    pl.lit(None, dtype=pl.String).alias("ent_type"),
                    pl.lit(None, dtype=pl.String).alias("obj_rep"),
                    pl.col("entity").alias("obj_ent"),
                    pl.lit(None, dtype=pl.String).alias("pred"),
                    pl.lit(None, dtype=pl.Datetime("us")).alias("ts"),
                )
            )
            parts.append(pairs)
        return pl.concat(parts).to_arrow().cast(TAGGED)

    return cobucket_apply(
        m_in,
        t_in,
        "_bucket",
        "_bucket",
        _bucket_fn,
        num_buckets=num_buckets,
    )


def entity_labels(
    tagged: ray.data.Dataset,
    *,
    num_salts: int = 16,
    broadcast_threshold: int | None = None,
    **cc_kwargs,
):
    """Salted iterative CC over the p-edges → entity→label mapping.

    Size-guarded physical choice: below ``broadcast_threshold`` rows the
    mapping collects to a broadcast dict (one ``ray.put``, O(1) lookups in
    every consumer map task); above it the mapping STAYS a Dataset and
    consumers resolve labels through a co-bucketed shuffle join
    (:func:`_label_join`) — at catalog scale (10^8 entities) a driver-side
    dict would OOM the driver. The label set is bounded by entities that
    appear in merge edges, so the broadcast path is the common case.
    """
    from ..functions.joins import BROADCAST_THRESHOLD_ROWS

    if broadcast_threshold is None:
        broadcast_threshold = BROADCAST_THRESHOLD_ROWS
    merge_edges = tagged.map_batches(
        lambda t: (
            lambda f: pa.table({"src": f["min_ent"], "dst": f["obj_ent"]})
        )(t.filter(pc.equal(t["kind"], "p"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if merge_edges.count() == 0:
        lab: dict[str, str] = {}
        return ray.put(lab) if ray.is_initialized() else lab
    labels = connected_components(
        merge_edges,
        num_salts=num_salts,
        num_partitions=cc_kwargs.pop("num_partitions", None)
        or default_partitions(),
        **cc_kwargs,
    ).materialize()
    if labels.count() > broadcast_threshold:
        return labels  # Dataset path: consumers co-bucket-join
    lab = {r["node"]: r["label"] for r in labels.take_all()}
    return ray.put(lab) if ray.is_initialized() else lab


def _get(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


def _label_join(
    rows: ray.data.Dataset,
    labels: ray.data.Dataset,
    resolve: list[tuple[str, str, str]],
    passthrough: list[str],
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Big–big label resolution: for each ``(ent_col, rep_col, out_col)``
    in ``resolve``, compute ``out_col = label(ent) if ent has a CC label
    else ent if ent non-null else rep`` via ONE co-bucketed shuffle per
    entity column (the scale fallback when the label table exceeds the
    broadcast threshold)."""
    from ..functions.shuffle import cobucket_apply

    out = rows
    for ent_col, rep_col, out_col in resolve:

        def _lbucket(t: pa.Table, ent_col=ent_col) -> pa.Array:
            return pc.coalesce(t[ent_col].combine_chunks(), "")

        def _fn(lt: pa.Table, rt: pa.Table, ent_col=ent_col,
                rep_col=rep_col, out_col=out_col) -> pa.Table:
            import polars as pl

            l = pl.from_arrow(lt)
            r = pl.from_arrow(rt).rename({"node": ent_col, "label": "_lab"})
            j = l.join(r, on=ent_col, how="left")
            j = j.with_columns(
                pl.coalesce([pl.col("_lab"), pl.col(ent_col), pl.col(rep_col)])
                .alias(out_col)
            ).drop("_lab")
            return j.to_arrow()

        out = cobucket_apply(
            out,
            labels,
            _lbucket,
            lambda t: t["node"].combine_chunks(),
            _fn,
            num_buckets=num_buckets,
        )
    keep = passthrough + [o for _, _, o in resolve]
    return out.map_batches(
        lambda t: t.select(keep), batch_format="pyarrow", zero_copy_batch=True
    )


def canon_from_tagged(tagged: ray.data.Dataset, lab_ref) -> ray.data.Dataset:
    if isinstance(lab_ref, ray.data.Dataset):  # big-label co-bucket path
        m = tagged.map_batches(
            lambda t: (
                lambda f: f.select(["mention_id", "min_ent", "rep"])
            )(t.filter(pc.equal(t["kind"], "m"))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        joined = _label_join(
            m, lab_ref,
            [("min_ent", "rep", "canonical_id")],
            ["mention_id"],
        )
        return joined.map_batches(
            lambda t: pa.table(
                {"member_id": t["mention_id"], "canonical_id": t["canonical_id"]}
            ).cast(CANON),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def _emit(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["kind"], "m"))
        lab = _get(lab_ref)
        canon = [
            (lab.get(e, e) if e is not None else r)
            for e, r in zip(f["min_ent"].to_pylist(), f["rep"].to_pylist())
        ]
        return pa.table(
            {"member_id": f["mention_id"], "canonical_id": pa.array(canon, pa.string())}
        ).cast(CANON)

    return tagged.map_batches(_emit, batch_format="pyarrow", zero_copy_batch=True)


def rewritten_from_tagged(tagged: ray.data.Dataset, lab_ref) -> ray.data.Dataset:
    """t-rows → (subj_id, pred, obj_id, ts): input of edge dedup (G1)."""
    if isinstance(lab_ref, ray.data.Dataset):  # big-label co-bucket path
        t_rows = tagged.map_batches(
            lambda t: (
                lambda f: f.select(
                    ["rep", "min_ent", "obj_rep", "obj_ent", "pred", "ts"]
                )
            )(t.filter(pc.equal(t["kind"], "t"))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        joined = _label_join(
            t_rows, lab_ref,
            [("min_ent", "rep", "subj_id"), ("obj_ent", "obj_rep", "obj_id")],
            ["pred", "ts"],
        )
        return joined.map_batches(
            lambda t: t.select(["subj_id", "pred", "obj_id", "ts"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def _emit(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["kind"], "t"))
        lab = _get(lab_ref)

        def _c(ents, reps):
            return pa.array(
                [
                    (lab.get(e, e) if e is not None else r)
                    for e, r in zip(ents.to_pylist(), reps.to_pylist())
                ],
                pa.string(),
            )

        return pa.table(
            {
                "subj_id": _c(f["min_ent"], f["rep"]),
                "pred": f["pred"],
                "obj_id": _c(f["obj_ent"], f["obj_rep"]),
                "ts": f["ts"],
            }
        )

    return tagged.map_batches(_emit, batch_format="pyarrow", zero_copy_batch=True)


def node_rows_from_tagged(tagged: ray.data.Dataset, lab_ref) -> ray.data.Dataset:
    """m-rows → (canonical_id, surface, ent_type): input of node rollup (G2)."""
    if isinstance(lab_ref, ray.data.Dataset):  # big-label co-bucket path
        m = tagged.map_batches(
            lambda t: (
                lambda f: f.select(["min_ent", "rep", "surface", "ent_type"])
            )(t.filter(pc.equal(t["kind"], "m"))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        joined = _label_join(
            m, lab_ref,
            [("min_ent", "rep", "canonical_id")],
            ["surface", "ent_type"],
        )
        return joined.map_batches(
            lambda t: t.select(["canonical_id", "surface", "ent_type"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def _emit(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["kind"], "m"))
        lab = _get(lab_ref)
        canon = pa.array(
            [
                (lab.get(e, e) if e is not None else r)
                for e, r in zip(f["min_ent"].to_pylist(), f["rep"].to_pylist())
            ],
            pa.string(),
        )
        return pa.table(
            {
                "canonical_id": canon,
                "surface": f["surface"],
                "ent_type": f["ent_type"],
            }
        )

    return tagged.map_batches(_emit, batch_format="pyarrow", zero_copy_batch=True)
