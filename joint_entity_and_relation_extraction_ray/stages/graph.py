"""Graph materialize: T2 triples ⋈ T4 canon → deduplicated node/edge
Parquet tables partitioned by entity-id hash (SURVEY.md §2.2 J2/G1/G2/S4;
BASELINE.json:6 "graph materialize emits deduplicated node/edge Parquet
tables partitioned by entity-id hash").

Shuffle discipline:
- triple→canonical rewrite is two hash joins keyed on mention_id (J2);
- edge dedup (G1) pre-aggregates INSIDE map_batches (per-batch
  (subj, pred, obj) counts + ts min/max) before the global groupby, so the
  shuffle moves one row per distinct edge per block, not one per triple —
  the partial/combiner pattern that keeps hot predicates from melting a
  reducer;
- the write partition key is `part = stable_hash(entity_id) % num_parts`
  (S4), reused for both nodes (entity_id) and edges (subj_id) so a
  downstream consumer co-locates a node with its out-edges.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum, Unique

from ..functions.joins import join_auto
from ..schema import EDGES, NODES, stable_bucket
from .canonical import default_partitions

DEFAULT_WRITE_PARTS = 64


def rewrite_triples(
    triples: ray.data.Dataset,
    canon: ray.data.Dataset,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """J2: triple endpoints → canonical ids via two mention-keyed joins."""
    num_partitions = num_partitions or default_partitions()
    canon_subj = canon.map_batches(
        lambda t: t.rename_columns(["member_id", "subj_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    canon_obj = canon.map_batches(
        lambda t: t.rename_columns(["member_id", "obj_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j1 = join_auto(
        triples,
        canon_subj,
        on=("subj_mention_id",),
        right_on=("member_id",),
        num_partitions=num_partitions,
    )
    j2 = join_auto(
        j1,
        canon_obj,
        on=("obj_mention_id",),
        right_on=("member_id",),
        num_partitions=num_partitions,
    )
    return j2.select_columns(["subj_id", "pred", "obj_id", "ts"])


def _edge_combiner(batch: pa.Table) -> pa.Table:
    """Per-batch partial: one row per distinct (subj_id, pred, obj_id)."""
    agg = batch.group_by(["subj_id", "pred", "obj_id"]).aggregate(
        [("ts", "count"), ("ts", "min"), ("ts", "max")]
    )
    return agg.select(
        ["subj_id", "pred", "obj_id", "ts_count", "ts_min", "ts_max"]
    ).rename_columns(["subj_id", "pred", "obj_id", "cnt", "first_ts", "last_ts"])


def build_edges(
    rewritten: ray.data.Dataset,
    *,
    num_buckets: int = DEFAULT_WRITE_PARTS,
) -> ray.data.Dataset:
    """G1: dedup identical triples → weighted edges with ts range (T6)."""
    partial = rewritten.map_batches(
        _edge_combiner, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = partial.groupby(["subj_id", "pred", "obj_id"]).aggregate(
        Sum("cnt", alias_name="weight"),
        Min("first_ts", alias_name="first_ts"),
        Max("last_ts", alias_name="last_ts"),
    )

    def _finish(t: pa.Table) -> pa.Table:
        part = pa.array(stable_bucket(t["subj_id"].to_pylist(), num_buckets), pa.int32())
        out = pa.table(
            {
                "subj_id": t["subj_id"],
                "pred": t["pred"],
                "obj_id": t["obj_id"],
                "weight": pc.cast(t["weight"], pa.int64()),
                "first_ts": t["first_ts"],
                "last_ts": t["last_ts"],
                "part": part,
            }
        )
        return out.cast(EDGES)

    return agg.map_batches(_finish, batch_format="pyarrow", zero_copy_batch=True)


def build_nodes(
    linked: ray.data.Dataset,
    canon: ray.data.Dataset,
    entity_names: dict[str, str] | "ray.ObjectRef",
    *,
    num_partitions: int | None = None,
    num_buckets: int = DEFAULT_WRITE_PARTS,
) -> ray.data.Dataset:
    """G2: per-canonical-entity rollup → T5 NODES.

    `entity_names` (entity_id → canonical display name from the alias
    catalog) is a broadcast small side; clusters without a catalog entity
    fall back to their smallest alias. Aliases are the sorted distinct
    surfaces of the cluster's mentions.
    """
    num_partitions = num_partitions or default_partitions()
    j = join_auto(
        linked,
        canon,
        on=("mention_id",),
        right_on=("member_id",),
        num_partitions=num_partitions,
    ).select_columns(["canonical_id", "surface", "ent_type"])

    # partial combiner: distinct (canonical_id, surface, ent_type) + count
    def _partial(t: pa.Table) -> pa.Table:
        agg = t.group_by(["canonical_id", "surface", "ent_type"]).aggregate(
            [("surface", "count")]
        )
        return agg.select(
            ["canonical_id", "surface", "ent_type", "surface_count"]
        ).rename_columns(["canonical_id", "surface", "ent_type", "cnt"])

    partial = j.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial.groupby("canonical_id").aggregate(
        Sum("cnt", alias_name="mention_count"),
        Unique("surface", alias_name="aliases"),
        Min("ent_type", alias_name="ent_type"),
    )

    class _Finish:
        def __init__(self, names_ref):
            if isinstance(names_ref, ray.ObjectRef):
                names_ref = ray.get(names_ref)
            self.names = names_ref

        def __call__(self, t: pa.Table) -> pa.Table:
            eids = t["canonical_id"].to_pylist()
            aliases = [sorted(a) for a in t["aliases"].to_pylist()]
            names = [
                self.names.get(e) or (al[0] if al else e)
                for e, al in zip(eids, aliases)
            ]
            part = pa.array(stable_bucket(eids, num_buckets), pa.int32())
            return pa.table(
                {
                    "entity_id": pa.array(eids, pa.string()),
                    "canonical_name": pa.array(names, pa.string()),
                    "ent_type": t["ent_type"],
                    "mention_count": pc.cast(t["mention_count"], pa.int64()),
                    "aliases": pa.array(aliases, pa.list_(pa.string())),
                    "part": part,
                }
            ).cast(NODES)

    ref = ray.put(entity_names) if (
        ray.is_initialized() and not isinstance(entity_names, ray.ObjectRef)
    ) else entity_names
    return agg.map_batches(
        _Finish,
        fn_constructor_kwargs={"names_ref": ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    )


def write_graph(
    nodes: ray.data.Dataset,
    edges: ray.data.Dataset,
    out_dir: str,
) -> None:
    """S4: partitioned parquet write — one directory per `part` bucket so a
    rerun can skip finished partitions and a consumer can prune by key
    range (SURVEY.md §4.4 'resumable output')."""
    nodes.write_parquet(f"{out_dir}/nodes", partition_cols=["part"])
    edges.write_parquet(f"{out_dir}/edges", partition_cols=["part"])
