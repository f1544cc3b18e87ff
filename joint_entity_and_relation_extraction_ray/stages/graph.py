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


class _CanonRewriter:
    """Actor: the mention→canonical index is built ONCE per actor; each
    batch rewrites BOTH endpoints with two C-speed lookups — one stage
    and one index build instead of two chained joins."""

    def __init__(self, ref):
        import pandas as pd

        t: pa.Table = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        self.index = pd.Index(t["member_id"].to_numpy(zero_copy_only=False))
        self.labels = t["canonical_id"].combine_chunks()

    def __call__(self, batch: pa.Table) -> pa.Table:
        si = self.index.get_indexer(
            batch["subj_mention_id"].to_numpy(zero_copy_only=False)
        )
        oi = self.index.get_indexer(
            batch["obj_mention_id"].to_numpy(zero_copy_only=False)
        )
        keep = (si >= 0) & (oi >= 0)  # inner-join semantics
        sel = batch.filter(pa.array(keep))
        return pa.table(
            {
                "subj_id": self.labels.take(si[keep]),
                "pred": sel["pred"],
                "obj_id": self.labels.take(oi[keep]),
                "ts": sel["ts"],
            }
        )


def rewrite_triples(
    triples: ray.data.Dataset,
    canon: ray.data.Dataset,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """J2: triple endpoints → canonical ids, keyed on mention_id.

    Broadcastable canon (≤ threshold) → single dual-lookup actor stage;
    larger → two shuffle hash joins (the at-scale path).
    """
    from ..functions.joins import BROADCAST_THRESHOLD_ROWS, dataset_to_table
    from ..stages.linker import default_pool_size

    num_partitions = num_partitions or default_partitions()
    canon = canon.materialize()
    if canon.count() <= BROADCAST_THRESHOLD_ROWS:
        ref = (
            ray.put(dataset_to_table(canon))
            if ray.is_initialized()
            else dataset_to_table(canon)
        )
        return triples.map_batches(
            _CanonRewriter,
            fn_constructor_kwargs={"ref": ref},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, default_pool_size()),
        )
    # At-scale path: mention_id is conv-prefixed ("conv:turn:start:end"),
    # so triples and canon CO-PARTITION on the conversation — ONE bucketed
    # shuffle joins BOTH endpoints (the planner's all-to-all JoinOperator
    # stalled at ~10^7-row inputs; conv-bucketing also bounds per-reducer
    # state to a bucket's conversations).
    from ..functions.shuffle import cobucket_apply

    def _conv_of_member(t: pa.Table) -> pa.Array:
        return pc.list_element(pc.split_pattern(t["member_id"], ":"), 0)

    def _join_bucket(lt: pa.Table, rt: pa.Table) -> pa.Table:
        import pandas as pd

        idx = pd.Index(rt["member_id"].to_numpy(zero_copy_only=False))
        labels = rt["canonical_id"].combine_chunks()
        si = idx.get_indexer(lt["subj_mention_id"].to_numpy(zero_copy_only=False))
        oi = idx.get_indexer(lt["obj_mention_id"].to_numpy(zero_copy_only=False))
        keep = (si >= 0) & (oi >= 0)
        sel = lt.filter(pa.array(keep))
        return pa.table(
            {
                "subj_id": labels.take(si[keep]),
                "pred": sel["pred"],
                "obj_id": labels.take(oi[keep]),
                "ts": sel["ts"],
            }
        )

    return cobucket_apply(
        triples.select_columns(
            ["conv_id", "subj_mention_id", "obj_mention_id", "pred", "ts"]
        ),
        canon,
        lambda t: t["conv_id"].combine_chunks(),
        _conv_of_member,
        _join_bucket,
        num_buckets=num_partitions * 4,
    ).select_columns(["subj_id", "pred", "obj_id", "ts"])


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
    from ..functions.joins import BROADCAST_THRESHOLD_ROWS

    canon = canon.materialize()
    if canon.count() <= BROADCAST_THRESHOLD_ROWS:
        j = join_auto(
            linked,
            canon,
            on=("mention_id",),
            right_on=("member_id",),
            num_partitions=num_partitions,
        ).select_columns(["canonical_id", "surface", "ent_type"])
    else:
        # big–big: conv-co-bucketed join (see rewrite_triples)
        from ..functions.shuffle import cobucket_apply

        def _conv_of_member(t: pa.Table) -> pa.Array:
            return pc.list_element(pc.split_pattern(t["member_id"], ":"), 0)

        def _join_bucket(lt: pa.Table, rt: pa.Table) -> pa.Table:
            import pandas as pd

            idx = pd.Index(rt["member_id"].to_numpy(zero_copy_only=False))
            labels = rt["canonical_id"].combine_chunks()
            mi = idx.get_indexer(
                lt["mention_id"].to_numpy(zero_copy_only=False)
            )
            keep = mi >= 0
            sel = lt.filter(pa.array(keep))
            return pa.table(
                {
                    "canonical_id": labels.take(mi[keep]),
                    "surface": sel["surface"],
                    "ent_type": sel["ent_type"],
                }
            )

        j = cobucket_apply(
            linked.select_columns(
                ["conv_id", "mention_id", "surface", "ent_type"]
            ),
            canon,
            lambda t: t["conv_id"].combine_chunks(),
            _conv_of_member,
            _join_bucket,
            num_buckets=num_partitions * 4,
        )

    return node_rollup(
        j, entity_names, num_buckets=num_buckets
    )


def node_rollup(
    rows: ray.data.Dataset,
    entity_names: dict[str, str] | "ray.ObjectRef",
    *,
    num_buckets: int = DEFAULT_WRITE_PARTS,
) -> ray.data.Dataset:
    """G2 rollup over (canonical_id, surface, ent_type) rows → T5 NODES."""

    # partial combiner: distinct (canonical_id, surface, ent_type) + count
    def _partial(t: pa.Table) -> pa.Table:
        agg = t.group_by(["canonical_id", "surface", "ent_type"]).aggregate(
            [("surface", "count")]
        )
        return agg.select(
            ["canonical_id", "surface", "ent_type", "surface_count"]
        ).rename_columns(["canonical_id", "surface", "ent_type", "cnt"])

    partial = rows.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
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
