"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship KG pipeline on the sf0.001 synthetic transcript
corpus. ``queries()``/``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2), compared by the driver against DuckDB at sf0.01.

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

The KG pipeline's input is the deterministic synthetic transcript corpus
(FIXTURES.md F1; the driver's TPC-H-ish tables lack the transcript shape).
Corpora are generated lazily+atomically under /tmp/kgray_fixtures and the
oracle SQL reads the SAME parquet via DuckDB ``read_parquet`` so both sides
see identical inputs. Generic relational/dedup/text operators run over the
driver's own tables with view-based oracles.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from joint_entity_and_relation_extraction_ray.sources.synth import (
    corpus_dir,
    ensure_corpus,
)

# Generate the corpora the driver will touch at import time, so the oracle
# SQL (which cannot trigger generation) always finds its parquet files.
ensure_corpus("sf0.001")
_SF001 = ensure_corpus("sf0.01")


def entry() -> Any:
    """Flagship KG pipeline on /root/testdata/sf0.001 (≥0 rows, stable
    schema): transcripts → scorer → linking → canonicalization → edges."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    return kg.run_kg("/root/testdata/sf0.001")["edges"]


# ---------------------------------------------------------------------------
# queries / oracle_sql (driver runs both at sf0.01 and compares)
# ---------------------------------------------------------------------------


def _q_extract_mentions(sf_dir: str):
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    ds = kg.mentions_of(kg.extract_for_sf_dir(sf_dir))
    # score is surrogate-model-specific (0.9) — the golden-comparable
    # contract is the span set (SURVEY.md §2.1 R9)
    return ds.select_columns(
        ["conv_id", "turn_idx", "mention_id", "start", "end", "surface", "ent_type"]
    )


def _q_extract_triples(sf_dir: str):
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    ds = kg.triples_of(kg.extract_for_sf_dir(sf_dir))
    return ds.select_columns(
        [
            "conv_id",
            "turn_idx",
            "subj_mention_id",
            "obj_mention_id",
            "subj_surface",
            "pred",
            "obj_surface",
        ]
    )


def _q_link_mentions(sf_dir: str):
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    # link_score excluded: float32-vs-double stringification differs between
    # Arrow and DuckDB; the id mapping is the contract
    return kg.stage(sf_dir, "linked").select_columns(
        ["conv_id", "turn_idx", "mention_id", "surface", "ent_type", "cand_entity_id"]
    )


def _q_canonicalize(sf_dir: str):
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    return kg.stage(sf_dir, "canon")


def _q_kg_edges(sf_dir: str):
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    return kg.stage(sf_dir, "edges").select_columns(
        ["subj_id", "pred", "obj_id", "weight", "first_ts", "last_ts"]
    )


def _q_kg_nodes(sf_dir: str):
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    # aliases (list column) checked in pytest; scalar rollup checked here
    return kg.stage(sf_dir, "nodes").select_columns(
        ["entity_id", "canonical_name", "ent_type", "mention_count"]
    )


def _q_top_entities(sf_dir: str):
    """O2 top-k: 20 highest-mention-count nodes (sort desc + limit)."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    return (
        kg.stage(sf_dir, "nodes")
        .select_columns(["entity_id", "mention_count"])
        .sort(["mention_count", "entity_id"], descending=[True, False])
        .limit(20)
    )


def _q_kg_latest_assertion(sf_dir: str):
    """Temporal-KG compaction: newest object per (subj, pred) — the
    'current belief' view next to the full edge history (SCD-1 keep-
    latest on the rewritten triple stream; stages/graph.py
    latest_assertion)."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        latest_assertion,
    )

    return latest_assertion(kg.stage(sf_dir, "rewritten"))


def _q_lexical_topk(sf_dir: str):
    """Keyword-search top-k over documents (integer term-frequency
    scoring, per-block partial top-k) — see
    `stages/similarity.lexical_topk`."""
    from joint_entity_and_relation_extraction_ray.pipelines.corpus_ops import (
        read_documents,
    )
    from joint_entity_and_relation_extraction_ray.stages.similarity import (
        lexical_topk,
    )

    return lexical_topk(
        read_documents(sf_dir), ("hash", "join", "merge"), k=20
    )


def _q_kg_report(sf_dir: str):
    """One-row KG-build health report (counts, link rate, weight totals)
    — see `pipelines/kg.build_report`."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    return kg.build_report(sf_dir)


def _q_mention_positions(sf_dir: str):
    """Positional profile of extracted mentions per entity type (exact
    distinct conversations) — see `stages/linker.mention_positions`."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.linker import (
        mention_positions,
    )

    return mention_positions(kg.stage(sf_dir, "mentions"))


def _q_kg_ego(sf_dir: str):
    """Induced 1-hop ego network around the deterministic seed (min node
    id) — see `stages/graph.ego_subgraph`."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        ego_subgraph,
    )

    return ego_subgraph(kg.stage(sf_dir, "edges"), hops=1)


def _q_kg_edges_incremental(sf_dir: str):
    """Incremental KG maintenance invariant: the rewritten assertion
    stream splits into two deterministic ingest batches (ts-microsecond
    parity), each builds edges independently, and `stages/graph.py
    merge_edges` folds them — the result must equal the full-corpus
    kg_edges oracle EXACTLY (edge aggregation is a commutative monoid)."""
    import pyarrow as pa
    import pyarrow.compute as _pc

    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        build_edges,
        merge_edges,
    )

    from joint_entity_and_relation_extraction_ray.schema import stable_bucket

    rewritten = kg.stage(sf_dir, "rewritten")

    def _half(parity: int):
        # deterministic, layout-independent batch assignment over the
        # full assertion content: the same edge's assertions land in BOTH
        # batches (different ts), so the merge exercises cross-batch
        # weight summation, not just disjoint union
        def _f(t):
            key = _pc.binary_join_element_wise(
                t["subj_id"],
                t["pred"],
                t["obj_id"],
                _pc.cast(_pc.cast(t["ts"], pa.int64()), pa.string()),
                "\x1f",
            )
            b = stable_bucket(key.to_numpy(zero_copy_only=False), 2)
            return t.filter(_pc.equal(pa.array(b), parity))

        return _f

    a = rewritten.map_batches(
        _half(0), batch_format="pyarrow", zero_copy_batch=True
    )
    b = rewritten.map_batches(
        _half(1), batch_format="pyarrow", zero_copy_batch=True
    )
    merged = merge_edges(build_edges(a, num_buckets=8),
                         build_edges(b, num_buckets=8))
    return merged.select_columns(
        ["subj_id", "pred", "obj_id", "weight", "first_ts", "last_ts"]
    )


def _q_kg_pred_daily(sf_dir: str):
    """KG-construction observability: per (pred, day) assertion counts
    with exact distinct conversations — see `stages/graph.pred_daily`."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        pred_daily,
    )

    return pred_daily(kg.stage(sf_dir, "triples"))


def _q_kg_pred_profile(sf_dir: str):
    """Per-predicate graph profile: distinct edge count, total assertion
    weight, distinct subjects and distinct objects — the relation-level
    statistics a KG publishes next to its ontology. Exact distincts by
    decomposition: per-block distinct (pred, endpoint) pairs → one
    pred-bucketed merge — endpoint ids shuffle once as distinct pairs,
    never per assertion."""
    import polars as pl
    import pyarrow as _pa

    from joint_entity_and_relation_extraction_ray.functions.joins import (
        join_auto,
    )
    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.relational import (
        grouped_summary,
    )

    edges = kg.stage(sf_dir, "edges")
    base = grouped_summary(
        edges.select_columns(["pred", "weight"]),
        by=["pred"],
        aggs={"n_edges": ("weight", "count"), "total_weight": ("weight", "sum")},
        num_buckets=2,
    )

    def _distinct_count(col: str, out: str):
        pairs = bucket_group_apply(
            edges.select_columns(["pred", col]),
            "pred",
            lambda t: pl.from_arrow(t).unique().to_arrow().cast(
                _pa.schema([("pred", _pa.string()), (col, _pa.string())])
            ),
            num_buckets=2,
        )
        return grouped_summary(
            pairs, by=["pred"], aggs={out: (col, "count")}, num_buckets=2
        )

    prof = join_auto(
        base, _distinct_count("subj_id", "n_subj"), on=("pred",)
    )
    prof = join_auto(prof, _distinct_count("obj_id", "n_obj"), on=("pred",))
    return prof.map_batches(
        lambda t: t.select(
            ["pred", "n_edges", "total_weight", "n_subj", "n_obj"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _q_kg_pred_signatures(sf_dir: str):
    """Ontology profiling: triple counts per (pred, subj ent_type, obj
    ent_type) — the type-signature audit run before committing a KG
    schema (a signature with tiny support flags extraction noise). Two
    mention_id joins (join_auto) attach endpoint types, then one
    combiner-first grouped count."""
    from joint_entity_and_relation_extraction_ray.functions.joins import (
        join_auto,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.relational import (
        grouped_summary,
    )

    triples = kg.stage(sf_dir, "triples").select_columns(
        ["subj_mention_id", "obj_mention_id", "pred"]
    )
    types = kg.stage(sf_dir, "mentions").select_columns(
        ["mention_id", "ent_type"]
    )
    j = join_auto(
        triples, types, on=("subj_mention_id",), right_on=("mention_id",)
    ).map_batches(
        lambda t: t.rename_columns(
            ["subj_type" if c == "ent_type" else c for c in t.schema.names]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j = join_auto(
        j, types, on=("obj_mention_id",), right_on=("mention_id",)
    ).map_batches(
        lambda t: t.rename_columns(
            ["obj_type" if c == "ent_type" else c for c in t.schema.names]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return grouped_summary(
        j,
        by=["pred", "subj_type", "obj_type"],
        aggs={"n": ("pred", "count")},
        num_buckets=4,
    )


def _q_mention_contexts(sf_dir: str):
    """±20-char context snippets around every extracted mention — the
    disambiguation/training-example view (stages/linker.py
    mention_contexts: one (conv, turn) join + vectorized str.slice)."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )
    from joint_entity_and_relation_extraction_ray.stages.linker import (
        mention_contexts,
    )

    turns = read_transcripts(str(kg.corpus_for_sf_dir(sf_dir) / "transcripts"))
    return mention_contexts(kg.stage(sf_dir, "mentions"), turns, ctx_chars=20)


def _q_kg_negatives(sf_dir: str):
    """Corrupt-tail training negatives for link prediction
    (stages/graph.py negative_samples) — oracle-backed: the corrupted
    object is drawn by md5-60 over the rank-ordered entity universe, so
    the DuckDB oracle replays the identical draws; the contract pytest
    additionally pins determinism, layout-independence and
    never-a-true-edge."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        negative_samples,
    )

    return negative_samples(kg.stage(sf_dir, "edges"), k=2)


def _q_kg_labelprop(sf_dir: str):
    """Deterministic synchronous label-propagation communities
    (stages/graph.py label_propagation) — exact (node, label) strings,
    oracle-backed: the recursive-CTE oracle replays the same
    vote/argmax rounds under the engine's 10-round cap (post-fixpoint
    rounds are no-ops, so early exit ≡ cap)."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        label_propagation,
    )

    return label_propagation(kg.stage(sf_dir, "edges"))


def _q_kg_jaccard(sf_dir: str):
    """Neighbor-Jaccard link prediction in exact integers (stages/graph.py
    jaccard_similarity): (u, v, n_common, deg_u, deg_v)."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        jaccard_similarity,
    )

    return jaccard_similarity(kg.stage(sf_dir, "edges"), min_common=2)


def _q_kg_katz(sf_dir: str):
    """Truncated Katz centrality in exact integers (stages/graph.py
    katz_centrality): length-k walk counts attenuated by per-term
    right-shifts (α = 1/4) — int sums only, oracle hash-exact."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        katz_centrality,
    )

    return katz_centrality(kg.stage(sf_dir, "edges"), hops=6)


def _q_kg_adamic_adar(sf_dir: str):
    """Adamic–Adar + Resource-Allocation link prediction in exact int64
    fixed-point (stages/graph.adamic_adar): per shared neighbor z the
    weights floor(1e12/ln(deg_z)) and 1e12//deg_z are integers, pair
    scores are integer sums — oracle hash-exact."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        adamic_adar,
    )

    return adamic_adar(kg.stage(sf_dir, "edges"), min_common=2)


def _q_kg_kcore(sf_dir: str):
    """2-core of the KG (iterative peel; stages/graph.py kcore) — exact
    integers, oracle-backed: the recursive CTE carries the surviving
    edge set each round (deletion fixpoint under the engine's iteration
    cap; post-fixpoint rounds re-emit the same set, so cap ≡ early
    exit) and reads off per-node core degrees at the cap."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import kcore

    return kcore(kg.stage(sf_dir, "edges"), k=2)


def _q_kg_eval_triples(sf_dir: str):
    """J4/R10: distributed exact-match eval of extracted triples vs the
    golden set → one row (n_pred, n_gold, tp); P/R≥0.95 contract derives
    from these integers (here exact: tp == n_pred == n_gold)."""
    import ray.data

    from joint_entity_and_relation_extraction_ray.functions.eval import prf_counts
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.sources.synth import (
        corpus_for_sf_dir,
    )

    keys = ["conv_id", "turn_idx", "subj_surface", "pred", "obj_surface"]
    golden = ray.data.read_parquet(
        str(corpus_for_sf_dir(sf_dir) / "golden_triples")
    )
    return prf_counts(kg.stage(sf_dir, "triples"), golden, keys)


def _q_kg_eval_by_pred(sf_dir: str):
    """R10 per-predicate breakdown: distributed per-group exact-match eval
    → (pred, n_pred, n_gold, tp) rows; the P/R contract holds per predicate
    (here exact: tp == n_pred == n_gold for every predicate)."""
    import ray.data

    from joint_entity_and_relation_extraction_ray.functions.eval import (
        prf_counts_by,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.sources.synth import (
        corpus_for_sf_dir,
    )

    keys = ["conv_id", "turn_idx", "subj_surface", "pred", "obj_surface"]
    golden = ray.data.read_parquet(
        str(corpus_for_sf_dir(sf_dir) / "golden_triples")
    )
    return prf_counts_by(kg.stage(sf_dir, "triples"), golden, keys, by="pred")


def _q_kg_eval_mentions(sf_dir: str):
    """R9: distributed exact-match eval of extracted mention SPANS vs the
    golden set → one row (n_pred, n_gold, tp); the NER-side P/R contract
    (here exact: tp == n_pred == n_gold)."""
    import ray.data

    from joint_entity_and_relation_extraction_ray.functions.eval import prf_counts
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.sources.synth import (
        corpus_for_sf_dir,
    )

    keys = ["conv_id", "turn_idx", "start", "end", "ent_type"]
    golden = ray.data.read_parquet(
        str(corpus_for_sf_dir(sf_dir) / "golden_mentions")
    )
    return prf_counts(kg.stage(sf_dir, "mentions"), golden, keys)


def _q_kg_two_hop(sf_dir: str):
    """Graph path query: 2-hop path counts per predicate pair over the
    materialized edges (co-bucketed self-join on the hop vertex; only
    |preds|^2-sized partials ever leave a bucket)."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        two_hop_pred_counts,
    )

    return two_hop_pred_counts(kg.stage(sf_dir, "edges"))


def _q_kg_pred_roles(sf_dir: str):
    """Provenance rollup: per (pred, role) the number of supporting
    triple assertions — triples join BACK to the T0 transcripts on
    (conv_id, turn_idx), the per-row invariant key every intermediate
    row carries (SURVEY §1.2). One conv-co-bucketed shuffle joins the
    two sides, each bucket reduces to |preds|×|roles| partials, a tiny
    second shuffle sums them; neither table is ever collected."""
    import polars as pl
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
        cobucket_apply,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )

    triples = kg.stage(sf_dir, "triples").select_columns(
        ["conv_id", "turn_idx", "pred"]
    )
    turns = read_transcripts(
        str(kg.corpus_for_sf_dir(sf_dir) / "transcripts")
    ).select_columns(["conv_id", "turn_idx", "role"])

    OUT = pa.schema(
        [
            ("pred", pa.string()),
            ("role", pa.string()),
            ("n_assertions", pa.int64()),
        ]
    )

    def _join(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if not lt.num_rows or not rt.num_rows:
            return OUT.empty_table()
        out = (
            pl.from_arrow(lt)
            .join(pl.from_arrow(rt), on=["conv_id", "turn_idx"])
            .group_by(["pred", "role"])
            .agg(pl.len().cast(pl.Int64).alias("n_assertions"))
        )
        return out.select(["pred", "role", "n_assertions"]).to_arrow().cast(OUT)

    partials = cobucket_apply(
        triples,
        turns,
        lambda t: t["conv_id"].combine_chunks(),
        lambda t: t["conv_id"].combine_chunks(),
        _join,
        num_buckets=32,
    )

    def _with_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "_gkey", pc.binary_join_element_wise(t["pred"], t["role"], "\x00")
        )

    keyed = partials.map_batches(
        _with_key, batch_format="pyarrow", zero_copy_batch=True
    )

    def _merge(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.drop_columns(["_gkey"]))
            .group_by(["pred", "role"])
            .agg(pl.col("n_assertions").sum())
            .to_arrow()
            .cast(OUT)
        )

    return bucket_group_apply(keyed, "_gkey", _merge, num_buckets=4)


def _q_kg_pred_rules(sf_dir: str):
    """Association rules over per-CONVERSATION predicate baskets — the
    generic basket-rules operator (`stages/events.association_rules`)
    re-instantiated on KG triples by column projection alone: basket =
    the set of predicates asserted in a conversation; confidence/lift in
    exact integer ppm say which relation types travel together."""
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.events import (
        association_rules,
    )

    triples = kg.stage(sf_dir, "triples")

    def _proj(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["conv_id"], "event_type": t["pred"]})

    baskets = triples.map_batches(
        _proj, batch_format="pyarrow", zero_copy_batch=True
    )
    return association_rules(baskets)


def _q_kg_temporal_two_hop(sf_dir: str):
    """Time-respecting 2-hop path counts per predicate pair: of the
    a->b->c paths, how many have hop-1 first asserted no later than
    hop-2 (graph.py temporal_two_hop_counts; same co-bucketed self-join
    as kg_two_hop with the int64 first_ts riding the shuffle)."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        temporal_two_hop_counts,
    )

    return temporal_two_hop_counts(kg.stage(sf_dir, "edges"))


def _q_kg_triangles(sf_dir: str):
    """Exact triangle count of the undirected KG graph — degree-ordered
    wedge counting (each out-neighborhood bounded by O(sqrt(m)) after
    orientation; wedges semi-join the oriented edge set)."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        triangle_count,
    )

    return triangle_count(kg.stage(sf_dir, "edges"))


def _q_kg_pagerank(sf_dir: str):
    """Iterative PageRank over the materialized edges in EXACT int64
    fixed-point (ranks in parts-per-10¹²): integer sums are reduction-
    order-independent, so the result is bit-reproducible and the DuckDB
    recursive-CTE oracle mirrors every floor division term-for-term —
    the float path stays numpy-oracle-pinned in tests/test_graph.py."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import pagerank

    return pagerank(kg.stage(sf_dir, "edges"), iters=10, fixed_point=True)


def _q_conv_kg_profile(sf_dir: str):
    """Ingest lineage: what each conversation contributed to the KG —
    triple count, distinct predicates, distinct LINKED entities. The
    per-source attribution a KG curator uses to trace a bad edge back
    to its conversations (and to rank conversations by graph yield).
    Two partial streams (triples → (conv, pred, n); linked mentions →
    distinct (conv, entity)) union into ONE conv-bucketed merge."""
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    part_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("kind", pa.string()),
            ("key", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def _t_partial(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return part_schema.empty_table()
        return (
            pl.from_arrow(t.select(["conv_id", "pred"]))
            .group_by(["conv_id", "pred"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .select(
                pl.col("conv_id"),
                pl.lit("t").alias("kind"),
                pl.col("pred").alias("key"),
                pl.col("n"),
            )
            .to_arrow()
            .cast(part_schema)
        )

    def _m_partial(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return part_schema.empty_table()
        return (
            pl.from_arrow(t.select(["conv_id", "cand_entity_id"]))
            .drop_nulls("cand_entity_id")
            .unique()
            .select(
                pl.col("conv_id"),
                pl.lit("e").alias("kind"),
                pl.col("cand_entity_id").alias("key"),
                pl.lit(1, dtype=pl.Int64).alias("n"),
            )
            .to_arrow()
            .cast(part_schema)
        )

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        out_schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("n_triples", pa.int64()),
                ("n_preds", pa.int64()),
                ("n_entities", pa.int64()),
            ]
        )
        if not t.num_rows:
            return out_schema.empty_table()
        df = pl.from_arrow(t)
        tri = (
            df.filter(pl.col("kind") == "t")
            .group_by(["conv_id", "key"])
            .agg(pl.col("n").sum())
            .group_by("conv_id")
            .agg(
                pl.col("n").sum().alias("n_triples"),
                pl.len().cast(pl.Int64).alias("n_preds"),
            )
        )
        ent = (
            df.filter(pl.col("kind") == "e")
            .unique(subset=["conv_id", "key"])
            .group_by("conv_id")
            .agg(pl.len().cast(pl.Int64).alias("n_entities"))
        )
        return (
            tri.join(ent, on="conv_id", how="full", coalesce=True)
            .select(
                pl.col("conv_id"),
                pl.col("n_triples").fill_null(0),
                pl.col("n_preds").fill_null(0),
                pl.col("n_entities").fill_null(0),
            )
            .to_arrow()
            .cast(out_schema)
        )

    triples = kg.stage(sf_dir, "triples")
    linked = kg.stage(sf_dir, "linked")
    partials = triples.map_batches(
        _t_partial, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        linked.map_batches(
            _m_partial, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    return bucket_group_apply(partials, "conv_id", _merge, num_buckets=16)


def _q_kg_entity_page(sf_dir: str):
    """Entity-page serving table: per entity — out/in degree and weight
    totals, distinct outgoing predicates, and the dominant outgoing
    predicate by total weight (ties → pred asc). The denormalized row an
    entity page renders without touching the edge table at query time.
    One entity-bucketed shuffle of direction-tagged per-block partials;
    both directions and the predicate argmax fold in the same merge."""
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    edges = kg.stage(sf_dir, "edges").select_columns(
        ["subj_id", "pred", "obj_id", "weight"]
    )

    part_schema = pa.schema(
        [
            ("e", pa.string()),
            ("dir", pa.string()),
            ("pred", pa.string()),
            ("n", pa.int64()),
            ("w", pa.int64()),
        ]
    )

    def _partial(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return part_schema.empty_table()
        df = pl.from_arrow(t)
        o = (
            df.group_by(["subj_id", "pred"])
            .agg(
                pl.len().cast(pl.Int64).alias("n"),
                pl.col("weight").cast(pl.Int64).sum().alias("w"),
            )
            .select(
                pl.col("subj_id").alias("e"),
                pl.lit("o").alias("dir"),
                pl.col("pred"),
                pl.col("n"),
                pl.col("w"),
            )
        )
        i = (
            df.group_by("obj_id")
            .agg(
                pl.len().cast(pl.Int64).alias("n"),
                pl.col("weight").cast(pl.Int64).sum().alias("w"),
            )
            .select(
                pl.col("obj_id").alias("e"),
                pl.lit("i").alias("dir"),
                pl.lit(None, dtype=pl.String).alias("pred"),
                pl.col("n"),
                pl.col("w"),
            )
        )
        return pl.concat([o, i]).to_arrow().cast(part_schema)

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        out_schema = pa.schema(
            [
                ("entity_id", pa.string()),
                ("out_deg", pa.int64()),
                ("out_weight", pa.int64()),
                ("in_deg", pa.int64()),
                ("in_weight", pa.int64()),
                ("n_preds", pa.int64()),
                ("top_pred", pa.string()),
            ]
        )
        if not t.num_rows:
            return out_schema.empty_table()
        df = (
            pl.from_arrow(t)
            .group_by(["e", "dir", "pred"])
            .agg(pl.col("n").sum(), pl.col("w").sum())
        )
        o = df.filter(pl.col("dir") == "o")
        osum = (
            o.sort(["e", "w", "pred"], descending=[False, True, False])
            .group_by("e", maintain_order=True)
            .agg(
                pl.col("n").sum().alias("out_deg"),
                pl.col("w").sum().alias("out_weight"),
                pl.len().cast(pl.Int64).alias("n_preds"),
                pl.col("pred").first().alias("top_pred"),
            )
        )
        isum = (
            df.filter(pl.col("dir") == "i")
            .group_by("e")
            .agg(
                pl.col("n").sum().alias("in_deg"),
                pl.col("w").sum().alias("in_weight"),
            )
        )
        j = osum.join(isum, on="e", how="full", coalesce=True)
        return (
            j.select(
                pl.col("e").alias("entity_id"),
                pl.col("out_deg").fill_null(0),
                pl.col("out_weight").fill_null(0),
                pl.col("in_deg").fill_null(0),
                pl.col("in_weight").fill_null(0),
                pl.col("n_preds").fill_null(0),
                pl.col("top_pred"),
            )
            .to_arrow()
            .cast(out_schema)
        )

    partials = edges.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucket_group_apply(partials, "e", _merge, num_buckets=16)


KG_ASOF_CUTOFF = "2024-01-15 00:00:00"


def _q_kg_asof(sf_dir: str):
    """Time-travel KG: the edge table AS OF a cutoff — assertions with
    ts ≤ T re-aggregate into (subj, pred, obj, weight, first/last ts),
    giving the graph as it stood at T (weights count only assertions
    seen by then). The filter pushes down BEFORE the edge combiner, so
    the shuffle only ever carries the as-of subset."""
    import datetime as _dt

    import pyarrow as pa
    import pyarrow.compute as _pc

    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        build_edges,
    )

    cutoff = _dt.datetime.fromisoformat(KG_ASOF_CUTOFF)

    def _before(t: pa.Table) -> pa.Table:
        return t.filter(
            _pc.less_equal(t["ts"], pa.scalar(cutoff, t["ts"].type))
        )

    rewritten = kg.stage(sf_dir, "rewritten").map_batches(
        _before, batch_format="pyarrow", zero_copy_batch=True
    )
    return build_edges(rewritten).select_columns(
        ["subj_id", "pred", "obj_id", "weight", "first_ts", "last_ts"]
    )


def _q_kg_pagerank_weighted(sf_dir: str):
    """Weighted PageRank: rank splits over out-edges proportionally to
    the KG assertion multiplicity (edge `weight`) — int64 fixed-point
    (contribution = rank·w // Σw), bit-reproducible, with a DuckDB
    recursive-CTE oracle; float path numpy-pinned in tests/test_graph."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import pagerank

    return pagerank(
        kg.stage(sf_dir, "edges"),
        iters=10,
        weight_col="weight",
        fixed_point=True,
    )


def _q_kg_ppr(sf_dir: str):
    """Personalized PageRank from the deterministic seed (min node id) —
    the "entities related to X" serving query, in int64 fixed-point
    (all teleport mass restarts on the seed; every floor division
    mirrored by the recursive-CTE oracle); float path numpy-pinned in
    tests/test_graph.py."""
    import pyarrow as pa
    import pyarrow.compute as _pc

    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import pagerank

    edges = kg.stage(sf_dir, "edges")

    def _block_min(t: pa.Table) -> pa.Table:
        cands = [
            v
            for v in (
                _pc.min(t["subj_id"]).as_py(),
                _pc.min(t["obj_id"]).as_py(),
            )
            if v is not None
        ]
        return pa.table(
            {"m": pa.array([min(cands)] if cands else [], pa.string())}
        )

    mins = edges.map_batches(_block_min, batch_format="pyarrow").take_all()
    seed = min(r["m"] for r in mins)
    return pagerank(edges, iters=10, seeds=[seed], fixed_point=True)


def _q_kg_hits(sf_dir: str):
    """HITS hubs & authorities over the KG edges in EXACT int64
    fixed-point (scores in parts-per-10¹², normalization by the
    ceil(T/scale) divisor) — bit-reproducible, mirrored term-for-term
    by a DuckDB recursive-CTE oracle; the float L2 path stays
    numpy-oracle-pinned in tests/test_graph.py."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import hits

    return hits(kg.stage(sf_dir, "edges"), iters=8, fixed_point=True)


def _q_kg_hyperball(sf_dir: str):
    """HyperBall 4-hop reachability-ball estimates per node — md5-60
    registers and the exact-integer Z⁻¹ estimator are recomputed
    IDENTICALLY by the DuckDB oracle (approximate algorithm, exact
    oracle); accuracy vs an exact per-node BFS oracle is additionally
    pinned in tests/test_graph.py."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        hyperball,
    )

    return hyperball(kg.stage(sf_dir, "edges"), hops=4)


def _q_kg_neighborhood(sf_dir: str):
    """Neighborhood function N(t) for t=0..6 over the KG — the
    distance-distribution / effective-diameter summary; the md5-60
    HyperBall registers and per-node integer estimates are recomputed
    exactly by the DuckDB oracle; monotonicity + accuracy vs exact BFS
    pinned in tests/test_graph.py."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        neighborhood_function,
    )

    return neighborhood_function(kg.stage(sf_dir, "edges"), hops=6)


def _q_kg_harmonic(sf_dir: str):
    """HyperBall truncated harmonic centrality over in-balls — exact
    oracle-backed: the DuckDB oracle rebuilds the md5-60 registers,
    per-hop integer estimates and the left-associated 1/t delta sum
    bit-identically; accuracy vs the exact truncated harmonic
    centrality is pinned in tests/test_graph.py."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        harmonic_centrality_est,
    )

    return harmonic_centrality_est(kg.stage(sf_dir, "edges"), hops=4)


def _q_kg_components(sf_dir: str):
    """Connected components of the undirected KG (node → component =
    lexicographic min entity id in the component) — the same salted
    iterative min-label CC that canonicalization uses, here exposed as a
    graph query with an exact recursive-CTE SQL oracle."""
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.canonical import (
        connected_components,
    )

    edges = kg.stage(sf_dir, "edges").map_batches(
        lambda t: pa.table({"src": t["subj_id"], "dst": t["obj_id"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return connected_components(edges).map_batches(
        lambda t: pa.table({"node": t["node"], "component": t["label"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _q_kg_component_sizes(sf_dir: str):
    """Component-size histogram (size → n_components) over the
    undirected KG — the fragmentation diagnostic: one giant component
    plus dust is healthy, many mid-size islands means linking is
    under-merging. Two tiny count shuffles over the CC labels."""
    import polars as pl
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )

    labels = _q_kg_components(sf_dir)
    SIZE = pa.schema([("component", pa.string()), ("n", pa.int64())])
    OUT = pa.schema([("size", pa.int64()), ("n_components", pa.int64())])

    def _sz_partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["component"]))
            .group_by("component")
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
            .cast(SIZE)
        )

    def _sz_merge(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return SIZE.empty_table()
        return (
            pl.from_arrow(t)
            .group_by("component")
            .agg(pl.col("n").sum())
            .to_arrow()
            .cast(SIZE)
        )

    def _hist(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return OUT.empty_table()
        return (
            pl.from_arrow(t)
            .group_by("n")
            .agg(pl.len().cast(pl.Int64).alias("n_components"))
            .rename({"n": "size"})
            .to_arrow()
            .cast(OUT)
        )

    def _hist_merge(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return OUT.empty_table()
        return (
            pl.from_arrow(t)
            .group_by("size")
            .agg(pl.col("n_components").sum())
            .to_arrow()
            .cast(OUT)
        )

    sizes = bucket_group_apply(
        labels.map_batches(
            _sz_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "component",
        _sz_merge,
    )
    return bucket_group_apply(
        sizes.map_batches(
            _hist, batch_format="pyarrow", zero_copy_batch=True
        ),
        "size",
        _hist_merge,
        num_buckets=4,
    )


def _q_kg_hop_hist(sf_dir: str):
    """Hop-distance histogram from the deterministic BFS seed (dist →
    n_nodes) — the reachability profile; derivative of kg_bfs."""
    import polars as pl
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        bfs_distances,
    )

    OUT = pa.schema([("dist", pa.int64()), ("n_nodes", pa.int64())])

    def _hist(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return OUT.empty_table()
        return (
            pl.from_arrow(t.select(["dist"]))
            .group_by("dist")
            .agg(pl.len().cast(pl.Int64).alias("n_nodes"))
            .to_arrow()
            .cast(OUT)
        )

    def _merge(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return OUT.empty_table()
        return (
            pl.from_arrow(t)
            .group_by("dist")
            .agg(pl.col("n_nodes").sum())
            .to_arrow()
            .cast(OUT)
        )

    d = bfs_distances(kg.stage(sf_dir, "edges"), max_hops=6)
    return bucket_group_apply(
        d.map_batches(_hist, batch_format="pyarrow", zero_copy_batch=True),
        "dist",
        _merge,
        num_buckets=4,
    )


def _q_kg_rpq_typed(sf_dir: str):
    """Typed property path (SPARQL `?s a :T1 . ?s p1/p2* ?o . ?o a :T2`
    shape): the kg_rpq pair set annotated with endpoint entity types
    and restricted to the lexicographic-min OBSERVED source and
    destination types — parameter-free and non-empty by construction.
    regular_path_pairs + two type-fetch joins (join_auto: broadcast
    under the guard) + a tiny min reduction for the type pick."""
    import pyarrow as pa
    import pyarrow.compute as _pc

    from joint_entity_and_relation_extraction_ray.functions.joins import (
        join_auto,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        regular_path_pairs,
    )

    nodes = kg.stage(sf_dir, "nodes").select_columns(
        ["entity_id", "ent_type"]
    ).materialize()

    pairs = regular_path_pairs(kg.stage(sf_dir, "edges"), max_star_hops=3)
    st = nodes.map_batches(
        lambda t: pa.table({"src": t["entity_id"], "st": t["ent_type"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    dt = nodes.map_batches(
        lambda t: pa.table({"dst": t["entity_id"], "dt": t["ent_type"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    typed = join_auto(
        join_auto(pairs, st, on=("src",)), dt, on=("dst",)
    ).materialize()

    mins = typed.map_batches(
        lambda t: pa.table(
            {
                "lo_s": pa.array([_pc.min(t["st"]).as_py()], pa.string()),
                "lo_d": pa.array([_pc.min(t["dt"]).as_py()], pa.string()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()  # one row per block — tiny by construction
    want_s = min(r["lo_s"] for r in mins if r["lo_s"] is not None)
    want_d = min(r["lo_d"] for r in mins if r["lo_d"] is not None)

    return typed.map_batches(
        lambda t: t.filter(
            _pc.and_(
                _pc.equal(t["st"], want_s), _pc.equal(t["dt"], want_d)
            )
        ).select(["src", "dst", "hops"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _q_kg_closure_quantiles(sf_dir: str):
    """Exact quartiles of triangle closure time: the composable
    `graph.triangle_close_stream` feeding the distributed exact
    discrete-quantile operator (`relational.value_quantiles` — the
    quantile_disc contract) — raw closure values never leave their
    blocks, only the (value, count) histogram shuffles."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        triangle_close_stream,
    )
    from joint_entity_and_relation_extraction_ray.stages.relational import (
        value_quantiles,
    )

    return value_quantiles(
        triangle_close_stream(kg.stage(sf_dir, "edges")),
        "close_us",
        [0.25, 0.5, 0.75],
    )


def _q_kg_pred_anomalies(sf_dir: str):
    """Assertion-volume anomaly days per predicate: the exact-integer
    2σ inequality from q_event_anomalies re-instantiated on the
    rewritten KG stream by projection (corpus_ops.daily_anomalies_over
    with pred as the key)."""
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.pipelines.corpus_ops import (
        daily_anomalies_over,
    )

    proj = kg.stage(sf_dir, "rewritten").map_batches(
        lambda t: pa.table({"event_type": t["pred"], "ts": t["ts"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return daily_anomalies_over(proj).map_batches(
        lambda t: pa.table(
            {
                "pred": t["event_type"],
                "day": t["day"],
                "n_assertions": t["n_events"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _q_conv_first_assertion(sf_dir: str):
    """Latency-to-signal per conversation: microseconds from the
    conversation's first turn to its first extracted triple (convs
    without triples excluded) — two decomposable min combiners meeting
    in one conv-bucketed merge."""
    import polars as pl
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )

    PART = pa.schema(
        [
            ("conv_id", pa.string()),
            ("kind", pa.int32()),  # 0 = turn, 1 = triple
            ("us", pa.int64()),
        ]
    )

    def _mins(kind: int):
        def _f(t: pa.Table) -> pa.Table:
            return (
                pl.from_arrow(t.select(["conv_id", "ts"]))
                .group_by("conv_id")
                .agg(pl.col("ts").cast(pl.Int64).min().alias("us"))
                .with_columns(kind=pl.lit(kind, dtype=pl.Int32))
                .select(["conv_id", "kind", "us"])
                .to_arrow()
                .cast(PART)
            )

        return _f

    corpus = kg.corpus_for_sf_dir(sf_dir)
    t0 = read_transcripts(str(corpus / "transcripts")).map_batches(
        _mins(0), batch_format="pyarrow", zero_copy_batch=True
    )
    tr = kg.triples_of(kg.extract_for_sf_dir(sf_dir)).map_batches(
        _mins(1), batch_format="pyarrow", zero_copy_batch=True
    )

    OUT = pa.schema([("conv_id", pa.string()), ("latency_us", pa.int64())])

    def _merge(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return OUT.empty_table()
        df = (
            pl.from_arrow(t)
            .group_by(["conv_id", "kind"])
            .agg(pl.col("us").min())
            .pivot(on="kind", index="conv_id", values="us")
        )
        cols = df.columns
        if "1" not in cols:
            return OUT.empty_table()
        out = (
            df.filter(pl.col("1").is_not_null())
            .select(
                pl.col("conv_id"),
                (pl.col("1") - pl.col("0")).alias("latency_us"),
            )
        )
        return out.to_arrow().cast(OUT)

    return bucket_group_apply(t0.union(tr), "conv_id", _merge)


def _q_kg_dyad_census(sf_dir: str):
    """Holland–Leinhardt dyad census of the directed KG: mutual,
    asymmetric and null unordered pairs (null = all-pairs minus
    connected) — one row of exact integers. One canonical-pair-bucketed
    count shuffle + a distinct-node count; no pair enumeration for the
    null term (it is arithmetic)."""
    import polars as pl
    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.relational import (
        distinct_keys,
    )

    edges = kg.stage(sf_dir, "edges").materialize()
    SEP = "\x00"
    PART = pa.schema([("key", pa.string()), ("fwd", pa.bool_())])

    def _dirs(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["subj_id", "obj_id"]))
        return (
            df.filter(pl.col("subj_id") != pl.col("obj_id"))
            .select(
                key=pl.min_horizontal("subj_id", "obj_id")
                + pl.lit(SEP)
                + pl.max_horizontal("subj_id", "obj_id"),
                fwd=pl.col("subj_id") < pl.col("obj_id"),
            )
            .unique()
            .to_arrow()
            .cast(PART)
        )

    CNT = pa.schema([("mutual", pa.int64()), ("asym", pa.int64())])

    def _census(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return CNT.empty_table()
        d = (
            pl.from_arrow(t)
            .unique()
            .group_by("key")
            .agg(pl.len().alias("nd"))
        )
        return pa.table(
            {
                "mutual": pa.array(
                    [int((d["nd"] == 2).sum())], pa.int64()
                ),
                "asym": pa.array([int((d["nd"] == 1).sum())], pa.int64()),
            }
        )

    parts = bucket_group_apply(
        edges.map_batches(
            _dirs, batch_format="pyarrow", zero_copy_batch=True
        ),
        "key",
        _census,
    ).take_all()  # ≤ num_buckets rows — tiny by construction
    mutual = sum(r["mutual"] for r in parts)
    asym = sum(r["asym"] for r in parts)

    # distinct nodes over both endpoints for the null term
    subj = edges.map_batches(
        lambda t: pa.table({"node": t["subj_id"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    obj = edges.map_batches(
        lambda t: pa.table({"node": t["obj_id"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    n_nodes = distinct_keys(subj.union(obj), "node").count()
    null = n_nodes * (n_nodes - 1) // 2 - mutual - asym
    return ray.data.from_arrow(
        pa.table(
            {
                "n_nodes": pa.array([n_nodes], pa.int64()),
                "mutual": pa.array([mutual], pa.int64()),
                "asym": pa.array([asym], pa.int64()),
                "null_dyads": pa.array([null], pa.int64()),
            }
        )
    )


def _q_kg_squares(sf_dir: str):
    """Exact 4-cycle count of the undirected simple KG via the
    diagonal-pair identity N_C4 = Σ_{u<v} C(cn(u,v), 2) / 2 (every
    square is counted once per diagonal pair; the sum is even by
    construction) — pure reuse of `graph.common_neighbor_counts`
    (min_common=2 loses nothing: C(0..1, 2) = 0), one per-block partial
    fold on top. n_triangles' quadrilateral sibling."""
    import pyarrow as pa
    import pyarrow.compute as _pc
    import ray.data

    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        common_neighbor_counts,
    )

    cn = common_neighbor_counts(kg.stage(sf_dir, "edges"), min_common=2)

    def _partial(t: pa.Table) -> pa.Table:
        c = t["n_common"]
        pairs = _pc.divide(
            _pc.multiply(c, _pc.subtract(c, 1)), 2
        )
        return pa.table(
            {"s": pa.array([_pc.sum(pairs).as_py() or 0], pa.int64())}
        )

    parts = cn.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # one row per block — tiny by construction
    total = sum(r["s"] for r in parts)
    return ray.data.from_arrow(
        pa.table({"n_squares": pa.array([total // 2], pa.int64())})
    )


def _q_kg_outdeg_hist(sf_dir: str):
    """Per-predicate out-degree histogram (pred, out_deg, n_subjects) —
    the fan-out profile that separates functional predicates (mass at
    1) from hub-forming ones; two count shuffles over int partials."""
    import polars as pl
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    edges = kg.stage(sf_dir, "edges")
    SEP = "\x00"
    PART = pa.schema([("sp", pa.string()), ("n", pa.int64())])
    OUT = pa.schema(
        [
            ("pred", pa.string()),
            ("out_deg", pa.int64()),
            ("n_subjects", pa.int64()),
        ]
    )

    def _partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["subj_id", "pred"]))
            .group_by(["subj_id", "pred"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .select(
                sp=pl.col("subj_id") + pl.lit(SEP) + pl.col("pred"),
                n=pl.col("n"),
            )
            .to_arrow()
            .cast(PART)
        )

    def _merge(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return OUT.empty_table()
        return (
            pl.from_arrow(t)
            .group_by("sp")
            .agg(pl.col("n").sum())
            .with_columns(
                pred=pl.col("sp").str.split(SEP).list.get(1),
            )
            .group_by(["pred", "n"])
            .agg(pl.len().cast(pl.Int64).alias("n_subjects"))
            .rename({"n": "out_deg"})
            .select(["pred", "out_deg", "n_subjects"])
            .to_arrow()
            .cast(OUT)
        )

    def _hist_merge(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return OUT.empty_table()
        return (
            pl.from_arrow(t)
            .group_by(["pred", "out_deg"])
            .agg(pl.col("n_subjects").sum())
            .select(["pred", "out_deg", "n_subjects"])
            .to_arrow()
            .cast(OUT)
        )

    per_sp = bucket_group_apply(
        edges.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "sp",
        _merge,
    )
    return bucket_group_apply(per_sp, "pred", _hist_merge, num_buckets=8)


def _q_conv_yield_corr(sf_dir: str):
    """Does conversation LENGTH predict extraction YIELD? Exact-integer
    Pearson moments between per-conv turn count and triple count —
    `relational.group_corr_parts` reused with a constant group over
    conv-level aggregates (operator reuse across grain levels)."""
    import polars as pl
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )
    from joint_entity_and_relation_extraction_ray.stages.relational import (
        group_corr_parts,
    )

    PART = pa.schema(
        [("conv_id", pa.string()), ("kind", pa.int32()), ("n", pa.int64())]
    )

    def _cnt(kind: int):
        def _f(t: pa.Table) -> pa.Table:
            return (
                pl.from_arrow(t.select(["conv_id"]))
                .group_by("conv_id")
                .agg(pl.len().cast(pl.Int64).alias("n"))
                .with_columns(kind=pl.lit(kind, dtype=pl.Int32))
                .select(["conv_id", "kind", "n"])
                .to_arrow()
                .cast(PART)
            )

        return _f

    corpus = kg.corpus_for_sf_dir(sf_dir)
    turns = read_transcripts(str(corpus / "transcripts")).map_batches(
        _cnt(0), batch_format="pyarrow", zero_copy_batch=True
    )
    triples = kg.triples_of(kg.extract_for_sf_dir(sf_dir)).map_batches(
        _cnt(1), batch_format="pyarrow", zero_copy_batch=True
    )

    XY = pa.schema(
        [("g", pa.string()), ("x", pa.int64()), ("y", pa.int64())]
    )

    def _xy(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return XY.empty_table()
        df = (
            pl.from_arrow(t)
            .group_by(["conv_id", "kind"])
            .agg(pl.col("n").sum())
            .pivot(on="kind", index="conv_id", values="n")
        )
        if "0" not in df.columns:
            return XY.empty_table()
        if "1" not in df.columns:
            df = df.with_columns(pl.lit(None, dtype=pl.Int64).alias("1"))
        return (
            df.select(
                g=pl.lit("all"),
                x=pl.col("0"),
                y=pl.col("1").fill_null(0),
            )
            .to_arrow()
            .cast(XY)
        )

    xy = bucket_group_apply(turns.union(triples), "conv_id", _xy)
    return group_corr_parts(xy, by="g", x_col="x", y_col="y")


def _q_kg_triad_census(sf_dir: str):
    """Reduced directed-triad census (mutual-containing / cyclic /
    transitive closed triangles) — `stages/graph.triad_census`."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        triad_census,
    )

    return triad_census(kg.stage(sf_dir, "edges"))


def _q_kg_scc(sf_dir: str):
    """Strongly connected components of the DIRECTED KG (node → scc_id =
    lexicographic min entity id among mutually-reachable nodes) — the
    distributed coloring/peeling algorithm in
    `stages/graph.strongly_connected_components`, with an exact
    mutual-reachability recursive-CTE oracle."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        strongly_connected_components,
    )

    return strongly_connected_components(kg.stage(sf_dir, "edges"))


def _q_kg_sssp(sf_dir: str):
    """Bounded-hop weighted single-source shortest distances from the
    lexicographic-min entity over the undirected weighted KG (≤4 hops,
    integer edge costs = assertion weights) — distributed Bellman-Ford
    in `stages/graph.sssp_distances`, hop-capped recursive-CTE oracle."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        sssp_distances,
    )

    return sssp_distances(kg.stage(sf_dir, "edges"), max_hops=4)


def _q_kg_mst(sf_dir: str):
    """Minimum spanning forest of the undirected weighted KG (edge cost
    = assertion weight, ties broken by the (cost, u|v) total order) —
    distributed Borůvka in `stages/graph.minimum_spanning_forest`,
    oracle-backed: the recursive-CTE oracle SIMULATES Kruskal over the
    same strict total order (one step per edge rank carrying component
    labels), whose forest is provably identical to Borůvka's; pytest
    pins the same equivalence in-process."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        minimum_spanning_forest,
    )

    return minimum_spanning_forest(kg.stage(sf_dir, "edges"))


def _q_kg_ktruss(sf_dir: str):
    """Maximal 3-truss of the undirected KG (every edge in ≥1 triangle
    of the subgraph) — iterative support peel on the degree-ordered
    wedge machinery, `stages/graph.ktruss` — exact string edges,
    oracle-backed: the recursive CTE carries the surviving edge set and
    recomputes per-edge triangle support via a symmetric self-join each
    round under the engine's 30-round cap; pytest additionally pins an
    in-process peeling reference on random graphs."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import ktruss

    return ktruss(kg.stage(sf_dir, "edges"), k=3)


def _q_kg_walks(sf_dir: str):
    """Deterministic hash-driven random walks over the undirected KG
    (2 walks × 3 steps per node; next hop = md5_60(node|step|walk) mod
    degree in dst-sorted order) — `stages/graph.random_walks`, the
    reproducible DeepWalk-corpus generator, with a recursive-CTE oracle
    that mirrors the md5 step rule bit-exactly."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        random_walks,
    )

    return random_walks(kg.stage(sf_dir, "edges"), n_walks=2, length=3)


def _q_kg_embeddedness(sf_dir: str):
    """Edge embeddedness (per-edge common-neighbor count — Granovetter
    tie strength; 0 = local bridge) — `stages/graph.edge_support`, one
    round of the k-truss support pipeline exposed as a report with a
    3-way self-join oracle."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        edge_support,
    )

    return edge_support(kg.stage(sf_dir, "edges"))


def _q_kg_betweenness(sf_dir: str):
    """Sampled Brandes betweenness centrality (8 deterministic pivots
    picked in md5-60 order — unbiased where id prefixes correlate with
    entity types, review r4; ≤6 hops) over the undirected simple KG —
    `stages/graph.betweenness_centrality(fixed_point=True)`: δ carried
    as int64 micro-units with floor(σ_v·(scale+δ_w)/σ_w) contributions,
    so the sampled estimate is bit-reproducible and the level-unrolled
    DuckDB oracle replays it exactly; float-path exactness with
    all-nodes sources stays pinned against an in-process Brandes oracle
    in test_graph."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        betweenness_centrality,
    )

    return betweenness_centrality(kg.stage(sf_dir, "edges"), fixed_point=True)


def _q_kg_eff_diameter(sf_dir: str):
    """Effective diameter (90th-percentile pair distance) read off the
    HyperBall neighborhood function — `stages/graph.effective_diameter`;
    oracle-backed via the md5-60 HyperBall mirror (integer threshold
    readout recomputed in SQL)."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        effective_diameter,
    )

    return effective_diameter(kg.stage(sf_dir, "edges"))


def _q_kg_lift(sf_dir: str):
    """Association-strength (lift) triple confidence: per edge, how
    much more often its endpoints are asserted together than
    independence predicts — exact fixed-point integers
    (`stages/graph.edge_lift`; the subject/object masses re-aggregate
    the already-grouped edge table, N is one fan-in scalar)."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        edge_lift,
    )

    return edge_lift(kg.stage(sf_dir, "edges"))


def _q_kg_entity_churn(sf_dir: str):
    """Temporal-KG growth curve: per assertion day, distinct active
    entities and first-ever-seen entities — `stages/graph.entity_churn`
    over the canonicalized triple stream."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        entity_churn,
    )

    return entity_churn(kg.stage(sf_dir, "rewritten"))


def _q_kg_skipgrams(sf_dir: str):
    """Skip-gram (center, context, cnt) training pairs over the
    deterministic walk corpus (window 2) — DeepWalk's sentence →
    word2vec input step, `stages/graph.skipgram_pairs` over
    `random_walks`; oracle self-joins the same recursive-CTE walks."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        random_walks,
        skipgram_pairs,
    )

    return skipgram_pairs(
        random_walks(kg.stage(sf_dir, "edges"), n_walks=2, length=3),
        window=2,
    )


def _q_kg_paths(sf_dir: str):
    """Bounded-hop walk counts from the lexicographic-min entity
    (counting semiring — completes the (min,+)/(max,min)/(+,×) trio on
    the shared relax/merge skeleton) — `stages/graph.path_counts`;
    hop-capped UNION ALL recursive-CTE oracle counts the same walks."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        path_counts,
    )

    return path_counts(kg.stage(sf_dir, "edges"), max_hops=3)


def _q_kg_validity(sf_dir: str):
    """Temporal-KG SCD-2 timeline: change-point object history per
    (subj, pred) with LEAD-based validity windows —
    `stages/graph.validity_intervals` over the rewritten assertion
    stream (per-block min combiner → one subj-bucketed shuffle →
    vectorized polars window)."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        validity_intervals,
    )

    return validity_intervals(kg.stage(sf_dir, "rewritten"))


def _q_kg_rpq(sf_dir: str):
    """Regular path query p1·p2* (SPARQL property path) with min-hop
    semantics from pair frontiers — `stages/graph.regular_path_pairs`;
    p1/p2 = lexicographic min/max predicate so the query is
    parameter-free; hop-capped recursive-CTE oracle."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        regular_path_pairs,
    )

    return regular_path_pairs(kg.stage(sf_dir, "edges"), max_star_hops=3)


def _q_kg_diff(sf_dir: str):
    """Temporal-KG release diff between the quartile cutoffs: added /
    removed / changed assertions — `stages/graph.snapshot_diff` (both
    covering rows flagged in one pass, per-group compare in the same
    subj-bucketed shuffle)."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        snapshot_diff,
    )

    return snapshot_diff(kg.stage(sf_dir, "rewritten"))


def _q_kg_descendants(sf_dir: str):
    """Transitive-closure rollup p+ on the min predicate: per ancestor
    the distinct-descendant count and max depth within 4 hops —
    `stages/graph.closure_rollup` (pure reuse of regular_path_pairs +
    one src-bucketed rollup)."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        closure_rollup,
    )

    return closure_rollup(kg.stage(sf_dir, "edges"), max_hops=4)


def _q_kg_pred_trend(sf_dir: str):
    """Predicate-assertion drift: exact-integer least-squares slope of
    daily assertion volume per predicate — `stages/events.event_trends`
    re-instantiated on the rewritten KG stream by projection alone
    (key='pred'), the same operator that serves event_trends."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.events import (
        event_trends,
    )

    return event_trends(
        kg.stage(sf_dir, "rewritten").select_columns(["pred", "ts"]),
        key="pred",
    )


def _q_kg_validity_incremental(sf_dir: str):
    """Incremental-maintenance invariant for the SCD-2 timeline: the
    rewritten stream splits into two deterministic batches (content-
    hash parity, so LATE data lands in the delta), the base builds its
    timeline, `graph.validity_intervals_incremental` folds the delta —
    and the result must equal the full-recompute kg_validity oracle
    EXACTLY (touched groups recompute, untouched pass through)."""
    import pyarrow as pa
    import pyarrow.compute as _pc

    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.schema import stable_bucket
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        validity_intervals,
        validity_intervals_incremental,
    )

    rewritten = kg.stage(sf_dir, "rewritten")

    def _half(parity: int):
        def _f(t):
            key = _pc.binary_join_element_wise(
                t["subj_id"],
                t["pred"],
                t["obj_id"],
                _pc.cast(_pc.cast(t["ts"], pa.int64()), pa.string()),
                "\x1f",
            )
            b = stable_bucket(key.to_numpy(zero_copy_only=False), 2)
            return t.filter(_pc.equal(pa.array(b), parity))

        return _f

    base = rewritten.map_batches(
        _half(0), batch_format="pyarrow", zero_copy_batch=True
    )
    delta = rewritten.map_batches(
        _half(1), batch_format="pyarrow", zero_copy_batch=True
    )
    old = validity_intervals(base)
    return validity_intervals_incremental(base, delta, old)


def _q_kg_conv_hist(sf_dir: str):
    """Extraction-yield distribution: how many conversations produced
    k candidate triples, for each k — the coverage histogram an
    extraction pipeline monitors (count-of-counts: per-block conv
    partials → one conv shuffle → tiny k-bucket merge)."""
    import polars as pl
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    triples = kg.triples_of(kg.extract_for_sf_dir(sf_dir))
    PARTIAL = pa.schema([("conv_id", pa.string()), ("n", pa.int64())])
    OUT = pa.schema([("n_assertions", pa.int64()), ("n_convs", pa.int64())])

    def _per_conv(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select(["conv_id"]))
            .group_by("conv_id")
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
            .cast(PARTIAL)
        )

    def _conv_merge(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return PARTIAL.empty_table()
        return (
            pl.from_arrow(t)
            .group_by("conv_id")
            .agg(pl.col("n").sum())
            .to_arrow()
            .cast(PARTIAL)
        )

    def _hist(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return OUT.empty_table()
        return (
            pl.from_arrow(t)
            .group_by("n")
            .agg(pl.len().cast(pl.Int64).alias("n_convs"))
            .rename({"n": "n_assertions"})
            .to_arrow()
            .cast(OUT)
        )

    per_conv = bucket_group_apply(
        triples.map_batches(
            _per_conv, batch_format="pyarrow", zero_copy_batch=True
        ),
        "conv_id",
        _conv_merge,
    )
    def _hist_merge(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return OUT.empty_table()
        return (
            pl.from_arrow(t)
            .group_by("n_assertions")
            .agg(pl.col("n_convs").sum())
            .to_arrow()
            .cast(OUT)
        )

    return bucket_group_apply(
        per_conv.map_batches(
            _hist, batch_format="pyarrow", zero_copy_batch=True
        ),
        "n_assertions",
        _hist_merge,
        num_buckets=4,
    )


def _q_kg_bowtie(sf_dir: str):
    """Broder bow-tie structure of the KG (core/in/out/other node
    counts) — `stages/graph.bowtie_decomposition` (SCC + multi-source
    reachability reuse) — oracle-backed: the DuckDB oracle rebuilds the
    SCC labels via mutual reachability (the kg_scc oracle core), picks
    the same largest/min-id core, and replays the ≤30-hop multi-source
    BFS; the closed-form pytest additionally pins arbitrary graphs."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        bowtie_decomposition,
    )

    return bowtie_decomposition(kg.stage(sf_dir, "edges"))


def _q_kg_richclub(sf_dir: str):
    """Rich-club cohesion of the top-20 hubs (exact integer edge
    counts) — `stages/graph.rich_club_edges`."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        rich_club_edges,
    )

    return rich_club_edges(kg.stage(sf_dir, "edges"), k=20)


def _q_kg_triadic_closure(sf_dir: str):
    """Temporal triangles: exact count + closure-time stats (max-min of
    the three first-assertion timestamps, integer µs) —
    `stages/graph.triadic_closure_times`."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        triadic_closure_times,
    )

    return triadic_closure_times(kg.stage(sf_dir, "edges"))


def _q_kg_reciprocity_lag(sf_dir: str):
    """Temporal reciprocity: lag stats between the two directions'
    first assertions over mutually-asserted pairs —
    `stages/graph.reciprocity_lag` (exact integer µs)."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        reciprocity_lag,
    )

    return reciprocity_lag(kg.stage(sf_dir, "edges"))


def _q_kg_entity_lifetimes(sf_dir: str):
    """Per-entity activity window over the assertion stream: first/last
    assertion (epoch µs) and assertion count, counting subject and
    object roles — decomposable (min, max, sum) combiner, one
    entity-bucketed merge."""
    import polars as pl
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    OUT = pa.schema(
        [
            ("entity_id", pa.string()),
            ("first_us", pa.int64()),
            ("last_us", pa.int64()),
            ("n_assertions", pa.int64()),
        ]
    )

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["subj_id", "obj_id", "ts"]))
        both = pl.concat(
            [
                df.select(
                    entity_id=pl.col("subj_id"),
                    us=pl.col("ts").cast(pl.Int64),
                ),
                df.select(
                    entity_id=pl.col("obj_id"),
                    us=pl.col("ts").cast(pl.Int64),
                ),
            ]
        )
        return (
            both.group_by("entity_id")
            .agg(
                pl.col("us").min().alias("first_us"),
                pl.col("us").max().alias("last_us"),
                pl.len().cast(pl.Int64).alias("n_assertions"),
            )
            .select(["entity_id", "first_us", "last_us", "n_assertions"])
            .to_arrow()
            .cast(OUT)
        )

    def _merge(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return OUT.empty_table()
        return (
            pl.from_arrow(t)
            .group_by("entity_id")
            .agg(
                pl.col("first_us").min(),
                pl.col("last_us").max(),
                pl.col("n_assertions").sum(),
            )
            .select(["entity_id", "first_us", "last_us", "n_assertions"])
            .to_arrow()
            .cast(OUT)
        )

    rewritten = kg.stage(sf_dir, "rewritten")
    return bucket_group_apply(
        rewritten.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "entity_id",
        _merge,
    )


def _q_kg_belief_curve(sf_dir: str):
    """KG size over time: believed-assertion count at 8 evenly spaced
    cutoffs (integer-µs arithmetic) — one pass over the SCD-2 timeline,
    each interval vectorized against all 8 cutoffs, per-block partial
    counts folded on the driver (8 ints per block)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        _ts_minmax_us,
        validity_intervals,
    )

    rewritten = kg.stage(sf_dir, "rewritten")
    lo, hi = _ts_minmax_us(rewritten)
    cuts = [lo + k * (hi - lo) // 8 for k in range(1, 9)]
    iv = validity_intervals(rewritten)

    def _counts(t: pa.Table) -> pa.Table:
        vf = t["valid_from"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        vt_arr = t["valid_to"].cast(pa.int64())
        vt = vt_arr.to_numpy(zero_copy_only=False)
        open_ = np.asarray(pa.compute.is_null(vt_arr).to_numpy(
            zero_copy_only=False
        ))
        ns = []
        for at in cuts:
            cov = (vf <= at) & (open_ | (np.nan_to_num(vt, nan=0) > at))
            ns.append(int(cov.sum()))
        return pa.table(
            {
                "k": pa.array(list(range(1, 9)), pa.int64()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    parts = iv.map_batches(
        _counts, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # 8 rows per block — tiny by construction
    agg = {}
    for r in parts:
        agg[r["k"]] = agg.get(r["k"], 0) + r["n"]
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(sorted(agg), pa.int64()),
                "at_us": pa.array(
                    [cuts[k - 1] for k in sorted(agg)], pa.int64()
                ),
                "n_believed": pa.array(
                    [agg[k] for k in sorted(agg)], pa.int64()
                ),
            }
        )
    )


def _q_kg_volatility(sf_dir: str):
    """Predicate churn over the SCD-2 timeline: intervals, closures and
    total closed lifetime in exact integer µs per predicate —
    `stages/graph.pred_volatility`."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        pred_volatility,
    )

    return pred_volatility(kg.stage(sf_dir, "rewritten"))


def _q_kg_snapshot(sf_dir: str):
    """Point-in-time KG (time travel): the assertion set believed at the
    deterministic midpoint cutoff — `stages/graph.belief_snapshot` over
    `validity_intervals`' SCD-2 timeline."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        belief_snapshot,
    )

    return belief_snapshot(kg.stage(sf_dir, "rewritten"))


def _q_kg_widest(sf_dir: str):
    """Bounded-hop widest-path (max-min bottleneck) widths from the
    lexicographic-min entity over the undirected weighted KG (≤4 hops)
    — the (max, min)-semiring sibling of kg_sssp, same relax/merge
    skeleton with the salted-min combiner running the max-merge on
    negated widths; hop-capped recursive-CTE oracle."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        widest_distances,
    )

    return widest_distances(kg.stage(sf_dir, "edges"), max_hops=4)


def _q_kg_conflicts(sf_dir: str):
    """KG integrity: (subject, predicate) pairs asserting >1 distinct
    object — the contradiction triage list for functional relations.
    `stages/graph.object_conflicts`, exact-distinct decomposition."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        object_conflicts,
    )

    return object_conflicts(kg.stage(sf_dir, "edges"))


def _q_kg_functionality(sf_dir: str):
    """Per-predicate functionality audit (n_subjects, n_functional as
    pure ints) — `stages/graph.pred_functionality`."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        pred_functionality,
    )

    return pred_functionality(kg.stage(sf_dir, "edges"))


def _q_kg_comention(sf_dir: str):
    """Entity co-mention counts per turn (the co-occurrence edge layer)
    — see `stages/graph.comention_counts`."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        comention_counts,
    )

    return comention_counts(kg.stage(sf_dir, "linked"))


# Shared CTE chain computing each document's 64-bit SimHash in SQL —
# exactly textstats.simhash64 (word-bigram features counted, whole-text
# fallback under 2 tokens, md5-64-bit feature hash, sign-sum per bit,
# v>0 rule). Spliced after WITH in both dedup_simhash oracles.
_SIMHASH_SIMS_SQL = """
            toks AS (SELECT doc_id, text,
                            CASE WHEN trim(text) = ''
                                 THEN CAST([] AS VARCHAR[])
                                 ELSE regexp_split_to_array(trim(text),
                                                            '\\s+')
                            END AS t
                     FROM documents),
            feats AS (
                SELECT doc_id, f, CAST(count(*) AS BIGINT) AS w FROM (
                    SELECT doc_id, t[j] || ' ' || t[j+1] AS f
                    FROM toks, unnest(range(1, greatest(len(t), 1)))
                         AS u(j)
                    WHERE len(t) >= 2
                ) GROUP BY 1, 2
                UNION ALL
                SELECT doc_id, text AS f, 1 AS w FROM toks WHERE len(t) < 2
            ),
            hs AS (SELECT doc_id,
                          ('0x' || substr(md5(f), 1, 16))::UBIGINT AS h, w
                   FROM feats),
            bits AS (SELECT doc_id, b,
                            sum(CASE WHEN (h >> CAST(b AS UBIGINT)) & 1 = 1
                                     THEN w ELSE -w END) AS v
                     FROM hs, unnest(range(0, 64)) AS bb(b) GROUP BY 1, 2),
            sims AS (SELECT doc_id,
                            CAST(sum(CASE WHEN v > 0
                                          THEN (1::HUGEINT
                                                << CAST(b AS INTEGER))
                                          ELSE 0::HUGEINT END)
                                 AS UBIGINT) AS sh
                     FROM bits GROUP BY 1)
"""


def _q_transcript_profile(sf_dir: str):
    """Ingest observability / schema-drift monitor over the RAW
    transcript feed (pre-validation): per day — row count, EXACT
    distinct conversations, null-tool count, empty-or-whitespace text
    count. The dashboard that catches an upstream producer change (tool
    field going null, text going empty) the day it happens. Per-block
    (day, conv) combiner partials → one day-bucketed merge; conv-level
    dedup and day-level sums fold in the same reduce."""
    import pyarrow as pa
    import ray

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.sources.synth import (
        corpus_for_sf_dir,
    )

    raw = ray.data.read_parquet(
        str(corpus_for_sf_dir(sf_dir) / "transcripts"),
        columns=["conv_id", "ts", "tool", "text"],
    )

    part_schema = pa.schema(
        [
            ("day", pa.date32()),
            ("conv_id", pa.string()),
            ("n", pa.int64()),
            ("nt", pa.int64()),
            ("ne", pa.int64()),
            ("_gkey", pa.string()),
        ]
    )

    def _partial(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return part_schema.empty_table()
        return (
            pl.from_arrow(t)
            .with_columns(
                pl.col("ts").dt.date().alias("day"),
                pl.col("tool").is_null().cast(pl.Int64).alias("nt"),
                (
                    pl.col("text").is_null()
                    | (
                        pl.col("text").str.strip_chars().str.len_chars()
                        == 0
                    )
                )
                .cast(pl.Int64)
                .alias("ne"),
            )
            .group_by(["day", "conv_id"])
            .agg(
                pl.len().cast(pl.Int64).alias("n"),
                pl.col("nt").sum(),
                pl.col("ne").sum(),
            )
            .with_columns(
                pl.col("day").cast(pl.String).alias("_gkey")
            )
            .select(["day", "conv_id", "n", "nt", "ne", "_gkey"])
            .to_arrow()
            .cast(part_schema)
        )

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        out_schema = pa.schema(
            [
                ("day", pa.date32()),
                ("n_turns", pa.int64()),
                ("n_convs", pa.int64()),
                ("n_null_tool", pa.int64()),
                ("n_empty_text", pa.int64()),
            ]
        )
        if not t.num_rows:
            return out_schema.empty_table()
        return (
            pl.from_arrow(t.drop_columns(["_gkey"]))
            .group_by(["day", "conv_id"])
            .agg(pl.col("n").sum(), pl.col("nt").sum(), pl.col("ne").sum())
            .group_by("day")
            .agg(
                pl.col("n").sum().alias("n_turns"),
                pl.col("conv_id")
                .is_not_null()
                .sum()
                .cast(pl.Int64)
                .alias("n_convs"),
                pl.col("nt").sum().alias("n_null_tool"),
                pl.col("ne").sum().alias("n_empty_text"),
            )
            .to_arrow()
            .cast(out_schema)
        )

    partials = raw.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucket_group_apply(partials, "_gkey", _merge, num_buckets=8)


def _q_conv_stats(sf_dir: str):
    """Transcript analytics rollup: per conversation the turn count,
    distinct roles and total text chars — `stages/relational.
    grouped_summary` (per-block combiner, tiny merge) over the validated
    T0 source, plus a distinct-role count folded into the same shuffle."""
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.sources.synth import (
        corpus_for_sf_dir,
    )
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )

    ds = read_transcripts(str(corpus_for_sf_dir(sf_dir) / "transcripts"))

    def _partial(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t.select(["conv_id", "role", "text"]))
            .with_columns(pl.col("text").str.len_chars().alias("nc"))
            .group_by(["conv_id", "role"])
            .agg(
                pl.len().cast(pl.Int64).alias("n_turns"),
                pl.col("nc").sum().cast(pl.Int64).alias("n_chars"),
            )
            .to_arrow()
        )

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t)
            .group_by(["conv_id", "role"])
            .agg(pl.col("n_turns").sum(), pl.col("n_chars").sum())
            .group_by("conv_id")
            .agg(
                pl.col("n_turns").sum(),
                pl.len().cast(pl.Int64).alias("n_roles"),
                pl.col("n_chars").sum(),
            )
            .to_arrow()
        )

    partials = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucket_group_apply(partials, "conv_id", _merge, num_buckets=8)


def _q_kg_alias_mining(sf_dir: str):
    """Alias-dictionary bootstrap (the inverse of kg_surfaces): per
    normalized surface form (lower-cased alias key) — how often it is
    mentioned, how many DISTINCT entities it linked to (the ambiguity
    signal), and the modal entity (count desc, entity asc tiebreak).
    This is the op that BUILDS the next run's gazetteer from the current
    run's links: per-(alias, entity) combiner partials, one
    alias-bucketed merge; surfaces/ids move once as distinct partials."""
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    linked = kg.stage(sf_dir, "linked")

    def _partial(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t.select(["surface", "cand_entity_id"]))
            .drop_nulls("cand_entity_id")
            .with_columns(pl.col("surface").str.to_lowercase().alias("alias"))
            .group_by(["alias", "cand_entity_id"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
            .select(["alias", "cand_entity_id", "n"])
        )

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(t)
            .group_by(["alias", "cand_entity_id"])
            .agg(pl.col("n").sum())
        )
        return (
            df.sort(
                ["alias", "n", "cand_entity_id"],
                descending=[False, True, False],
            )
            .group_by("alias", maintain_order=True)
            .agg(
                pl.col("n").sum().alias("n_mentions"),
                pl.len().cast(pl.Int64).alias("n_entities"),
                pl.col("cand_entity_id").first().alias("top_entity"),
            )
            .to_arrow()
        )

    partials = linked.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucket_group_apply(partials, "alias", _merge, num_buckets=16)


def _q_kg_surfaces(sf_dir: str):
    """Per-entity surface-form diversity: mention count, distinct
    surfaces, and the modal surface (count desc, surface asc tiebreak) —
    per-(entity, surface) combiner partials, one entity-bucketed merge."""
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    linked = kg.stage(sf_dir, "linked")

    def _partial(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t.select(["cand_entity_id", "surface"]))
            .drop_nulls("cand_entity_id")
            .group_by(["cand_entity_id", "surface"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(t)
            .group_by(["cand_entity_id", "surface"])
            .agg(pl.col("n").sum())
        )
        return (
            df.sort(
                ["cand_entity_id", "n", "surface"],
                descending=[False, True, False],
            )
            .group_by("cand_entity_id", maintain_order=True)
            .agg(
                pl.col("n").sum().alias("n_mentions"),
                pl.len().cast(pl.Int64).alias("n_surfaces"),
                pl.col("surface").first().alias("top_surface"),
            )
            .rename({"cand_entity_id": "entity_id"})
            .to_arrow()
        )

    partials = linked.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucket_group_apply(
        partials, "cand_entity_id", _merge, num_buckets=8
    )


def _q_conv_role_patterns(sf_dir: str):
    """Conversation role-sequence signatures counted corpus-wide (the
    dialogue-shape histogram): each conv reduces to its ordered role
    string in one conv-bucketed shuffle, then signature counts merge."""
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.sources.synth import (
        corpus_for_sf_dir,
    )
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )

    ds = read_transcripts(str(corpus_for_sf_dir(sf_dir) / "transcripts"))

    def _sig(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t.select(["conv_id", "turn_idx", "role"]))
            .sort(["conv_id", "turn_idx"])
            .group_by("conv_id", maintain_order=True)
            .agg(pl.col("role").str.join(">").alias("pattern"))
            .group_by("pattern")
            .agg(pl.len().cast(pl.Int64).alias("n_convs"))
            .to_arrow()
        )

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t)
            .group_by("pattern")
            .agg(pl.col("n_convs").sum())
            .to_arrow()
        )

    per_conv = bucket_group_apply(ds, "conv_id", _sig, num_buckets=8)
    return bucket_group_apply(per_conv, "pattern", _merge, num_buckets=4)


def _q_conv_response_time(sf_dir: str):
    """Per-conversation first-response latency: µs between the first
    user turn and the first assistant turn at/after it (conversations
    without both are omitted) — decomposable per-(conv, role) min-ts
    partials, one conv-bucketed merge, exact integers."""
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.sources.synth import (
        corpus_for_sf_dir,
    )
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )

    ds = read_transcripts(str(corpus_for_sf_dir(sf_dir) / "transcripts"))

    def _partial(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t.select(["conv_id", "role", "ts"]))
            .filter(pl.col("role").is_in(["user", "assistant"]))
            .group_by(["conv_id", "role"])
            .agg(pl.col("ts").min().alias("first_ts"))
            .to_arrow()
        )

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(t)
            .group_by(["conv_id", "role"])
            .agg(pl.col("first_ts").min())
        )
        wide = df.pivot(
            on="role", index="conv_id", values="first_ts"
        )
        for c in ("user", "assistant"):
            if c not in wide.columns:
                wide = wide.with_columns(
                    pl.lit(None, dtype=pl.Datetime("us")).alias(c)
                )
        out = (
            wide.drop_nulls(["user", "assistant"])
            .with_columns(
                latency_us=(
                    pl.col("assistant").cast(pl.Int64)
                    - pl.col("user").cast(pl.Int64)
                )
            )
            .filter(pl.col("latency_us") >= 0)
            .select(["conv_id", "latency_us"])
        )
        return out.to_arrow()

    partials = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucket_group_apply(partials, "conv_id", _merge, num_buckets=8)


def _q_conv_qa_pairs(sf_dir: str):
    """Instruction-pair extraction: every user turn immediately followed
    by an assistant turn becomes one (prompt, response) training example
    — rows (conv_id, turn_idx, prompt, response). One conv-bucketed
    shuffle; the pairing is a vectorized per-conversation shift."""
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.sources.synth import (
        corpus_for_sf_dir,
    )
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )

    ds = read_transcripts(str(corpus_for_sf_dir(sf_dir) / "transcripts"))

    def _pairs(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(
            t.select(["conv_id", "turn_idx", "role", "text"])
        ).sort(["conv_id", "turn_idx"])
        out = (
            df.with_columns(
                nrole=pl.col("role").shift(-1).over("conv_id"),
                ntext=pl.col("text").shift(-1).over("conv_id"),
            )
            .filter(
                (pl.col("role") == "user") & (pl.col("nrole") == "assistant")
            )
            .select(
                pl.col("conv_id"),
                pl.col("turn_idx").cast(pl.Int64),
                pl.col("text").alias("prompt"),
                pl.col("ntext").alias("response"),
            )
            .to_arrow()
        )
        return out.cast(
            pa.schema(
                [
                    ("conv_id", pa.string()),
                    ("turn_idx", pa.int64()),
                    ("prompt", pa.string()),
                    ("response", pa.string()),
                ]
            )
        )

    return bucket_group_apply(ds, "conv_id", _pairs, num_buckets=32)


def _q_conv_windows(sf_dir: str):
    """RAG-style dialog windowing: every 3 consecutive turns of a
    conversation concatenated into one retrieval unit — rows (conv_id,
    win_start, window_text). One conv-bucketed shuffle; the window build
    is two vectorized shifts."""
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.sources.synth import (
        corpus_for_sf_dir,
    )
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )

    ds = read_transcripts(str(corpus_for_sf_dir(sf_dir) / "transcripts"))

    def _win(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t.select(["conv_id", "turn_idx", "text"])).sort(
            ["conv_id", "turn_idx"]
        )
        return (
            df.with_columns(
                t1=pl.col("text").shift(-1).over("conv_id"),
                t2=pl.col("text").shift(-2).over("conv_id"),
            )
            .drop_nulls(["t1", "t2"])
            .select(
                pl.col("conv_id"),
                pl.col("turn_idx").cast(pl.Int64).alias("win_start"),
                pl.concat_str(
                    [pl.col("text"), pl.col("t1"), pl.col("t2")],
                    separator=" ",
                ).alias("window_text"),
            )
            .to_arrow()
        )

    return bucket_group_apply(ds, "conv_id", _win, num_buckets=8)


def _q_tool_transitions(sf_dir: str):
    """Tool-call bigram transition counts over assistant transcripts
    (agent-trajectory mining) — see `stages/dialog.tool_transitions`."""
    from joint_entity_and_relation_extraction_ray.sources.synth import (
        corpus_for_sf_dir,
    )
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )
    from joint_entity_and_relation_extraction_ray.stages.dialog import (
        tool_transitions,
    )

    ds = read_transcripts(str(corpus_for_sf_dir(sf_dir) / "transcripts"))
    return tool_transitions(ds, num_buckets=8)


def _q_tool_stats(sf_dir: str):
    """Per-tool usage profile (calls, EXACT distinct conversations via
    conv-disjoint partials, turn-position range) — see
    `stages/dialog.tool_stats`."""
    from joint_entity_and_relation_extraction_ray.sources.synth import (
        corpus_for_sf_dir,
    )
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )
    from joint_entity_and_relation_extraction_ray.stages.dialog import (
        tool_stats,
    )

    ds = read_transcripts(str(corpus_for_sf_dir(sf_dir) / "transcripts"))
    return tool_stats(ds, num_buckets=8)


def _q_turn_runs(sf_dir: str):
    """Turn-taking run-length profile per conversation (gaps-and-islands)
    — see `stages/dialog.turn_runs`."""
    from joint_entity_and_relation_extraction_ray.sources.synth import (
        corpus_for_sf_dir,
    )
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )
    from joint_entity_and_relation_extraction_ray.stages.dialog import (
        turn_runs,
    )

    ds = read_transcripts(str(corpus_for_sf_dir(sf_dir) / "transcripts"))
    return turn_runs(ds, num_buckets=8)


def _q_conv_dedup(sf_dir: str):
    """Conversation-level exact dedup (keep-first by (role, text)-sequence
    signature) — see `stages/dialog.conv_dedup`."""
    from joint_entity_and_relation_extraction_ray.sources.synth import (
        corpus_for_sf_dir,
    )
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )
    from joint_entity_and_relation_extraction_ray.stages.dialog import (
        conv_dedup,
    )

    ds = read_transcripts(str(corpus_for_sf_dir(sf_dir) / "transcripts"))
    return conv_dedup(ds, num_buckets=8)


def _q_boilerplate_turns(sf_dir: str):
    """Template/boilerplate turn texts recurring across ≥2 distinct
    conversations — see `stages/dialog.boilerplate_turns`."""
    from joint_entity_and_relation_extraction_ray.sources.synth import (
        corpus_for_sf_dir,
    )
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )
    from joint_entity_and_relation_extraction_ray.stages.dialog import (
        boilerplate_turns,
    )

    ds = read_transcripts(str(corpus_for_sf_dir(sf_dir) / "transcripts"))
    return boilerplate_turns(ds, min_convs=2, num_buckets=8)


def _q_conv_near_dup(sf_dir: str):
    """Conversation-level near-duplicate pairs (exact word-3-gram Jaccard
    ≥ 0.25 over turn-joined conv docs) — see
    `stages/dialog.conv_near_dup`."""
    from joint_entity_and_relation_extraction_ray.sources.synth import (
        corpus_for_sf_dir,
    )
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )
    from joint_entity_and_relation_extraction_ray.stages.dialog import (
        conv_near_dup,
    )

    ds = read_transcripts(str(corpus_for_sf_dir(sf_dir) / "transcripts"))
    return conv_near_dup(ds, threshold=0.25, num_buckets=8)


def _q_curate_transcripts(sf_dir: str):
    """COMPOSITE chat-corpus curation: structural gate → exact conv dedup
    → near-dup CC collapse → split assignment — see
    `stages/dialog.curate_transcripts`."""
    from joint_entity_and_relation_extraction_ray.sources.synth import (
        corpus_for_sf_dir,
    )
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )
    from joint_entity_and_relation_extraction_ray.stages.dialog import (
        curate_transcripts,
    )

    ds = read_transcripts(str(corpus_for_sf_dir(sf_dir) / "transcripts"))
    return curate_transcripts(ds, num_buckets=8)


def _q_mixture_weights(sf_dir: str):
    """Training-mixture profile over (lang, source): exact token totals,
    corpus shares and uniform-target resampling weights — see
    `stages/curation.mixture_weights`."""
    from joint_entity_and_relation_extraction_ray.pipelines.corpus_ops import (
        read_documents,
    )
    from joint_entity_and_relation_extraction_ray.stages.curation import (
        mixture_weights,
    )

    docs = read_documents(sf_dir, columns=["lang", "source", "text"])
    return mixture_weights(docs)


def _q_bigram_coverage(sf_dir: str):
    """LM-free perplexity-style quality gate: per doc, distinct word
    bigrams and how many are corpus-supported (df ≥ 2) — see
    `stages/curation.bigram_coverage`."""
    from joint_entity_and_relation_extraction_ray.pipelines.corpus_ops import (
        read_documents,
    )
    from joint_entity_and_relation_extraction_ray.stages.curation import (
        bigram_coverage,
    )

    return bigram_coverage(read_documents(sf_dir))


def _q_kg_clustering(sf_dir: str):
    """Per-node triangle participation and degree (local clustering
    coefficient as exact integers) — see `stages/graph.node_clustering`."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        node_clustering,
    )

    return node_clustering(kg.stage(sf_dir, "edges"))


def _q_kg_assortativity(sf_dir: str):
    """Degree-assortativity sufficient statistics (one row of exact
    integer sums; Newman's r is driver arithmetic) — see
    `stages/graph.degree_assortativity_sums`."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        degree_assortativity_sums,
    )

    return degree_assortativity_sums(kg.stage(sf_dir, "edges"))


def _q_kg_reciprocity(sf_dir: str):
    """Edge reciprocity of the directed KG — one row of exact integers
    (n_edges = distinct directed pairs, n_recip = directed pairs whose
    reverse also exists). Bucketing on the UNORDERED pair key co-locates
    both directions, so reciprocity is a per-bucket check."""
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.functions.shuffle import (
        bucket_group_apply,
    )
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    edges = kg.stage(sf_dir, "edges")

    def _pairs(t: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(t.select(["subj_id", "obj_id"]))
            .filter(pl.col("subj_id") != pl.col("obj_id"))
            .unique()
            .with_columns(
                ukey=pl.min_horizontal("subj_id", "obj_id")
                + pl.lit("\x00")
                + pl.max_horizontal("subj_id", "obj_id")
            )
        )
        return df.to_arrow()

    def _count(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t).unique()
        per = df.group_by("ukey").agg(pl.len().alias("n_dir"))
        n_edges = int(per["n_dir"].sum())
        n_recip = int(
            per.filter(pl.col("n_dir") == 2)["n_dir"].sum()
        )
        return pa.table(
            {
                "n_edges": pa.array([n_edges], pa.int64()),
                "n_recip": pa.array([n_recip], pa.int64()),
                "_one": pa.array([1], pa.int32()),
            }
        )

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t.drop_columns(["_one"]))
            .select(pl.col("n_edges").sum(), pl.col("n_recip").sum())
            .to_arrow()
        )

    pairs = edges.map_batches(
        _pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    per_bucket = bucket_group_apply(pairs, "ukey", _count, num_buckets=16)
    return bucket_group_apply(per_bucket, "_one", _merge, num_buckets=1)


def _q_kg_common_neighbors(sf_dir: str):
    """Common-neighbors link prediction over the undirected KG — see
    `stages/graph.common_neighbor_counts`."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg
    from joint_entity_and_relation_extraction_ray.stages.graph import (
        common_neighbor_counts,
    )

    return common_neighbor_counts(kg.stage(sf_dir, "edges"), min_common=2)


def _driver_verified_rounds() -> dict[str, int]:
    """Per-query LAST round with a green driver CORRECTNESS row, read from
    the repo's CORRECTNESS_r*.json files. The driver caps each round's run
    at the FIRST 50 dict entries, so queries() orders by least-recently-
    verified: never-checked queries come first and get driver-grade
    evidence; long-green ones rotate to the back (VERDICT r2, next #2)."""
    import glob as _glob
    import json as _json
    import os as _os
    import re as _re

    here = _os.path.dirname(_os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in sorted(_glob.glob(_os.path.join(here, "CORRECTNESS_r*.json"))):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = _json.load(open(path))
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            ok = isinstance(row, dict) and (
                row.get("hash_match") is True
                or (row.get("err") == "no_oracle" and row.get("spark_rows"))
            )
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    return last


def queries() -> dict[str, Callable[[str], Any]]:
    base = _queries_in_registration_order()
    seen = _driver_verified_rounds()
    order = sorted(
        base, key=lambda k: (seen.get(k, 0), list(base).index(k))
    )
    return {k: base[k] for k in order}


def _queries_in_registration_order() -> dict[str, Callable[[str], Any]]:
    from joint_entity_and_relation_extraction_ray.pipelines import corpus_ops as co

    return {
        "segment_dedup": co.q_segment_dedup,
        "boilerplate_segments": co.q_boilerplate_segments,
        "extract_patterns": co.q_extract_patterns,
        "pattern_stats": co.q_pattern_stats,
        "order_grouping_sets": co.q_order_grouping_sets,
        "order_count_distribution": co.q_order_count_distribution,
        "bpe_merges": co.q_bpe_merges,  # oracle-exact (merge loop simulated)
        "bpe_encode": co.q_bpe_encode,  # oracle-exact (encode loop simulated)
        "event_journeys": co.q_event_journeys,
        "attribution": co.q_attribution,
        "event_rules": co.q_event_rules,
        "embed_rp": co.q_embed_rp,
        "doc_hash_features": co.q_doc_hash_features,
        "kfold_assign": co.q_kfold_assign,
        "session_overlap": co.q_session_overlap,
        "kg_scc": _q_kg_scc,
        "kg_sssp": _q_kg_sssp,
        "kg_mst": _q_kg_mst,  # oracle-exact (Kruskal replayed)
        "kg_ktruss": _q_kg_ktruss,
        "kg_walks": _q_kg_walks,
        "kg_conflicts": _q_kg_conflicts,
        "kg_functionality": _q_kg_functionality,
        "kg_widest": _q_kg_widest,
        "kg_skipgrams": _q_kg_skipgrams,
        "kg_entity_churn": _q_kg_entity_churn,
        "kg_embeddedness": _q_kg_embeddedness,
        "extract_mentions": _q_extract_mentions,
        "extract_triples": _q_extract_triples,
        "link_mentions": _q_link_mentions,
        "canonicalize": _q_canonicalize,
        "kg_edges": _q_kg_edges,
        "kg_two_hop": _q_kg_two_hop,
        "kg_temporal_two_hop": _q_kg_temporal_two_hop,
        "kg_pred_roles": _q_kg_pred_roles,
        "kg_pred_rules": _q_kg_pred_rules,
        "kg_triangles": _q_kg_triangles,
        "kg_pagerank": _q_kg_pagerank,  # oracle-exact (fixed-point int64)
        "kg_asof": _q_kg_asof,
        "kg_entity_page": _q_kg_entity_page,
        "conv_kg_profile": _q_conv_kg_profile,
        "kg_pagerank_weighted": _q_kg_pagerank_weighted,  # oracle-exact
        "kg_ppr": _q_kg_ppr,  # oracle-exact (fixed-point int64)
        "kg_hits": _q_kg_hits,  # oracle-exact (fixed-point, ceil-div norm)
        "kg_hyperball": _q_kg_hyperball,  # oracle-exact (md5-60 registers)
        "kg_harmonic": _q_kg_harmonic,  # oracle-exact (md5-60 registers)
        "kg_neighborhood": _q_kg_neighborhood,  # oracle-exact (md5-60 registers)
        "kg_components": _q_kg_components,
        "kg_comention": _q_kg_comention,
        "conv_stats": _q_conv_stats,
        "transcript_profile": _q_transcript_profile,
        "kg_common_neighbors": _q_kg_common_neighbors,
        "kg_clustering": _q_kg_clustering,
        "kg_surfaces": _q_kg_surfaces,
        "kg_alias_mining": _q_kg_alias_mining,
        "kg_assortativity": _q_kg_assortativity,
        "kg_reciprocity": _q_kg_reciprocity,
        "conv_role_patterns": _q_conv_role_patterns,
        "conv_windows": _q_conv_windows,
        "tool_transitions": _q_tool_transitions,
        "tool_stats": _q_tool_stats,
        "turn_runs": _q_turn_runs,
        "conv_dedup": _q_conv_dedup,
        "boilerplate_turns": _q_boilerplate_turns,
        "conv_near_dup": _q_conv_near_dup,
        "curate_transcripts": _q_curate_transcripts,
        "mixture_weights": _q_mixture_weights,
        "bigram_coverage": _q_bigram_coverage,
        "conv_qa_pairs": _q_conv_qa_pairs,
        "conv_response_time": _q_conv_response_time,
        "kg_nodes": _q_kg_nodes,
        "kg_latest_assertion": _q_kg_latest_assertion,
        "kg_kcore": _q_kg_kcore,  # oracle-exact (state-carry recursion)
        "kg_jaccard": _q_kg_jaccard,
        "kg_adamic_adar": _q_kg_adamic_adar,  # oracle-exact (fixed-point AA/RA)
        "kg_katz": _q_kg_katz,  # oracle-exact (integer walk counts)
        "kg_labelprop": _q_kg_labelprop,  # oracle-exact (capped vote recursion)
        "kg_negatives": _q_kg_negatives,  # oracle-exact (md5-60 draws)
        "mention_contexts": _q_mention_contexts,
        "kg_pred_signatures": _q_kg_pred_signatures,
        "kg_report": _q_kg_report,
        "mention_positions": _q_mention_positions,
        "kg_ego": _q_kg_ego,
        "kg_edges_incremental": _q_kg_edges_incremental,
        "lexical_topk": _q_lexical_topk,
        "kg_pred_daily": _q_kg_pred_daily,
        "kg_pred_profile": _q_kg_pred_profile,
        "top_entities": _q_top_entities,
        "kg_eval_triples": _q_kg_eval_triples,
        "kg_eval_mentions": _q_kg_eval_mentions,
        "kg_eval_by_pred": _q_kg_eval_by_pred,
        # training-data corpus ops over the driver's own tables
        "doc_stats": co.q_doc_stats,
        "doc_entropy": co.q_doc_entropy,  # oracle-exact (fixed-point entropy)
        "token_dispersion": co.q_token_dispersion,  # oracle-exact (integer stats)
        "token_counts": co.q_token_counts,
        "quality_filter": co.q_quality_filter,
        "lang_id": co.q_lang_id,
        "doc_fingerprint": co.q_doc_fingerprint,
        "doc_winnow": co.q_doc_winnow,
        "decontaminate": co.q_decontaminate,
        "redact": co.q_redact,
        "vocab_encode": co.q_vocab_encode,
        "token_bpe": co.q_token_bpe,
        "dedup_exact": co.q_dedup_exact,
        "dedup_minhash": co.q_dedup_minhash,
        "dedup_minhash_apply": co.q_dedup_minhash_apply,
        "dedup_cluster_sizes": co.q_dedup_cluster_sizes,
        "fuzzy_match": co.q_fuzzy_match,
        "dedup_incremental": co.q_dedup_incremental,
        "order_global_rank": co.q_order_global_rank,
        "dedup_ngram_jaccard": co.q_dedup_ngram_jaccard,
        "dedup_containment": co.q_dedup_containment,
        "dedup_simhash": co.q_dedup_simhash,
        "dedup_simhash_near": co.q_dedup_simhash_near,
        "dedup_embedding": co.q_dedup_embedding,
        "dedup_embedding_lsh": co.q_dedup_embedding_lsh,  # oracle-exact (int ±1 planes)
        "ann_topk": co.q_ann_topk,
        "ann_topk_ivf": co.q_ann_topk_ivf,  # oracle-exact (md5 sample, cosine replay)
        "ann_recall": co.q_ann_recall,  # oracle-exact (exact ∩ ivf counts)
        "knn_label": co.q_knn_label,
        "retrieval_fusion": co.q_retrieval_fusion,
        "embed_probe_assign": co.q_embed_probe_assign,
        "embed_cov_stats": co.q_embed_cov_stats,
        # exact-rational Lloyd's (r4): integer centroid state, HUGEINT
        # oracle; float-path cluster recovery stays pytest-pinned
        "embed_kmeans": co.q_embed_kmeans,  # oracle-exact (rational centroids)
        "multimodal_features": co.q_multimodal_features,
        "multimodal_resize": co.q_multimodal_resize,
        "multimodal_frames": co.q_multimodal_frames,
        "sessionize": co.q_sessionize,
        "event_trends": co.q_event_trends,
        "events_daily": co.q_events_daily,
        "events_daily_approx": co.q_events_daily_approx,  # oracle-exact (md5-60 HLL)
        "events_json": co.q_events_json,
        "sample_hash": co.q_sample_hash,
        "sample_random": co.q_sample_random,  # rows-only (Ray-seeded sampler)
        "sample_stratified": co.q_sample_stratified,
        "pack_sequences": co.q_pack_sequences,  # oracle-exact (FFD replayed)
        "asof_join": co.q_asof_join,
        "group_topk": co.q_group_topk,
        "dedup_blocking_stats": co.q_dedup_blocking_stats,  # rows-only (perm-dependent candidates)
        "group_corr": co.q_group_corr,
        "group_wmedian": co.q_group_wmedian,
        "value_bins": co.q_value_bins,
        "value_quantiles": co.q_value_quantiles,
        "group_quantiles": co.q_group_quantiles,
        "group_mad": co.q_group_mad,
        "range_join": co.q_range_join,
        "rolling_window": co.q_rolling_window,
        "semi_join": co.q_semi_join,
        "anti_join": co.q_anti_join,
        "pricing_summary": co.q_pricing_summary,
        "ngram_counts": co.q_ngram_counts,
        "phrase_search": co.q_phrase_search,
        "revenue_by_nation": co.q_revenue_by_nation,
        "above_nation_avg": co.q_above_nation_avg,
        "profit_by_nation_brand": co.q_profit_by_nation_brand,
        "event_pivot": co.q_event_pivot,
        "group_moments": co.q_group_moments,
        "set_intersect": co.q_set_intersect,
        "set_except": co.q_set_except,
        "user_gaps": co.q_user_gaps,
        "pricing_rollup": co.q_pricing_rollup,
        "pricing_cube": co.q_pricing_cube,
        "running_total": co.q_running_total,
        "value_histogram": co.q_value_histogram,
        "customer_order_counts": co.q_customer_order_counts,
        "funnel": co.q_funnel,
        "retention": co.q_retention,
        "user_mode": co.q_user_mode,
        "tfidf": co.q_tfidf,
        "event_quartiles": co.q_event_quartiles,
        "event_melt": co.q_event_melt,
        "event_share": co.q_event_share,
        "semi_join_bloom": co.q_semi_join_bloom,
        "anti_join_bloom": co.q_anti_join_bloom,
        "split_assign": co.q_split_assign,
        "group_outliers": co.q_group_outliers,
        "value_quantiles_cont": co.q_value_quantiles_cont,
        "above_avg_orders": co.q_above_avg_orders,
        "doc_repetition": co.q_doc_repetition,
        "users_cumulative": co.q_users_cumulative,
        "value_mad": co.q_value_mad,
        "doc_chunks": co.q_doc_chunks,
        "group_quantiles_cont": co.q_group_quantiles_cont,
        "latest_event": co.q_latest_event,
        "event_intervals": co.q_event_intervals,
        "event_ranks": co.q_event_ranks,
        "user_top_event": co.q_user_top_event,
        "event_anomalies": co.q_event_anomalies,
        "profile_orders": co.q_profile_orders,
        # rows-only: forced HLL cutover, estimate has no SQL mirror;
        # the ±1.6% certificate is pytest-pinned
        "profile_orders_sketch": co.q_profile_orders_sketch,
        "order_key_agg": co.q_order_key_agg,
        "moving_sum": co.q_moving_sum,
        "kg_degree_hist": co.q_kg_degree_hist,
        "kg_bfs": co.q_kg_bfs,
        # rows-only: mergeable-sketch results are block-layout-dependent
        # by contract; the rank-error certificate is pytest-pinned
        "value_quantiles_sketch": co.q_value_quantiles_sketch,
        "sample_bottomk": co.q_sample_bottomk,
        "user_daily_dense": co.q_user_daily_dense,
        "event_transitions": co.q_event_transitions,
        "event_cooccurrence": co.q_event_cooccurrence,
        "curate_corpus": co.q_curate_corpus,
        # rows-only: CMS candidate set is block-local by design;
        # guarantees pytest-pinned (tests/test_curation.py)
        "token_topk_cms": co.q_token_topk_cms,
        "user_active_time": co.q_user_active_time,
        "locf_fill": co.q_locf_fill,
        "active_users_7d": co.q_active_users_7d,
        "winsorize": co.q_winsorize,
        "top_orders_ties": co.q_top_orders_ties,
        "users_vs_customers": co.q_users_vs_customers,
        "time_weighted": co.q_time_weighted,
        "multi_grain": co.q_multi_grain,
        "term_postings": co.q_term_postings,
        "embedding_dim_stats": co.q_embedding_dim_stats,
        "user_streaks": co.q_user_streaks,
        "supplier_ranks": co.q_supplier_ranks,
        "q3_top_orders": co.q_q3_top_orders,
        "q6_revenue": co.q_q6_revenue,
        "monthly_revenue_delta": co.q_monthly_revenue_delta,
        "part_top_brands": co.q_part_top_brands,
        "hourly_activity": co.q_hourly_activity,
        "session_summary": co.q_session_summary,
        "weekday_heatmap": co.q_weekday_heatmap,
        "q4_order_priority": co.q_q4_order_priority,
        "q14_promo_share": co.q_q14_promo_share,
        "q15_top_supplier": co.q_q15_top_supplier,
        "q17_small_qty": co.q_q17_small_qty_revenue,
        "q18_volume_customers": co.q_q18_volume_customers,
        "q22_idle_customers": co.q_q22_idle_customers,
        "q10_returned_items": co.q_q10_returned_items,
        "pq_topk": co.q_pq_topk,  # oracle-exact since r5 (integer PQ)
        "pq_recall": co.q_pq_recall,  # oracle-exact since r5
        "event_disorder": co.q_event_disorder,
        "fk_audit": co.q_fk_audit,
        "sample_weighted": co.q_sample_weighted,
        "q16_supplier_counts": co.q_q16_supplier_counts,
        "q2_min_cost_shipper": co.q_q2_min_cost_shipper,
        "event_bursts": co.q_event_bursts,
        "q7_nation_volume": co.q_q7_nation_volume,
        "q19_disjunctive_revenue": co.q_q19_disjunctive_revenue,
        "q12_late_shipments": co.q_q12_late_shipments,
        "kg_paths": _q_kg_paths,
        "kg_descendants": _q_kg_descendants,
        "kg_diff": _q_kg_diff,
        "kg_pred_trend": _q_kg_pred_trend,
        "kg_rpq": _q_kg_rpq,
        "kg_snapshot": _q_kg_snapshot,
        "kg_validity": _q_kg_validity,
        "kg_validity_incremental": _q_kg_validity_incremental,
        "kg_volatility": _q_kg_volatility,
        "kg_conv_hist": _q_kg_conv_hist,
        "kg_bowtie": _q_kg_bowtie,  # oracle-exact (mutual-reach SCC)
        "kg_richclub": _q_kg_richclub,
        "kg_triadic_closure": _q_kg_triadic_closure,
        "kg_reciprocity_lag": _q_kg_reciprocity_lag,
        "kg_entity_lifetimes": _q_kg_entity_lifetimes,
        "kg_belief_curve": _q_kg_belief_curve,
        "kg_component_sizes": _q_kg_component_sizes,
        "kg_hop_hist": _q_kg_hop_hist,
        "kg_rpq_typed": _q_kg_rpq_typed,
        "kg_closure_quantiles": _q_kg_closure_quantiles,
        "kg_pred_anomalies": _q_kg_pred_anomalies,
        "conv_first_assertion": _q_conv_first_assertion,
        "decontaminate_bloom": co.q_decontaminate_bloom,  # oracle-exact (md5 bloom replay)
        "kg_dyad_census": _q_kg_dyad_census,
        "kg_triad_census": _q_kg_triad_census,
        "kg_squares": _q_kg_squares,
        "kg_outdeg_hist": _q_kg_outdeg_hist,
        "conv_yield_corr": _q_conv_yield_corr,
        "q8_market_share": co.q_q8_market_share,
        "split_leakage": co.q_split_leakage,
        "q11_important_parts": co.q_q11_important_parts,
        "q20_dominant_suppliers": co.q_q20_dominant_suppliers,
        "q21_waiting_suppliers": co.q_q21_waiting_suppliers,
        "kg_lift": _q_kg_lift,
        "collocations": co.q_collocations,
        "kg_eff_diameter": _q_kg_eff_diameter,  # oracle-exact (md5-60 nf)
        "kg_betweenness": _q_kg_betweenness,  # oracle-exact (fixed-point δ)
    }


_JACCARD_ORACLE_SQL = """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            sh AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(t) - 1, 2)),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
                FROM toks),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT i AS doc_a, j AS doc_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = i
            JOIN sizes sb ON sb.doc_id = j
            WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
        """


def oracle_sql() -> dict[str, str]:
    from joint_entity_and_relation_extraction_ray.pipelines import corpus_ops as co

    g = str(_SF001)
    walks_sql = f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            e AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            sym AS MATERIALIZED (
                SELECT DISTINCT src, dst FROM (
                    SELECT subj_id AS src, obj_id AS dst FROM e
                    UNION ALL
                    SELECT obj_id, subj_id FROM e
                ) WHERE src <> dst
            ),
            adj AS MATERIALIZED (
                SELECT src, dst,
                       CAST(row_number() OVER (PARTITION BY src
                                               ORDER BY dst) - 1
                            AS BIGINT) AS rnk,
                       CAST(count(*) OVER (PARTITION BY src)
                            AS BIGINT) AS deg
                FROM sym
            ),
            starts AS (SELECT DISTINCT src AS start FROM sym),
            wk AS (
                SELECT start, CAST(w.walk AS BIGINT) AS walk,
                       CAST(0 AS BIGINT) AS step, start AS node
                FROM starts
                CROSS JOIN (SELECT unnest(range(2)) AS walk) w
                UNION ALL
                SELECT wk.start, wk.walk, wk.step + 1, a.dst
                FROM wk JOIN adj a ON a.src = wk.node
                 AND a.rnk = ('0x' || substr(md5(wk.node || '|'
                         || CAST(wk.step AS VARCHAR) || '|'
                         || CAST(wk.walk AS VARCHAR)), 1, 15))::BIGINT
                     % a.deg
                WHERE wk.step < 3
            )
            SELECT start, walk, step, node FROM wk ORDER BY 1, 2, 3
        """  # shared by kg_walks and kg_skipgrams

    def _pr_sql(*, weighted: bool = False, ppr: bool = False) -> str:
        """Fixed-point PageRank mirror of `stages/graph.pagerank(
        fixed_point=True)`: ranks are int64 parts-per-10¹², every floor
        division appears in the same order as the engine's, integer sums
        are reduction-order-independent — bit-exact on any engine."""
        scale = 10**12
        if weighted:
            w_col = ", COUNT(*) AS w"
            od = "SELECT src, SUM(w) AS d FROM ed GROUP BY src"
            ed2 = """SELECT src, dst, w, 0 AS z FROM ed
                     UNION ALL SELECT m, m, 0, 1 FROM nds"""
            contrib = "(p.rank * e2.w) // od.d"
        else:
            w_col = ""
            od = "SELECT src, COUNT(*) AS d FROM ed GROUP BY src"
            ed2 = """SELECT src, dst, 0 AS z FROM ed
                     UNION ALL SELECT m, m, 1 FROM nds"""
            contrib = "p.rank // od.d"
        # The recursive working table is scanned exactly ONCE per
        # iteration: self zero-edges in ed2 carry the node universe and
        # (via dm) the dangling mass, and the dangling total reaches
        # every group as a window over the grouped result. DuckDB 1.0
        # quirk: a bare UNION in a non-recursive CTE INSIDE a WITH
        # RECURSIVE body does NOT dedup — hence the explicit DISTINCT
        # in nds (a duplicated node universe silently corrupts every
        # iteration's mass).
        if ppr:
            upd = f"""(85 * SUM(x.c)) // 100
                     + CASE WHEN x.node = (SELECT MIN(m) FROM nds)
                            THEN (15 * {scale}
                                  + 85 * (SUM(SUM(x.dm)) OVER ())) // 100
                            ELSE 0 END"""
        else:
            upd = f"""(85 * SUM(x.c)
                       + 85 * (SUM(SUM(x.dm)) OVER () // nn.cnt)
                       + 15 * ({scale} // nn.cnt)) // 100"""
        return f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            ed AS MATERIALIZED (
                SELECT s.entity_id AS src, o.entity_id AS dst{w_col}
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
                GROUP BY s.entity_id, t.pred, o.entity_id
            ),
            nds AS MATERIALIZED (
                SELECT DISTINCT m FROM (
                    SELECT src AS m FROM ed UNION ALL SELECT dst FROM ed)
            ),
            nn AS MATERIALIZED (SELECT COUNT(*) AS cnt FROM nds),
            od AS MATERIALIZED ({od}),
            ed2 AS MATERIALIZED ({ed2}),
            pr(iter, node, rank) AS (
                SELECT 0, m, {scale} // nn.cnt FROM nds, nn
                UNION ALL
                SELECT MIN(x.iter) + 1, x.node, {upd}
                FROM (
                    SELECT p.iter, e2.dst AS node,
                           CASE WHEN e2.z = 1 THEN 0
                                ELSE {contrib} END AS c,
                           CASE WHEN e2.z = 1 AND od.d IS NULL
                                THEN p.rank ELSE 0 END AS dm
                    FROM pr p
                    JOIN ed2 e2 ON e2.src = p.node
                    LEFT JOIN od ON od.src = p.node
                ) x, nn
                WHERE x.iter < 10
                GROUP BY x.node, nn.cnt
            )
            SELECT node, CAST(rank AS BIGINT) AS rank
            FROM pr WHERE iter = 10
        """

    def _hits_sql(iters: int = 8) -> str:
        """Fixed-point HITS mirror of `stages/graph.hits(fixed_point=
        True)`: scores are int64 parts-per-10¹², each double-step
        (auth = normalize(Eᵀ·hub); hub = normalize(E·auth)) normalizes by
        the ceil(T/scale) divisor. The recursion carries only the hub
        vector and scans it ONCE per iteration (nested derived tables —
        see _pr_sql on DuckDB's multi-reference hazard); the final auth
        vector is recomputed outside the recursion from hub@(iters-1),
        which is exactly how the engine's last iteration produced it."""
        scale = 10**12
        norm = (
            f"((SUM(SUM(y.h)) OVER () + {scale} - 1) // {scale})"
        )
        return f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            ed AS MATERIALIZED (
                SELECT DISTINCT s.entity_id AS src, o.entity_id AS dst
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            nds AS MATERIALIZED (
                SELECT DISTINCT m FROM (
                    SELECT src AS m FROM ed UNION ALL SELECT dst FROM ed)
            ),
            e2a AS MATERIALIZED (
                SELECT src, dst, 0 AS z FROM ed
                UNION ALL SELECT m, m, 1 FROM nds
            ),
            hb(iter, node, hub) AS (
                SELECT 0, m, {scale} FROM nds
                UNION ALL
                SELECT MIN(y.it) + 1, y.node,
                       CASE WHEN SUM(SUM(y.h)) OVER () = 0 THEN 0
                            ELSE SUM(y.h) // {norm} END
                FROM (
                    SELECT a.it, e2b.src AS node,
                           CASE WHEN e2b.z = 1 THEN 0 ELSE a.auth END AS h
                    FROM (
                        SELECT ar.it, ar.node,
                               CASE WHEN SUM(ar.rawsum) OVER () = 0 THEN 0
                                    ELSE ar.rawsum
                                         // ((SUM(ar.rawsum) OVER ()
                                              + {scale} - 1) // {scale})
                               END AS auth
                        FROM (
                            SELECT x.it, x.node, SUM(x.c) AS rawsum
                            FROM (
                                SELECT p.iter AS it, e2a.dst AS node,
                                       CASE WHEN e2a.z = 1 THEN 0
                                            ELSE p.hub END AS c
                                FROM hb p JOIN e2a ON e2a.src = p.node
                            ) x
                            GROUP BY x.it, x.node
                        ) ar
                    ) a
                    JOIN e2a e2b ON e2b.dst = a.node
                ) y
                WHERE y.it < {iters}
                GROUP BY y.node
            ),
            araw AS (
                SELECT e2a.dst AS node,
                       SUM(CASE WHEN e2a.z = 1 THEN 0 ELSE p.hub END)
                           AS rawsum
                FROM hb p JOIN e2a ON e2a.src = p.node
                WHERE p.iter = {iters} - 1
                GROUP BY e2a.dst
            ),
            afin AS (
                SELECT node,
                       CASE WHEN (SELECT SUM(rawsum) FROM araw) = 0 THEN 0
                            ELSE rawsum
                                 // (((SELECT SUM(rawsum) FROM araw)
                                      + {scale} - 1) // {scale})
                       END AS authority
                FROM araw
            )
            SELECT h.node, CAST(h.hub AS BIGINT) AS hub,
                   CAST(a.authority AS BIGINT) AS authority
            FROM hb h JOIN afin a ON a.node = h.node
            WHERE h.iter = {iters}
        """

    def _hyperball_sql(kind: str, hops: int, p: int = 10) -> str:
        """md5-60 HyperBall mirror of `stages/graph._hyperball_iter` +
        `_hll_counts`: DuckDB recomputes the IDENTICAL registers
        (md5-60 → top-p index, suffix-rank via exact bin-length), keeps
        Z⁻¹ as the exact integer S = Σ 2^(R−reg), and reads the same
        floor(NUM/S + 0.5) (or m·ln(m/zeros) linear-counting branch —
        same libm as the engine's math.log). Ball membership is bounded-
        hop reachability, so no register-carrying recursion is needed:
        B_t(v)'s registers are a GROUP BY MAX over members' singletons.
        kind: 'ball' (per-node est, forward), 'nf' (Σ per hop, forward),
        'harmonic' (telescoped in-ball deltas, reverse), 'effdiam'
        (90th-pct readout of nf)."""
        from joint_entity_and_relation_extraction_ray.stages.graph import (
            _hll_estimate_num,
        )

        m = 1 << p
        q = 60 - p
        R = q + 1
        num = repr(_hll_estimate_num(p))
        mask = (1 << q) - 1
        step = (
            "e.dst AS s, e.src AS d" if kind == "harmonic"
            else "e.src AS s, e.dst AS d"
        )
        est_expr = f"""
                CASE WHEN {num} / s <= {2.5 * m} AND zeros > 0
                     THEN {m} * ln({float(m)} / zeros)
                     ELSE {num} / s END
        """
        core = f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT mm.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') mm
                JOIN best b
                  ON lower(mm.surface) = b.alias
                 AND mm.ent_type = b.ent_type
            ),
            ed AS MATERIALIZED (
                SELECT DISTINCT {step}
                FROM (
                    SELECT s.entity_id AS src, o.entity_id AS dst
                    FROM read_parquet('{g}/golden_triples/*.parquet') t
                    JOIN lm s ON t.subj_mention_id = s.mention_id
                    JOIN lm o ON t.obj_mention_id = o.mention_id
                ) e
            ),
            nds AS MATERIALIZED (
                SELECT DISTINCT n FROM (
                    SELECT s AS n FROM ed UNION ALL SELECT d FROM ed)
            ),
            reach(v, w, dd) AS (
                SELECT n, n, 0 FROM nds
                UNION
                SELECT r.v, e.d, r.dd + 1
                FROM reach r JOIN ed e ON e.s = r.w
                WHERE r.dd < {hops}
            ),
            ball AS MATERIALIZED (
                SELECT v, w, MIN(dd) AS dmin FROM reach GROUP BY v, w
            ),
            hh AS MATERIALIZED (
                SELECT w,
                       ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
                FROM (SELECT DISTINCT w FROM ball)
            ),
            sing AS MATERIALIZED (
                SELECT b.v, b.dmin, hh.h >> {q} AS idx,
                       CASE WHEN (hh.h & {mask}) = 0 THEN {R}
                            ELSE {R} - length(bin(hh.h & {mask}))
                       END AS rnk
                FROM ball b JOIN hh ON hh.w = b.w
            ),
        """
        if kind == "ball":
            return core + f"""
            regs AS (
                SELECT v, idx, MAX(rnk) AS reg FROM sing
                GROUP BY v, idx
            ),
            agg AS (
                SELECT v,
                       SUM(1::BIGINT << ({R} - reg))
                         + ({m} - COUNT(*)) * (1::BIGINT << {R}) AS s,
                       {m} - COUNT(*) AS zeros
                FROM regs GROUP BY v
            )
            SELECT v AS node,
                   CAST(floor(({est_expr}) + 0.5) AS BIGINT) AS reach_est
            FROM agg
            """
        nf_core = f"""
            hop_series AS (SELECT unnest(range({hops} + 1)) AS t),
            regs AS (
                SELECT hs.t, si.v, si.idx, MAX(si.rnk) AS reg
                FROM hop_series hs JOIN sing si ON si.dmin <= hs.t
                GROUP BY hs.t, si.v, si.idx
            ),
            agg AS (
                SELECT t, v,
                       SUM(1::BIGINT << ({R} - reg))
                         + ({m} - COUNT(*)) * (1::BIGINT << {R}) AS s,
                       {m} - COUNT(*) AS zeros
                FROM regs GROUP BY t, v
            ),
            pernode AS (
                SELECT t, v,
                       CAST(floor(({est_expr}) + 0.5) AS BIGINT) AS c
                FROM agg
            ),
        """
        if kind == "nf":
            return core + nf_core + """
            nf AS (SELECT t, SUM(c) AS nf_est FROM pernode GROUP BY t)
            SELECT CAST(t AS BIGINT) AS hop,
                   CAST(nf_est AS BIGINT) AS nf_est
            FROM nf
            """
        if kind == "effdiam":
            return core + nf_core + """
            nf AS (SELECT t, SUM(c) AS nf_est FROM pernode GROUP BY t),
            mx AS (SELECT nf_est AS nf_last FROM nf
                   WHERE t = (SELECT MAX(t) FROM nf)),
            hit AS (
                SELECT MIN(t) AS eff FROM nf, mx
                WHERE nf.nf_est * 10 >= 9 * mx.nf_last
            )
            SELECT CAST(h.eff AS BIGINT) AS eff_diameter,
                   CAST((SELECT nf_est FROM nf WHERE t = h.eff) AS BIGINT)
                       AS nf_at_diameter,
                   CAST(m2.nf_last AS BIGINT) AS nf_max
            FROM hit h, mx m2
            """
        # harmonic: telescoped per-node deltas over in-balls, weights
        # 1/t, additions left-assoc exactly like the engine's acc loop
        pivots = ", ".join(
            f"MAX(CASE WHEN t = {t} THEN c END) AS c{t}"
            for t in range(hops + 1)
        )
        terms = " + ".join(
            f"greatest(c{t} - c{t - 1}, 0) / {float(t)!r}"
            for t in range(1, hops + 1)
        )
        return core + nf_core + f"""
            wide AS (
                SELECT v, {pivots} FROM pernode GROUP BY v
            )
            SELECT v AS node, ({terms}) AS harmonic FROM wide
            """

    out = {
        # The pipeline's emitted span/triple sets must equal the closed-form
        # goldens of the seeded grammar (P/R contract, BASELINE.json:14).
        "extract_mentions": f"""
            SELECT conv_id, turn_idx, mention_id, "start", "end", surface, ent_type
            FROM read_parquet('{g}/golden_mentions/*.parquet')
        """,
        "extract_triples": f"""
            SELECT conv_id, turn_idx, subj_mention_id, obj_mention_id,
                   subj_surface, pred, obj_surface
            FROM read_parquet('{g}/golden_triples/*.parquet')
        """,
        # Deterministic-linker oracle: best candidate = max prior, then min
        # entity_id, among type-matching aliases (stages/linker.py).
        "link_mentions": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            )
            SELECT m.conv_id, m.turn_idx, m.mention_id, m.surface, m.ent_type,
                   b.entity_id AS cand_entity_id
            FROM read_parquet('{g}/golden_mentions/*.parquet') m
            LEFT JOIN best b
              ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
        """,
        # On this corpus every surface is in the alias dictionary, so each
        # co-reference cluster contains exactly one entity and the CC
        # fixpoint label is the linked entity id (generic CC incl. chains
        # and unlinked clusters is oracle-tested in pytest vs union-find).
        "canonicalize": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            )
            SELECT m.mention_id AS member_id, b.entity_id AS canonical_id
            FROM read_parquet('{g}/golden_mentions/*.parquet') m
            JOIN best b
              ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
        """,
        "kg_edges": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            )
            SELECT s.entity_id AS subj_id, t.pred, o.entity_id AS obj_id,
                   COUNT(*) AS weight,
                   MIN(t.ts) AS first_ts, MAX(t.ts) AS last_ts
            FROM read_parquet('{g}/golden_triples/*.parquet') t
            JOIN lm s ON t.subj_mention_id = s.mention_id
            JOIN lm o ON t.obj_mention_id = o.mention_id
            GROUP BY 1, 2, 3
        """,
        # ingest lineage: per-conversation KG contribution (triples,
        # distinct preds, distinct linked entities; full outer so convs
        # with mentions but no triples still appear)
        "conv_kg_profile": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            tri AS (
                SELECT conv_id, CAST(count(*) AS BIGINT) AS n_triples,
                       CAST(count(DISTINCT pred) AS BIGINT) AS n_preds
                FROM read_parquet('{g}/golden_triples/*.parquet')
                GROUP BY 1),
            ent AS (
                SELECT m.conv_id,
                       CAST(count(DISTINCT b.entity_id) AS BIGINT)
                           AS n_entities
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
                GROUP BY 1)
            SELECT coalesce(tri.conv_id, ent.conv_id) AS conv_id,
                   coalesce(tri.n_triples, 0) AS n_triples,
                   coalesce(tri.n_preds, 0) AS n_preds,
                   coalesce(ent.n_entities, 0) AS n_entities
            FROM tri FULL OUTER JOIN ent ON tri.conv_id = ent.conv_id
        """,
        # entity-page serving rollup: both directions + dominant
        # outgoing predicate (weight desc, pred asc) over the edge CTE
        "kg_entity_page": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            e AS (
                SELECT s.entity_id AS subj_id, t.pred,
                       o.entity_id AS obj_id, COUNT(*) AS weight
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
                GROUP BY 1, 2, 3
            ),
            o AS (
                SELECT subj_id AS entity_id,
                       CAST(count(*) AS BIGINT) AS out_deg,
                       CAST(sum(weight) AS BIGINT) AS out_weight,
                       CAST(count(DISTINCT pred) AS BIGINT) AS n_preds
                FROM e GROUP BY 1),
            i AS (
                SELECT obj_id AS entity_id,
                       CAST(count(*) AS BIGINT) AS in_deg,
                       CAST(sum(weight) AS BIGINT) AS in_weight
                FROM e GROUP BY 1),
            pw AS (
                SELECT subj_id AS entity_id, pred, sum(weight) AS w
                FROM e GROUP BY 1, 2),
            tp AS (
                SELECT entity_id, pred FROM (
                    SELECT entity_id, pred,
                           row_number() OVER (
                               PARTITION BY entity_id
                               ORDER BY w DESC, pred) AS rn
                    FROM pw) WHERE rn = 1)
            SELECT coalesce(o.entity_id, i.entity_id) AS entity_id,
                   coalesce(o.out_deg, 0) AS out_deg,
                   coalesce(o.out_weight, 0) AS out_weight,
                   coalesce(i.in_deg, 0) AS in_deg,
                   coalesce(i.in_weight, 0) AS in_weight,
                   coalesce(o.n_preds, 0) AS n_preds,
                   tp.pred AS top_pred
            FROM o FULL OUTER JOIN i ON o.entity_id = i.entity_id
            LEFT JOIN tp
              ON coalesce(o.entity_id, i.entity_id) = tp.entity_id
        """,
        # time-travel KG: same edge CTE restricted to assertions with
        # ts <= the cutoff (weights re-aggregate over the as-of subset)
        "kg_asof": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            )
            SELECT s.entity_id AS subj_id, t.pred, o.entity_id AS obj_id,
                   COUNT(*) AS weight,
                   MIN(t.ts) AS first_ts, MAX(t.ts) AS last_ts
            FROM read_parquet('{g}/golden_triples/*.parquet') t
            JOIN lm s ON t.subj_mention_id = s.mention_id
            JOIN lm o ON t.obj_mention_id = o.mention_id
            WHERE t.ts <= TIMESTAMP '2024-01-15 00:00:00'
            GROUP BY 1, 2, 3
        """,
        # incremental-maintenance invariant: per-batch edges folded by
        # merge_edges must equal the FULL-corpus edge set — same oracle
        # text as kg_edges on purpose (stages/graph.merge_edges)
        "kg_edges_incremental": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            )
            SELECT s.entity_id AS subj_id, t.pred, o.entity_id AS obj_id,
                   COUNT(*) AS weight,
                   MIN(t.ts) AS first_ts, MAX(t.ts) AS last_ts
            FROM read_parquet('{g}/golden_triples/*.parquet') t
            JOIN lm s ON t.subj_mention_id = s.mention_id
            JOIN lm o ON t.obj_mention_id = o.mention_id
            GROUP BY 1, 2, 3
        """,
        # per-predicate profile over the SAME canonical edge set as
        # kg_edges (exact distinct endpoints; __ray_entry__
        # _q_kg_pred_profile)
        # lexical retrieval top-20 for query {hash, join, merge}: exact
        # integer tf scoring, deterministic (score DESC, n_terms DESC,
        # doc_id) order (stages/similarity.lexical_topk)
        "lexical_topk": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
                FROM documents WHERE trim(text) <> ''),
            m AS (
                SELECT doc_id,
                       count(*) AS score,
                       count(DISTINCT tok) AS n_terms
                FROM toks WHERE tok IN ('hash', 'join', 'merge')
                GROUP BY 1)
            SELECT doc_id, score, n_terms FROM m
            ORDER BY score DESC, n_terms DESC, doc_id
            LIMIT 20
        """,
        # per (pred, day) assertion throughput with exact distinct convs
        # (stages/graph.pred_daily; pipeline triples == seeded goldens by
        # the P/R = 1.0 contract, same convention as kg_pred_profile)
        "kg_pred_daily": f"""
            SELECT pred, CAST(ts AS DATE) AS day,
                   count(*) AS n_assertions,
                   count(DISTINCT conv_id) AS n_convs
            FROM read_parquet('{g}/golden_triples/*.parquet')
            GROUP BY 1, 2
        """,
        "kg_pred_profile": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            e AS (
                SELECT s.entity_id AS subj_id, t.pred, o.entity_id AS obj_id,
                       COUNT(*) AS weight
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
                GROUP BY 1, 2, 3
            )
            SELECT pred,
                   count(*) AS n_edges,
                   CAST(sum(weight) AS BIGINT) AS total_weight,
                   count(DISTINCT subj_id) AS n_subj,
                   count(DISTINCT obj_id) AS n_obj
            FROM e GROUP BY 1
        """,
        # predicate type signatures: counts per (pred, subj_type,
        # obj_type) — the ontology audit (__ray_entry__
        # _q_kg_pred_signatures: two mention joins + combiner count)
        "kg_pred_signatures": f"""
            SELECT t.pred,
                   ms.ent_type AS subj_type,
                   mo.ent_type AS obj_type,
                   count(*) AS n
            FROM read_parquet('{g}/golden_triples/*.parquet') t
            JOIN read_parquet('{g}/golden_mentions/*.parquet') ms
              ON t.subj_mention_id = ms.mention_id
            JOIN read_parquet('{g}/golden_mentions/*.parquet') mo
              ON t.obj_mention_id = mo.mention_id
            GROUP BY 1, 2, 3
        """,
        # ±20-char context windows around each golden mention span
        # (stages/linker.py mention_contexts; spans are 0-based [start,
        # end) chars, substr is 1-based → off = greatest(start-20, 0)+1)
        "mention_contexts": f"""
            SELECT m.conv_id, m.turn_idx, m.mention_id,
                   substr(t.text,
                          greatest(m."start" - 20, 0) + 1,
                          m."end" + 20 - greatest(m."start" - 20, 0)) AS ctx
            FROM read_parquet('{g}/golden_mentions/*.parquet') m
            JOIN read_parquet('{g}/transcripts/*.parquet') t
              USING (conv_id, turn_idx)
        """,
        # SCD-1 keep-latest over the same rewritten stream as kg_edges:
        # newest object per (subj, pred), ties to min obj (graph.py
        # latest_assertion)
        "kg_latest_assertion": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            rt AS (
                SELECT s.entity_id AS subj_id, t.pred,
                       o.entity_id AS obj_id, t.ts
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            )
            SELECT subj_id, pred, obj_id, ts
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY subj_id, pred
                    ORDER BY ts DESC, obj_id
                ) AS rn FROM rt
            ) WHERE rn = 1
        """,
        "kg_two_hop": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            edges AS (
                SELECT s.entity_id AS subj_id, t.pred, o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
                GROUP BY 1, 2, 3
            )
            SELECT e1.pred AS pred1, e2.pred AS pred2,
                   count(*) AS n_paths
            FROM edges e1 JOIN edges e2 ON e1.obj_id = e2.subj_id
            GROUP BY 1, 2
        """,
        "kg_pred_rules": f"""
            WITH b AS (
                SELECT DISTINCT conv_id, pred
                FROM read_parquet('{g}/golden_triples/*.parquet')),
            nu AS (SELECT count(DISTINCT conv_id) AS n FROM b),
            supp AS (SELECT pred, count(*) AS n FROM b GROUP BY 1),
            pairs AS (
                SELECT x.pred AS antecedent, y.pred AS consequent,
                       count(*) AS n_both
                FROM b x JOIN b y ON x.conv_id = y.conv_id
                                 AND x.pred <> y.pred
                GROUP BY 1, 2)
            SELECT p.antecedent, p.consequent,
                   CAST(p.n_both AS BIGINT) AS n_both,
                   CAST(sa.n AS BIGINT) AS n_ante,
                   CAST(p.n_both * 1000000 // sa.n AS BIGINT)
                       AS confidence_ppm,
                   CAST(p.n_both * nu.n * 1000000 // (sa.n * sb.n)
                        AS BIGINT) AS lift_ppm
            FROM pairs p
            JOIN supp sa ON sa.pred = p.antecedent
            JOIN supp sb ON sb.pred = p.consequent
            CROSS JOIN nu
        """,
        "kg_pred_roles": f"""
            SELECT t.pred, x.role, CAST(count(*) AS BIGINT) AS n_assertions
            FROM read_parquet('{g}/golden_triples/*.parquet') t
            JOIN read_parquet('{g}/transcripts/*.parquet') x
              ON t.conv_id = x.conv_id AND t.turn_idx = x.turn_idx
            GROUP BY 1, 2
        """,
        "kg_temporal_two_hop": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            edges AS (
                SELECT s.entity_id AS subj_id, t.pred,
                       o.entity_id AS obj_id, min(t.ts) AS first_ts
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
                GROUP BY 1, 2, 3
            )
            SELECT e1.pred AS pred1, e2.pred AS pred2,
                   CAST(count(*) AS BIGINT) AS n_paths,
                   CAST(sum(CASE WHEN e1.first_ts <= e2.first_ts
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_temporal
            FROM edges e1 JOIN edges e2 ON e1.obj_id = e2.subj_id
            GROUP BY 1, 2
        """,
        # MATERIALIZED CTEs are load-bearing: inlined, DuckDB re-expands
        # `und` three times into a catastrophic plan (measured >30 min;
        # materialized, the same query is <1 s)
        "kg_triangles": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            edges AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            und AS MATERIALIZED (
                SELECT DISTINCT least(subj_id, obj_id) AS a,
                                greatest(subj_id, obj_id) AS b
                FROM edges WHERE subj_id <> obj_id
            )
            SELECT count(*) AS n_triangles
            FROM und e1
            JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
        """,
        # BFS = recursive reachability with min hop count; the d < 6 cap
        # mirrors the Ray side's max_hops=6
        # weighted bounded-hop SSSP: min path cost within ≤4 edges;
        # parallel (pred) edges stay parallel — min() resolves, exactly
        # like the engine's relax + min-merge
        "kg_sssp": f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            wedges AS MATERIALIZED (
                SELECT s.entity_id AS src, t.pred, o.entity_id AS dst,
                       COUNT(*) AS w
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
                GROUP BY 1, 2, 3
            ),
            sym AS MATERIALIZED (
                SELECT src, dst, w FROM wedges
                UNION ALL SELECT dst, src, w FROM wedges
            ),
            reach(node, d, hops) AS (
                SELECT (SELECT min(src) FROM sym), 0, 0
                UNION
                SELECT s.dst, r.d + s.w, r.hops + 1
                FROM reach r JOIN sym s ON s.src = r.node
                WHERE r.hops < 4
            )
            SELECT node, CAST(min(d) AS BIGINT) AS dist
            FROM reach GROUP BY node
        """,
        "kg_bfs": f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            edges AS MATERIALIZED (
                SELECT DISTINCT s.entity_id AS src, o.entity_id AS dst
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            sym AS MATERIALIZED (
                SELECT src, dst FROM edges
                UNION SELECT dst, src FROM edges
            ),
            reach(node, d) AS (
                SELECT (SELECT min(src) FROM sym), 0
                UNION
                SELECT s.dst, r.d + 1
                FROM reach r JOIN sym s ON s.src = r.node
                WHERE r.d < 6
            )
            SELECT node, CAST(min(d) AS BIGINT) AS dist
            FROM reach GROUP BY node
        """,
        # one-row build health report (pipelines/kg.build_report);
        # link_rate is one IEEE double division on both sides
        "kg_report": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            wedges AS (
                SELECT s.entity_id AS subj_id, t.pred,
                       o.entity_id AS obj_id, COUNT(*) AS w
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
                GROUP BY 1, 2, 3
            )
            SELECT
                (SELECT count(*) FROM
                    read_parquet('{g}/golden_mentions/*.parquet'))
                    AS n_mentions,
                (SELECT count(*) FROM
                    read_parquet('{g}/golden_triples/*.parquet'))
                    AS n_triples,
                (SELECT count(*) FROM lm) AS n_linked,
                (SELECT CAST(count(*) AS DOUBLE) FROM lm)
                    / (SELECT CAST(count(*) AS DOUBLE) FROM
                       read_parquet('{g}/golden_mentions/*.parquet'))
                    AS link_rate,
                (SELECT count(DISTINCT entity_id) FROM lm)
                    AS n_entities_linked,
                (SELECT count(*) FROM wedges) AS n_edges,
                (SELECT CAST(sum(w) AS BIGINT) FROM wedges) AS total_weight
        """,
        # positional mention profile per entity type with exact distinct
        # convs (stages/linker.mention_positions; pipeline mentions ==
        # seeded goldens by the P/R = 1.0 contract)
        "mention_positions": f"""
            SELECT ent_type, CAST(turn_idx AS BIGINT) AS turn_idx,
                   count(*) AS n_mentions,
                   count(DISTINCT conv_id) AS n_convs
            FROM read_parquet('{g}/golden_mentions/*.parquet')
            GROUP BY 1, 2
        """,
        # induced 1-hop ego network of the min node id: recursive
        # reachability bounds the node set, then the weighted edge CTE
        # (same as kg_edges) keeps edges with BOTH endpoints inside
        # (stages/graph.ego_subgraph)
        "kg_ego": f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            wedges AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, t.pred,
                       o.entity_id AS obj_id, COUNT(*) AS weight
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
                GROUP BY 1, 2, 3
            ),
            sym AS MATERIALIZED (
                SELECT subj_id AS src, obj_id AS dst FROM wedges
                UNION SELECT obj_id, subj_id FROM wedges
            ),
            reach(node, d) AS (
                SELECT (SELECT min(src) FROM sym), 0
                UNION
                SELECT s.dst, r.d + 1
                FROM reach r JOIN sym s ON s.src = r.node
                WHERE r.d < 1
            ),
            nodes AS (SELECT DISTINCT node FROM reach)
            SELECT subj_id, pred, obj_id, weight
            FROM wedges
            WHERE subj_id IN (SELECT node FROM nodes)
              AND obj_id IN (SELECT node FROM nodes)
        """,
        # mirrors the T0 validate/filter: non-null keys, non-blank text
        # ingest observability over the RAW feed (pre-validation):
        # per-day row/conv/null-tool/empty-text profile
        "transcript_profile": f"""
            SELECT CAST(ts AS DATE) AS day,
                   count(*) AS n_turns,
                   count(DISTINCT conv_id) AS n_convs,
                   count(*) FILTER (WHERE tool IS NULL) AS n_null_tool,
                   count(*) FILTER (
                       WHERE text IS NULL OR length(trim(text)) = 0
                   ) AS n_empty_text
            FROM read_parquet('{g}/transcripts/*.parquet')
            GROUP BY 1
        """,
        "conv_stats": f"""
            WITH t0 AS (
                SELECT conv_id, role, text
                FROM read_parquet('{g}/transcripts/*.parquet')
                WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
                  AND length(trim(coalesce(text, ''))) > 0
            )
            SELECT conv_id, count(*) AS n_turns,
                   count(DISTINCT role) AS n_roles,
                   CAST(sum(length(text)) AS BIGINT) AS n_chars
            FROM t0 GROUP BY conv_id
        """,
        "kg_reciprocity": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            dedges AS MATERIALIZED (
                SELECT DISTINCT s.entity_id AS s, o.entity_id AS o
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
                WHERE s.entity_id <> o.entity_id
            )
            SELECT CAST(count(*) AS BIGINT) AS n_edges,
                   CAST(count(*) FILTER (WHERE EXISTS (
                       SELECT 1 FROM dedges r
                       WHERE r.s = dedges.o AND r.o = dedges.s))
                       AS BIGINT) AS n_recip
            FROM dedges
        """,
        "kg_assortativity": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            edges AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            und AS MATERIALIZED (
                SELECT DISTINCT least(subj_id, obj_id) AS a,
                                greatest(subj_id, obj_id) AS b
                FROM edges WHERE subj_id <> obj_id
            ),
            degs AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM
                         (SELECT a AS v FROM und
                          UNION ALL SELECT b FROM und) GROUP BY v)
            SELECT CAST(count(*) AS BIGINT) AS m,
                   CAST(sum(da.deg + db.deg) AS BIGINT) AS s_sum,
                   CAST(sum(da.deg * da.deg + db.deg * db.deg) AS BIGINT)
                       AS s_sq,
                   CAST(sum(da.deg * db.deg) AS BIGINT) AS s_prod
            FROM und JOIN degs da ON da.v = und.a
                     JOIN degs db ON db.v = und.b
        """,
        # alias-dictionary bootstrap (inverse of kg_surfaces): modal
        # entity per lower-cased surface, ambiguity = distinct entities
        "kg_alias_mining": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT lower(m.surface) AS alias, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            per AS (SELECT alias, entity_id, count(*) AS n
                    FROM lm GROUP BY 1, 2),
            top AS (SELECT alias, entity_id FROM (
                        SELECT alias, entity_id,
                               row_number() OVER (
                                   PARTITION BY alias
                                   ORDER BY n DESC, entity_id) AS rn
                        FROM per) WHERE rn = 1)
            SELECT per.alias,
                   CAST(sum(per.n) AS BIGINT) AS n_mentions,
                   CAST(count(*) AS BIGINT) AS n_entities,
                   top.entity_id AS top_entity
            FROM per JOIN top ON per.alias = top.alias
            GROUP BY per.alias, top.entity_id
        """,
        "kg_surfaces": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT b.entity_id, m.surface
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            per AS (SELECT entity_id, surface, count(*) AS n
                    FROM lm GROUP BY 1, 2),
            top AS (SELECT entity_id, surface FROM (
                        SELECT entity_id, surface,
                               row_number() OVER (
                                   PARTITION BY entity_id
                                   ORDER BY n DESC, surface) AS rn
                        FROM per) WHERE rn = 1)
            SELECT per.entity_id,
                   CAST(sum(per.n) AS BIGINT) AS n_mentions,
                   CAST(count(*) AS BIGINT) AS n_surfaces,
                   top.surface AS top_surface
            FROM per JOIN top ON per.entity_id = top.entity_id
            GROUP BY per.entity_id, top.surface
        """,
        "conv_response_time": f"""
            WITH t0 AS (
                SELECT conv_id, role, ts
                FROM read_parquet('{g}/transcripts/*.parquet')
                WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
                  AND length(trim(coalesce(text, ''))) > 0
            ),
            firsts AS (
                SELECT conv_id,
                       min(ts) FILTER (WHERE role = 'user') AS fu,
                       min(ts) FILTER (WHERE role = 'assistant') AS fa
                FROM t0 GROUP BY conv_id)
            SELECT conv_id,
                   CAST(epoch_us(fa) - epoch_us(fu) AS BIGINT)
                       AS latency_us
            FROM firsts
            WHERE fu IS NOT NULL AND fa IS NOT NULL
              AND fa >= fu
        """,
        # user→assistant adjacent-turn training pairs over the SAME
        # validated/filtered turn sequence as conv_windows
        "conv_qa_pairs": f"""
            WITH t0 AS (
                SELECT conv_id, turn_idx, role, text
                FROM read_parquet('{g}/transcripts/*.parquet')
                WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
                  AND length(trim(coalesce(text, ''))) > 0
            )
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                   text AS prompt,
                   lead(text, 1) OVER w AS response
            FROM t0
            WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            QUALIFY role = 'user' AND lead(role, 1) OVER w = 'assistant'
        """,
        "conv_windows": f"""
            WITH t0 AS (
                SELECT conv_id, turn_idx, text
                FROM read_parquet('{g}/transcripts/*.parquet')
                WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
                  AND length(trim(coalesce(text, ''))) > 0
            )
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS win_start,
                   text || ' '
                   || lead(text, 1) OVER w || ' '
                   || lead(text, 2) OVER w AS window_text
            FROM t0
            WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            QUALIFY lead(text, 2) OVER w IS NOT NULL
        """,
        "conv_role_patterns": f"""
            WITH t0 AS (
                SELECT conv_id, turn_idx, role
                FROM read_parquet('{g}/transcripts/*.parquet')
                WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
                  AND length(trim(coalesce(text, ''))) > 0
            ),
            sig AS (SELECT conv_id,
                           string_agg(role, '>' ORDER BY turn_idx)
                               AS pattern
                    FROM t0 GROUP BY conv_id)
            SELECT pattern, count(*) AS n_convs FROM sig GROUP BY pattern
        """,
        # tool-call bigrams: LAG over tool-bearing turns per conversation
        # (stages/dialog.tool_transitions; same T0 validate filter)
        "tool_transitions": f"""
            WITH t0 AS (
                SELECT conv_id, turn_idx, tool
                FROM read_parquet('{g}/transcripts/*.parquet')
                WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
                  AND length(trim(coalesce(text, ''))) > 0
                  AND tool IS NOT NULL
            ),
            s AS (
                SELECT tool,
                       LAG(tool) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx
                       ) AS prev
                FROM t0
            )
            SELECT prev AS tool_a, tool AS tool_b, count(*) AS n
            FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
        """,
        # per-tool usage profile (stages/dialog.tool_stats; n_convs is
        # exact DISTINCT — conv-disjoint bucket partials sum)
        "tool_stats": f"""
            SELECT tool,
                   count(*) AS n_calls,
                   count(DISTINCT conv_id) AS n_convs,
                   CAST(min(turn_idx) AS BIGINT) AS min_turn,
                   CAST(max(turn_idx) AS BIGINT) AS max_turn
            FROM read_parquet('{g}/transcripts/*.parquet')
            WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
              AND length(trim(coalesce(text, ''))) > 0
              AND tool IS NOT NULL
            GROUP BY tool
        """,
        # turn-taking run lengths per conversation: gaps-and-islands over
        # the role sequence (stages/dialog.turn_runs)
        "turn_runs": f"""
            WITH t0 AS (
                SELECT conv_id, turn_idx, role
                FROM read_parquet('{g}/transcripts/*.parquet')
                WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
                  AND length(trim(coalesce(text, ''))) > 0
            ),
            s AS (
                SELECT conv_id, role, turn_idx,
                       CASE WHEN LAG(role) OVER (
                                PARTITION BY conv_id ORDER BY turn_idx
                            ) IS DISTINCT FROM role THEN 1 ELSE 0 END AS brk
                FROM t0
            ),
            r AS (
                SELECT conv_id, role,
                       SUM(brk) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx
                           ROWS UNBOUNDED PRECEDING
                       ) AS run_id
                FROM s
            ),
            runs AS (
                SELECT conv_id, run_id,
                       CAST(count(*) AS BIGINT) AS run_len
                FROM r GROUP BY 1, 2
            ),
            per_run AS (
                SELECT conv_id,
                       CAST(count(*) AS BIGINT) AS n_runs,
                       max(run_len) AS max_run,
                       CAST(sum(run_len) AS BIGINT) AS n_turns
                FROM runs GROUP BY 1
            ),
            per_role AS (
                SELECT conv_id,
                       CAST(count(*) FILTER (role = 'user') AS BIGINT)
                           AS n_user,
                       CAST(count(*) FILTER (role = 'assistant') AS BIGINT)
                           AS n_assistant
                FROM t0 GROUP BY 1
            )
            SELECT p.conv_id, p.n_turns, p.n_runs, p.max_run,
                   q.n_user, q.n_assistant
            FROM per_run p JOIN per_role q ON p.conv_id = q.conv_id
        """,
        # conversation-level exact dedup: keep-first per ordered
        # (role, text)-sequence signature (stages/dialog.conv_dedup;
        # separators chr(30)/chr(31) match the Ray-side signature bytes)
        "conv_dedup": f"""
            WITH t0 AS (
                SELECT conv_id, turn_idx, role, text
                FROM read_parquet('{g}/transcripts/*.parquet')
                WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
                  AND length(trim(coalesce(text, ''))) > 0
            ),
            sig AS (
                SELECT conv_id,
                       CAST(count(*) AS BIGINT) AS n_turns,
                       string_agg(role || chr(30) || text, chr(31)
                           ORDER BY turn_idx, text, role) AS s
                FROM t0 GROUP BY conv_id
            )
            SELECT min(conv_id) AS conv_id,
                   count(*) AS n_dups,
                   min(n_turns) AS n_turns
            FROM sig GROUP BY s
        """,
        # boilerplate detection: turn texts recurring across >= 2 distinct
        # conversations (stages/dialog.boilerplate_turns)
        "boilerplate_turns": f"""
            WITH t0 AS (
                SELECT conv_id, text
                FROM read_parquet('{g}/transcripts/*.parquet')
                WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
                  AND length(trim(coalesce(text, ''))) > 0
            )
            SELECT text,
                   count(*) AS n_turns,
                   count(DISTINCT conv_id) AS n_convs
            FROM t0 GROUP BY text
            HAVING count(DISTINCT conv_id) >= 2
        """,
        # conversation-level near-dup: exact all-pairs word-3-gram Jaccard
        # >= 0.25 over turn-joined conv docs (stages/dialog.conv_near_dup;
        # conv keys are the digits of conv-%d ids)
        "conv_near_dup": f"""
            WITH t0 AS (
                SELECT conv_id, turn_idx, text
                FROM read_parquet('{g}/transcripts/*.parquet')
                WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
                  AND length(trim(coalesce(text, ''))) > 0
            ),
            cdoc AS (
                SELECT CAST(regexp_extract(conv_id, '[0-9]+') AS BIGINT)
                           AS doc_id,
                       string_agg(text, ' ' ORDER BY turn_idx, text) AS text
                FROM t0 GROUP BY conv_id
            ),
            toks AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\\s+') AS t
                FROM cdoc),
            sh AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(t) - 1, 2)),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
                FROM toks),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT i AS conv_a, j AS conv_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = i
            JOIN sizes sb ON sb.doc_id = j
            WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.25
        """,
        # COMPOSITE chat-corpus curation (stages/dialog.curate_transcripts):
        # turn_runs gate -> exact signature dedup -> ngram-Jaccard pairs ->
        # recursive-CTE CC closure -> md5 split rule — each fragment is the
        # verified oracle of its standalone query
        "curate_transcripts": f"""
            WITH RECURSIVE t0 AS (
                SELECT conv_id, turn_idx, role, text
                FROM read_parquet('{g}/transcripts/*.parquet')
                WHERE conv_id IS NOT NULL AND turn_idx IS NOT NULL
                  AND length(trim(coalesce(text, ''))) > 0
            ),
            sb AS (
                SELECT conv_id, role, turn_idx,
                       CASE WHEN LAG(role) OVER (
                                PARTITION BY conv_id ORDER BY turn_idx
                            ) IS DISTINCT FROM role THEN 1 ELSE 0 END AS brk
                FROM t0
            ),
            rr AS (
                SELECT conv_id, role,
                       SUM(brk) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx
                           ROWS UNBOUNDED PRECEDING
                       ) AS run_id
                FROM sb
            ),
            runs AS (
                SELECT conv_id, run_id, count(*) AS run_len
                FROM rr GROUP BY 1, 2
            ),
            ok AS (
                SELECT p.conv_id
                FROM (SELECT conv_id, sum(run_len) AS n_turns,
                             max(run_len) AS max_run
                      FROM runs GROUP BY 1) p
                JOIN (SELECT conv_id,
                             count(*) FILTER (role = 'user') AS n_user,
                             count(*) FILTER (role = 'assistant')
                                 AS n_assistant
                      FROM t0 GROUP BY 1) q USING (conv_id)
                WHERE p.n_turns >= 4 AND p.max_run <= 4
                  AND q.n_user >= 1 AND q.n_assistant >= 1
            ),
            g1 AS (SELECT t0.* FROM t0 JOIN ok USING (conv_id)),
            sig AS (
                SELECT conv_id,
                       string_agg(role || chr(30) || text, chr(31)
                           ORDER BY turn_idx, text, role) AS s
                FROM g1 GROUP BY conv_id
            ),
            keep1 AS (SELECT min(conv_id) AS conv_id FROM sig GROUP BY s),
            g2 AS (SELECT g1.* FROM g1 JOIN keep1 USING (conv_id)),
            cdoc AS (
                SELECT CAST(regexp_extract(conv_id, '[0-9]+') AS BIGINT)
                           AS doc_id,
                       conv_id,
                       string_agg(text, ' ' ORDER BY turn_idx, text) AS text
                FROM g2 GROUP BY conv_id
            ),
            toks AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\\s+') AS t
                FROM cdoc),
            sh AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(t) - 1, 2)),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
                FROM toks),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
            prs AS (
                SELECT i AS a, j AS b FROM inter
                JOIN sizes sa ON sa.doc_id = i
                JOIN sizes sb2 ON sb2.doc_id = j
                WHERE CAST(c AS DOUBLE) / (sa.n + sb2.n - c) >= 0.25),
            sym AS (SELECT a, b FROM prs UNION ALL SELECT b, a FROM prs),
            reach(v, r) AS (
                SELECT a AS v, a AS r FROM sym
                UNION
                SELECT reach.v, sym.b FROM reach JOIN sym ON sym.a = reach.r),
            lbl AS (SELECT v, min(r) AS l FROM reach GROUP BY v)
            SELECT conv_id,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                            < 'e6' THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                            < 'f3' THEN 'val'
                        ELSE 'test' END AS split
            FROM cdoc
            WHERE doc_id NOT IN (SELECT v FROM lbl WHERE l < v)
        """,
        # training-mixture profile (stages/curation.mixture_weights):
        # share/weight are the same two IEEE double divisions in the same
        # order as the Ray side — bit-exact, no tolerance
        "mixture_weights": """
            WITH toks AS (
                SELECT lang, source,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END AS n_tok
                FROM documents),
            grp AS (
                SELECT lang, source,
                       CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(n_tok) AS BIGINT) AS total_tokens
                FROM toks GROUP BY 1, 2),
            shared AS (
                SELECT *,
                       CAST(total_tokens AS DOUBLE)
                           / (SELECT CAST(sum(total_tokens) AS DOUBLE)
                              FROM grp) AS token_share
                FROM grp)
            SELECT lang, source, n_docs, total_tokens, token_share,
                   (1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM grp))
                       / token_share AS weight
            FROM shared
        """,
        # per-doc bigram corpus support (stages/curation.bigram_coverage):
        # integer counts plus ONE IEEE double division (n_supported /
        # n_bigrams, both exactly representable) — bit-exact, no tolerance
        "bigram_coverage": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            grams AS (
                SELECT DISTINCT doc_id,
                       unnest(list_transform(range(1, len(t)),
                              i -> t[i] || ' ' || t[i + 1])) AS gram
                FROM toks WHERE len(t) >= 2),
            df AS (
                SELECT gram, count(*) AS df FROM grams GROUP BY 1)
            SELECT g.doc_id,
                   count(*) AS n_bigrams,
                   count(*) FILTER (WHERE df.df >= 2) AS n_supported,
                   CAST(count(*) FILTER (WHERE df.df >= 2) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS coverage
            FROM grams g JOIN df USING (gram)
            GROUP BY 1
        """,
        "kg_clustering": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            edges AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            und AS MATERIALIZED (
                SELECT DISTINCT least(subj_id, obj_id) AS a,
                                greatest(subj_id, obj_id) AS b
                FROM edges WHERE subj_id <> obj_id
            ),
            degs AS MATERIALIZED (
                SELECT v, CAST(count(*) AS BIGINT) AS deg FROM
                    (SELECT a AS v FROM und UNION ALL SELECT b FROM und)
                GROUP BY v),
            tris AS MATERIALIZED (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM und e1
                JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
            pertri AS (
                SELECT v, CAST(count(*) AS BIGINT) AS t FROM
                    (SELECT x AS v FROM tris UNION ALL
                     SELECT y FROM tris UNION ALL SELECT z FROM tris)
                GROUP BY v)
            SELECT degs.v AS node, degs.deg,
                   coalesce(pertri.t, 0) AS n_triangles
            FROM degs LEFT JOIN pertri ON degs.v = pertri.v
        """,
        "kg_common_neighbors": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            edges AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            und AS MATERIALIZED (
                SELECT DISTINCT least(subj_id, obj_id) AS a,
                                greatest(subj_id, obj_id) AS b
                FROM edges WHERE subj_id <> obj_id
            ),
            sym AS MATERIALIZED (
                SELECT a AS src, b AS dst FROM und
                UNION ALL SELECT b, a FROM und
            )
            SELECT x.src AS u, y.src AS v, count(*) AS n_common
            FROM sym x JOIN sym y
              ON x.dst = y.dst AND x.src < y.src
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        # common-neighbor pairs + integer degrees of the same deduped
        # symmetric edge set (graph.py jaccard_similarity): Jaccard =
        # n_common / (deg_u + deg_v - n_common) is consumer arithmetic
        "kg_jaccard": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            edges AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            und AS MATERIALIZED (
                SELECT DISTINCT least(subj_id, obj_id) AS a,
                                greatest(subj_id, obj_id) AS b
                FROM edges WHERE subj_id <> obj_id
            ),
            sym AS MATERIALIZED (
                SELECT a AS src, b AS dst FROM und
                UNION ALL SELECT b, a FROM und
            ),
            deg AS MATERIALIZED (
                SELECT src AS node, count(*) AS deg FROM sym GROUP BY 1
            ),
            pairs AS (
                SELECT x.src AS u, y.src AS v, count(*) AS n_common
                FROM sym x JOIN sym y
                  ON x.dst = y.dst AND x.src < y.src
                GROUP BY 1, 2 HAVING count(*) >= 2
            )
            SELECT p.u, p.v, p.n_common,
                   du.deg AS deg_u, dv.deg AS deg_v
            FROM pairs p
            JOIN deg du ON p.u = du.node
            JOIN deg dv ON p.v = dv.node
        """,
        # Adamic–Adar + Resource-Allocation in int64 fixed-point
        # (graph.py adamic_adar): per shared neighbor z the weights
        # floor(1e12/ln(deg_z)) and 1e12//deg_z are exact integers from
        # an integer degree; pair scores are order-independent int sums
        "kg_adamic_adar": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            edges AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            und AS MATERIALIZED (
                SELECT DISTINCT least(subj_id, obj_id) AS a,
                                greatest(subj_id, obj_id) AS b
                FROM edges WHERE subj_id <> obj_id
            ),
            sym AS MATERIALIZED (
                SELECT a AS src, b AS dst FROM und
                UNION ALL SELECT b, a FROM und
            ),
            w AS MATERIALIZED (
                SELECT dst, count(*) AS deg,
                       CAST(floor(1000000000000.0
                                  / ln(CAST(count(*) AS DOUBLE)))
                            AS BIGINT) AS aa_w,
                       1000000000000 // count(*) AS ra_w
                FROM sym GROUP BY dst HAVING count(*) >= 2
            )
            SELECT x.src AS u, y.src AS v,
                   CAST(count(*) AS BIGINT) AS n_common,
                   CAST(sum(w.aa_w) AS BIGINT) AS aa_e12,
                   CAST(sum(w.ra_w) AS BIGINT) AS ra_e12
            FROM sym x
            JOIN sym y ON x.dst = y.dst AND x.src < y.src
            JOIN w ON w.dst = x.dst
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "kg_comention": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            ment AS MATERIALIZED (
                SELECT DISTINCT m.conv_id, m.turn_idx, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            )
            SELECT a.entity_id AS e1, b2.entity_id AS e2,
                   count(*) AS n
            FROM ment a JOIN ment b2
              ON a.conv_id = b2.conv_id AND a.turn_idx = b2.turn_idx
             AND a.entity_id < b2.entity_id
            GROUP BY 1, 2
        """,
        "kg_degree_hist": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            edges AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            und AS MATERIALIZED (
                SELECT DISTINCT least(subj_id, obj_id) AS a,
                                greatest(subj_id, obj_id) AS b
                FROM edges WHERE subj_id <> obj_id
            )
            SELECT deg, count(*) AS n_nodes
            FROM (SELECT v, CAST(count(*) AS BIGINT) AS deg
                  FROM (SELECT a AS v FROM und
                        UNION ALL SELECT b FROM und)
                  GROUP BY v)
            GROUP BY deg
        """,
        # recursive min-label reachability closure; fine at oracle scale
        # (~400 nodes), MATERIALIZED for the same reason as kg_triangles
        "kg_components": f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            edges AS MATERIALIZED (
                SELECT DISTINCT s.entity_id AS src, o.entity_id AS dst
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            sym AS MATERIALIZED (
                SELECT src, dst FROM edges
                UNION SELECT dst, src FROM edges
            ),
            reach(node, lbl) AS (
                SELECT src, src FROM sym
                UNION
                SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node
            )
            SELECT node, min(lbl) AS component FROM reach GROUP BY node
        """,
        # per-pred out-degree count-of-counts over kg edges
        # (__ray_entry__ _q_kg_outdeg_hist)
        "kg_outdeg_hist": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            e AS (
                SELECT s.entity_id AS subj_id, t.pred, o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
                GROUP BY 1, 2, 3
            ),
            od AS (
                SELECT subj_id, pred, CAST(count(*) AS BIGINT) AS out_deg
                FROM e GROUP BY 1, 2
            )
            SELECT pred, out_deg,
                   CAST(count(*) AS BIGINT) AS n_subjects
            FROM od GROUP BY 1, 2
        """,
        # length-vs-yield exact Pearson moments at conversation grain
        # (__ray_entry__ _q_conv_yield_corr; convs with no triples y=0)
        "conv_yield_corr": f"""
            WITH tc AS (
                SELECT conv_id, CAST(count(*) AS BIGINT) AS x
                FROM read_parquet('{g}/transcripts/*.parquet')
                GROUP BY 1
            ),
            yc AS (
                SELECT conv_id, CAST(count(*) AS BIGINT) AS y
                FROM read_parquet('{g}/golden_triples/*.parquet')
                GROUP BY 1
            ),
            xy AS (
                SELECT tc.x, coalesce(yc.y, 0) AS y
                FROM tc LEFT JOIN yc USING (conv_id)
            )
            SELECT 'all' AS g,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
                       AS corr_num,
                   CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
                       AS corr_den_x,
                   CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS BIGINT)
                       AS corr_den_y
            FROM xy
        """,
        # exact 4-cycle count: diagonal-pair identity over the same
        # common-neighbor pairs (__ray_entry__ _q_kg_squares)
        "kg_squares": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            edges AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            und AS MATERIALIZED (
                SELECT DISTINCT least(subj_id, obj_id) AS a,
                                greatest(subj_id, obj_id) AS b
                FROM edges WHERE subj_id <> obj_id
            ),
            sym AS MATERIALIZED (
                SELECT a AS src, b AS dst FROM und
                UNION ALL SELECT b, a FROM und
            ),
            cn AS (
                SELECT x.src AS u, y.src AS v,
                       CAST(count(*) AS BIGINT) AS c
                FROM sym x JOIN sym y
                  ON x.dst = y.dst AND x.src < y.src
                GROUP BY 1, 2
            )
            SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0) // 2 AS BIGINT)
                       AS n_squares
            FROM cn
        """,
        # reduced triad census: mutual-containing / cyclic / transitive
        # closed triangles (graph.py triad_census)
        "kg_triad_census": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            e2 AS MATERIALIZED (
                SELECT DISTINCT s.entity_id AS subj_id,
                                o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            dy AS MATERIALIZED (
                SELECT least(subj_id, obj_id) AS a,
                       greatest(subj_id, obj_id) AS b,
                       max(CASE WHEN subj_id < obj_id THEN 1 ELSE 0 END)
                         + 2 * max(CASE WHEN subj_id > obj_id
                                        THEN 1 ELSE 0 END) AS flag
                FROM e2 WHERE subj_id <> obj_id
                GROUP BY 1, 2
            ),
            tri AS MATERIALIZED (
                SELECT d1.a AS x, d1.b AS y, d2.b AS z,
                       d1.flag AS f1, d2.flag AS f2, d3.flag AS f3
                FROM dy d1
                JOIN dy d2 ON d2.a = d1.b
                JOIN dy d3 ON d3.a = d1.a AND d3.b = d2.b
            ),
            cls AS (
                SELECT f1, f2, f3,
                       CASE WHEN f1 = 1 THEN y ELSE x END AS t1,
                       CASE WHEN f2 = 1 THEN z ELSE y END AS t2,
                       CASE WHEN f3 = 1 THEN z ELSE x END AS t3
                FROM tri
            )
            SELECT CAST(count(*) AS BIGINT) AS n_triangles,
                   CAST(count(*) FILTER (
                       WHERE f1 = 3 OR f2 = 3 OR f3 = 3
                   ) AS BIGINT) AS n_with_mutual,
                   CAST(count(*) FILTER (
                       WHERE f1 <> 3 AND f2 <> 3 AND f3 <> 3
                         AND t1 <> t2 AND t1 <> t3 AND t2 <> t3
                   ) AS BIGINT) AS n_cyclic,
                   CAST(count(*) FILTER (
                       WHERE f1 <> 3 AND f2 <> 3 AND f3 <> 3
                         AND NOT (t1 <> t2 AND t1 <> t3 AND t2 <> t3)
                   ) AS BIGINT) AS n_transitive
            FROM cls
        """,
        # dyad census: mutual / asymmetric / null unordered pairs
        # (__ray_entry__ _q_kg_dyad_census)
        "kg_dyad_census": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            e2 AS MATERIALIZED (
                SELECT DISTINCT s.entity_id AS subj_id,
                                o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            dy AS (
                SELECT least(subj_id, obj_id) AS a,
                       greatest(subj_id, obj_id) AS b,
                       CAST(count(DISTINCT subj_id < obj_id) AS BIGINT)
                           AS nd
                FROM e2 WHERE subj_id <> obj_id
                GROUP BY 1, 2
            ),
            nn AS (
                SELECT CAST(count(*) AS BIGINT) AS n FROM (
                    SELECT DISTINCT node FROM (
                        SELECT subj_id AS node FROM e2
                        UNION ALL SELECT obj_id FROM e2
                    )
                )
            )
            SELECT nn.n AS n_nodes,
                   (SELECT CAST(count(*) AS BIGINT) FROM dy WHERE nd = 2)
                       AS mutual,
                   (SELECT CAST(count(*) AS BIGINT) FROM dy WHERE nd = 1)
                       AS asym,
                   nn.n * (nn.n - 1) // 2
                     - (SELECT count(*) FROM dy) AS null_dyads
            FROM nn
        """,
        # latency from first turn to first extracted triple per conv
        # (__ray_entry__ _q_conv_first_assertion)
        "conv_first_assertion": f"""
            WITH ft AS (
                SELECT conv_id, min(epoch_us(ts)) AS t0
                FROM read_parquet('{g}/transcripts/*.parquet')
                GROUP BY 1
            ),
            fa AS (
                SELECT conv_id, min(epoch_us(ts)) AS t1
                FROM read_parquet('{g}/golden_triples/*.parquet')
                GROUP BY 1
            )
            SELECT ft.conv_id,
                   CAST(fa.t1 - ft.t0 AS BIGINT) AS latency_us
            FROM ft JOIN fa USING (conv_id)
        """,
        # per-pred >2-sigma assertion days: exact-integer inequality over
        # the rewritten stream (corpus_ops.daily_anomalies_over reuse)
        "kg_pred_anomalies": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            rt AS MATERIALIZED (
                SELECT t.pred, t.ts
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            dd AS (
                SELECT pred, CAST(ts AS DATE) AS day,
                       CAST(count(*) AS BIGINT) AS n
                FROM rt GROUP BY 1, 2
            ),
            st AS (
                SELECT pred, CAST(count(*) AS BIGINT) AS d,
                       sum(n) AS s, sum(n * n) AS q
                FROM dd GROUP BY 1
            )
            SELECT dd.pred, dd.day, dd.n AS n_assertions
            FROM dd JOIN st USING (pred)
            WHERE (st.d * dd.n - st.s) * (st.d * dd.n - st.s)
                  > 4 * (st.d * st.q - st.s * st.s)
        """,
        # exact quartiles of triangle closure time (quantile_disc over
        # the same tri CTE as kg_triadic_closure)
        "kg_closure_quantiles": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            rt AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, o.entity_id AS obj_id, t.ts
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            und AS MATERIALIZED (
                SELECT least(subj_id, obj_id) AS a,
                       greatest(subj_id, obj_id) AS b,
                       min(epoch_us(ts)) AS ts
                FROM rt WHERE subj_id <> obj_id
                GROUP BY 1, 2
            ),
            tri AS MATERIALIZED (
                SELECT greatest(e1.ts, e2.ts, e3.ts)
                         - least(e1.ts, e2.ts, e3.ts) AS close_us
                FROM und e1
                JOIN und e2 ON e2.a = e1.b
                JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
            )
            SELECT CAST(0.25 AS DOUBLE) AS q,
                   CAST(quantile_disc(close_us, 0.25) AS BIGINT) AS value
            FROM tri
            UNION ALL
            SELECT CAST(0.5 AS DOUBLE), CAST(quantile_disc(close_us, 0.5) AS BIGINT)
            FROM tri
            UNION ALL
            SELECT CAST(0.75 AS DOUBLE), CAST(quantile_disc(close_us, 0.75) AS BIGINT)
            FROM tri
        """,
        # typed property path: rpq pairs with min/max-typed endpoints
        # (__ray_entry__ _q_kg_rpq_typed)
        "kg_rpq_typed": f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id, m.ent_type
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            e2 AS MATERIALIZED (
                SELECT DISTINCT s.entity_id AS subj_id, t.pred,
                                o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            types AS MATERIALIZED (
                SELECT entity_id, min(ent_type) AS ent_type
                FROM lm GROUP BY 1
            ),
            p AS MATERIALIZED (
                SELECT min(pred) AS p1, max(pred) AS p2 FROM e2
            ),
            walk(src, dst, hops) AS (
                SELECT subj_id, obj_id, 1 FROM e2 JOIN p ON e2.pred = p.p1
                UNION ALL
                SELECT w.src, e.obj_id, w.hops + 1
                FROM walk w
                JOIN e2 e ON e.subj_id = w.dst
                JOIN p ON e.pred = p.p2
                WHERE w.hops < 4
            ),
            mp AS MATERIALIZED (
                SELECT w.src, w.dst, min(w.hops) AS hops,
                       min(ts.ent_type) AS st, min(td.ent_type) AS dt
                FROM walk w
                JOIN types ts ON ts.entity_id = w.src
                JOIN types td ON td.entity_id = w.dst
                GROUP BY 1, 2
            ),
            tb AS (SELECT min(st) AS lo_s, min(dt) AS lo_d FROM mp)
            SELECT src, dst, CAST(hops AS BIGINT) AS hops
            FROM mp JOIN tb ON mp.st = tb.lo_s AND mp.dt = tb.lo_d
        """,
        # component-size count-of-counts over the same CC oracle
        # (__ray_entry__ _q_kg_component_sizes)
        "kg_component_sizes": f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            edges AS MATERIALIZED (
                SELECT DISTINCT s.entity_id AS src, o.entity_id AS dst
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            sym AS MATERIALIZED (
                SELECT src, dst FROM edges
                UNION SELECT dst, src FROM edges
            ),
            reach(node, lbl) AS (
                SELECT src, src FROM sym
                UNION
                SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node
            ),
            comp AS (
                SELECT node, min(lbl) AS component FROM reach GROUP BY node
            ),
            sz AS (
                SELECT component, CAST(count(*) AS BIGINT) AS n
                FROM comp GROUP BY 1
            )
            SELECT n AS size, CAST(count(*) AS BIGINT) AS n_components
            FROM sz GROUP BY 1
        """,
        # hop-distance count-of-counts over the same BFS oracle
        # (__ray_entry__ _q_kg_hop_hist)
        "kg_hop_hist": f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            edges AS MATERIALIZED (
                SELECT DISTINCT s.entity_id AS src, o.entity_id AS dst
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            sym AS MATERIALIZED (
                SELECT src, dst FROM edges
                UNION SELECT dst, src FROM edges
            ),
            reach(node, d) AS (
                SELECT (SELECT min(src) FROM sym), 0
                UNION
                SELECT s.dst, r.d + 1
                FROM reach r JOIN sym s ON s.src = r.node
                WHERE r.d < 6
            ),
            dists AS (
                SELECT node, CAST(min(d) AS BIGINT) AS dist
                FROM reach GROUP BY node
            )
            SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes
            FROM dists GROUP BY 1
        """,
        # SCC: directed transitive closure, mutual pairs, min label —
        # exact at oracle scale (~400 linked entities); engine side is
        # the coloring/peeling algorithm in
        # stages/graph.strongly_connected_components
        "kg_scc": f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            edges AS MATERIALIZED (
                SELECT DISTINCT s.entity_id AS src, o.entity_id AS dst
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            nodes AS MATERIALIZED (
                SELECT src AS node FROM edges UNION SELECT dst FROM edges
            ),
            e AS MATERIALIZED (
                SELECT src, dst FROM edges WHERE src <> dst
            ),
            reach(src, dst) AS (
                SELECT src, dst FROM e
                UNION
                SELECT r.src, e.dst FROM reach r JOIN e ON e.src = r.dst
            ),
            mutual AS (
                SELECT a.src AS v, a.dst AS u
                FROM reach a JOIN reach b
                  ON a.src = b.dst AND a.dst = b.src
            )
            SELECT n.node,
                   CASE WHEN min(m.u) IS NULL OR n.node < min(m.u)
                        THEN n.node ELSE min(m.u) END AS scc_id
            FROM nodes n LEFT JOIN mutual m ON m.v = n.node
            GROUP BY n.node
        """,
        "top_entities": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            )
            SELECT b.entity_id, COUNT(*) AS mention_count
            FROM read_parquet('{g}/golden_mentions/*.parquet') m
            JOIN best b
              ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            GROUP BY 1
            ORDER BY mention_count DESC, entity_id
            LIMIT 20
        """,
        "kg_eval_triples": f"""
            SELECT count(*) AS n_pred, count(*) AS n_gold, count(*) AS tp
            FROM (
                SELECT DISTINCT conv_id, turn_idx, subj_surface, pred,
                                obj_surface
                FROM read_parquet('{g}/golden_triples/*.parquet'))
        """,
        "kg_eval_mentions": f"""
            SELECT count(*) AS n_pred, count(*) AS n_gold, count(*) AS tp
            FROM (
                SELECT DISTINCT conv_id, turn_idx, "start", "end", ent_type
                FROM read_parquet('{g}/golden_mentions/*.parquet'))
        """,
        "kg_eval_by_pred": f"""
            SELECT pred, count(*) AS n_pred, count(*) AS n_gold,
                   count(*) AS tp
            FROM (
                SELECT DISTINCT conv_id, turn_idx, subj_surface, pred,
                                obj_surface
                FROM read_parquet('{g}/golden_triples/*.parquet'))
            GROUP BY pred
        """,
        "sessionize": """
            WITH e AS (
                SELECT user_id, ts,
                       CASE WHEN ts - LAG(ts) OVER (
                                PARTITION BY user_id ORDER BY ts)
                            > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
                FROM events),
            s AS (
                SELECT user_id, ts,
                       SUM(new_sess) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sess_idx
                FROM e)
            SELECT user_id, CAST(sess_idx AS BIGINT) AS session_idx,
                   count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM s GROUP BY 1, 2
        """,
        # 2-sigma day-count outliers per event type
        # (pipelines/corpus_ops.q_event_anomalies): the z-test
        # cross-multiplies to (D*x - S)^2 > 4(DQ - S^2) — pure integers,
        # boundary days decided exactly on both engines
        "event_anomalies": """
            WITH daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       CAST(count(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2),
            st AS (
                SELECT event_type,
                       CAST(count(*) AS BIGINT) AS d,
                       CAST(sum(n) AS BIGINT) AS s,
                       CAST(sum(n * n) AS BIGINT) AS q
                FROM daily GROUP BY 1)
            SELECT dd.event_type, dd.day, dd.n AS n_events
            FROM daily dd JOIN st USING (event_type)
            WHERE (st.d * dd.n - st.s) * (st.d * dd.n - st.s)
                  > 4 * (st.d * st.q - st.s * st.s)
        """,
        # exact-integer least-squares slope of daily counts per type:
        # x = days since epoch, num/den un-divided (events.event_trends)
        "event_trends": """
            WITH dc AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       CAST(count(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2
            ),
            xy AS (
                SELECT event_type,
                       CAST(day - DATE '1970-01-01' AS BIGINT) AS x,
                       n AS y
                FROM dc
            )
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_days,
                   CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
                       AS slope_num,
                   CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
                       AS slope_den
            FROM xy GROUP BY 1
        """,
        "events_daily": """
            SELECT event_type, CAST(ts AS DATE) AS day,
                   count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users,
                   min(value) AS min_value, max(value) AS max_value
            FROM events GROUP BY 1, 2
        """,
        "events_json": """
            SELECT event_type, count(*) AS n_events,
                   min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
                   max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                        AS BIGINT) AS sum_k
            FROM events GROUP BY event_type
        """,
        "sample_hash": """
            SELECT doc_id FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
        """,
        "sample_stratified": """
            SELECT lang, doc_id, rank FROM (
                SELECT lang, doc_id,
                       row_number() OVER (PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ) AS rank
                FROM documents) t
            WHERE rank <= 5
        """,
        # --- relational ops Ray Data has no primitive for -------------------
        "asof_join": """
            WITH l AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'click'),
            r AS (SELECT user_id, ts, ts AS r_ts, max(value) AS r_value
                  FROM events WHERE event_type = 'purchase'
                  GROUP BY user_id, ts)
            SELECT l.event_id, l.user_id, l.ts, r.r_ts, r.r_value
            FROM l ASOF LEFT JOIN r
                 ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "group_topk": """
            SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rank
                FROM orders) t
            WHERE rank <= 3
        """,
        "range_join": """
            SELECT l.event_id AS l_event_id, r.event_id AS r_event_id
            FROM (SELECT * FROM events WHERE event_type = 'click') l
            JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id
             AND r.ts BETWEEN l.ts - INTERVAL 1 HOUR AND l.ts
        """,
        "rolling_window": """
            SELECT event_id, user_id, ts,
                   count(*) OVER w AS n_1h,
                   max(value) OVER w AS max_1h
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """,
        "semi_join": """
            SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderstatus = 'F')
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS n_rows,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                       AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_price_cents
            FROM lineitem GROUP BY 1, 2
        """,
        # TPC-H-Q9 shape (pipelines/corpus_ops.q_profit_by_nation_brand):
        # supplier + part dims on the same fact row, integer cents
        "profit_by_nation_brand": """
            SELECT n.n_name, p.p_brand,
                   count(*) AS n_lines,
                   CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                       AS BIGINT) AS revenue_cbp
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2
        """,
        # correlated-subquery shape (pipelines/corpus_ops.q_above_nation_avg):
        # the boundary compare cross-multiplies int64 cents — no float
        # division on either engine
        "above_nation_avg": """
            WITH per AS (
                SELECT o_custkey, count(*) AS n_orders,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS sum_cents
                FROM orders GROUP BY 1),
            jn AS (
                SELECT p.o_custkey, p.n_orders, p.sum_cents, c.c_nationkey
                FROM per p JOIN customer c ON p.o_custkey = c.c_custkey),
            nat AS (
                SELECT c_nationkey, sum(n_orders) AS nn,
                       sum(sum_cents) AS ns
                FROM jn GROUP BY 1)
            SELECT j.o_custkey AS c_custkey,
                   CAST(j.n_orders AS BIGINT) AS n_orders,
                   CAST(j.sum_cents AS BIGINT) AS sum_cents
            FROM jn j JOIN nat n USING (c_nationkey)
            WHERE j.sum_cents * n.nn > n.ns * j.n_orders
        """,
        # interval-overlap join: browsing sessions × transactional
        # sessions per user (24 h gap sessionization on both sides);
        # closed-interval overlap, µs arithmetic (relational.interval_join)
        "session_overlap": """
            WITH b0 AS (SELECT user_id, ts FROM events
                        WHERE event_type IN ('click', 'view')),
            b1 AS (SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 24 HOUR
                            THEN 1 ELSE 0 END AS brk
                   FROM b0 WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            b2 AS (SELECT user_id, ts,
                       sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
                   FROM b1),
            bsess AS (SELECT user_id, min(ts) AS s_start, max(ts) AS s_end
                      FROM b2 GROUP BY user_id, sid),
            t0 AS (SELECT user_id, ts FROM events
                   WHERE event_type IN ('purchase', 'error')),
            t1 AS (SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 24 HOUR
                            THEN 1 ELSE 0 END AS brk
                   FROM t0 WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            t2 AS (SELECT user_id, ts,
                       sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
                   FROM t1),
            tsess AS (SELECT user_id, min(ts) AS s_start, max(ts) AS s_end
                      FROM t2 GROUP BY user_id, sid)
            SELECT b.user_id,
                   b.s_start AS b_start, b.s_end AS b_end,
                   t.s_start AS t_start, t.s_end AS t_end,
                   epoch_us(least(b.s_end, t.s_end))
                       - epoch_us(greatest(b.s_start, t.s_start)) AS overlap_us
            FROM bsess b JOIN tsess t ON b.user_id = t.user_id
            WHERE b.s_start <= t.s_end AND t.s_start <= b.s_end
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   count(*) AS n_orders,
                   CAST(sum(rev) AS BIGINT) AS revenue_cbp
            FROM (
                SELECT l_orderkey,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                           AS rev
                FROM lineitem GROUP BY 1) lo
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
            GROUP BY 1
        """,
        "event_pivot": """
            SELECT user_id,
                   count(*) FILTER (WHERE event_type = 'click') AS n_click,
                   count(*) FILTER (WHERE event_type = 'error') AS n_error,
                   count(*) FILTER (WHERE event_type = 'purchase')
                       AS n_purchase,
                   count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
                   count(*) FILTER (WHERE event_type = 'view') AS n_view,
                   count(*) AS n_total
            FROM events GROUP BY 1
        """,
        "group_moments": """
            SELECT l_returnflag,
                   count(*) AS n,
                   CAST(sum(q) AS BIGINT) AS sum_q,
                   CAST(sum(p) AS BIGINT) AS sum_p,
                   CAST(sum(q * q) AS BIGINT) AS sum_qq,
                   CAST(sum(p * p) AS BIGINT) AS sum_pp,
                   CAST(sum(q * p) AS BIGINT) AS sum_qp
            FROM (SELECT l_returnflag,
                         (CAST(round(l_quantity * 100) AS BIGINT) + 50)
                             // 100 AS q,
                         (CAST(round(l_extendedprice * 100) AS BIGINT) + 50)
                             // 100 AS p
                  FROM lineitem)
            GROUP BY 1
        """,
        "set_intersect": """
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        """,
        "set_except": """
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        """,
        "pricing_rollup": """
            SELECT l_returnflag, l_linestatus,
                   CAST(grouping(l_returnflag) + grouping(l_linestatus)
                        AS BIGINT) AS level,
                   count(*) AS n_rows,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_price_cents
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        # full CUBE with the SQL GROUPING bitmask (relational.py
        # grouped_cube: detail once, coarser sets re-merge the detail)
        "pricing_cube": """
            SELECT l_returnflag, l_linestatus,
                   CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                        AS BIGINT) AS gid,
                   count(*) AS n_rows,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_price_cents
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "running_total": """
            SELECT user_id, event_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS running_cents
            FROM events
        """,
        "value_histogram": """
            SELECT CAST(round(value * 100) AS BIGINT) // 5000 AS bin,
                   count(*) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS sum_cents
            FROM events GROUP BY 1
        """,
        "customer_order_counts": """
            SELECT c_custkey, c_name,
                   CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders
            FROM customer LEFT JOIN
                 (SELECT o_custkey, count(*) AS n_orders
                  FROM orders GROUP BY 1) o
            ON c_custkey = o_custkey
        """,
        "funnel": """
            WITH s AS (
                SELECT user_id, min(epoch_us(ts)) AS t1_us
                FROM events WHERE event_type = 'signup' GROUP BY 1),
            p AS (
                SELECT s.user_id, t1_us, min(epoch_us(e.ts)) AS t2_us
                FROM s JOIN events e ON e.user_id = s.user_id
                 AND e.event_type = 'purchase'
                 AND epoch_us(e.ts) >= t1_us
                 AND epoch_us(e.ts) <= t1_us + 7 * 86400000000
                GROUP BY 1, 2)
            SELECT s.user_id, s.t1_us, p.t2_us
            FROM s LEFT JOIN p ON s.user_id = p.user_id
        """,
        "kfold_assign": """
            SELECT doc_id,
                   CAST(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                                  < '33' THEN 0
                             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                                  < '66' THEN 1
                             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                                  < '9a' THEN 2
                             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                                  < 'cd' THEN 3
                             ELSE 4 END AS BIGINT) AS fold
            FROM documents
        """,
        "doc_hash_features": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            ex AS (SELECT doc_id, unnest(t) AS tok FROM toks),
            routed AS (
                SELECT doc_id,
                       (strpos('0123456789abcdef',
                               substr(md5(tok), 1, 1)) - 1) // 2 AS dim,
                       CASE WHEN contains('02468ace', substr(md5(tok), 2, 1))
                            THEN 1 ELSE -1 END AS s
                FROM ex)
            SELECT doc_id, CAST(dim AS BIGINT) AS dim,
                   CAST(sum(s) AS BIGINT) AS value
            FROM routed GROUP BY 1, 2
            HAVING sum(s) <> 0
        """,
        "embed_rp": """
            WITH flat AS (
                SELECT vec_id,
                       unnest(list_transform(
                           range(1, len(embedding) + 1),
                           i -> {'i': i,
                                 'q': CAST(round(
                                     CAST(embedding[i] AS DOUBLE) * 1000)
                                     AS BIGINT)})) AS u
                FROM embeddings),
            f AS (SELECT vec_id, u.i AS i, u.q AS q FROM flat),
            dims AS (SELECT unnest(range(0, 8)) AS j),
            terms AS (
                SELECT f.vec_id, d.j,
                       CASE WHEN contains('02468ace',
                                substr(md5(CAST(d.j AS VARCHAR) || ':' ||
                                           CAST(f.i AS VARCHAR)), 1, 1))
                            THEN f.q ELSE -f.q END AS term
                FROM f CROSS JOIN dims d)
            SELECT vec_id, j AS out_dim,
                   CAST(sum(term) AS BIGINT) AS value
            FROM terms GROUP BY 1, 2
        """,
        "event_rules": """
            WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
            nu AS (SELECT count(DISTINCT user_id) AS n FROM b),
            supp AS (SELECT event_type, count(*) AS n FROM b GROUP BY 1),
            pairs AS (
                SELECT x.event_type AS antecedent,
                       y.event_type AS consequent,
                       count(*) AS n_both
                FROM b x JOIN b y ON x.user_id = y.user_id
                                 AND x.event_type <> y.event_type
                GROUP BY 1, 2)
            SELECT p.antecedent, p.consequent,
                   CAST(p.n_both AS BIGINT) AS n_both,
                   CAST(sa.n AS BIGINT) AS n_ante,
                   CAST(p.n_both * 1000000 // sa.n AS BIGINT)
                       AS confidence_ppm,
                   CAST(p.n_both * nu.n * 1000000 // (sa.n * sb.n)
                        AS BIGINT) AS lift_ppm
            FROM pairs p
            JOIN supp sa ON sa.event_type = p.antecedent
            JOIN supp sb ON sb.event_type = p.consequent
            CROSS JOIN nu
        """,
        "attribution": """
            WITH att AS (
                SELECT c.event_id, c.value,
                       (SELECT e.event_type FROM events e
                        WHERE e.user_id = c.user_id
                          AND e.event_type <> 'purchase'
                          AND (e.ts < c.ts
                               OR (e.ts = c.ts AND e.event_id < c.event_id))
                          AND epoch_us(e.ts)
                              >= epoch_us(c.ts) - 7 * 86400000000
                        ORDER BY e.ts DESC, e.event_id DESC
                        LIMIT 1) AS channel
                FROM events c WHERE c.event_type = 'purchase')
            SELECT coalesce(channel, '(none)') AS channel,
                   CAST(count(*) AS BIGINT) AS n_conversions,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM att GROUP BY 1
        """,
        "retention": """
            WITH d AS (
                SELECT user_id, epoch_us(ts) // 86400000000 AS day
                FROM events),
            f AS (
                SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1),
            a AS (
                SELECT DISTINCT d.user_id, cohort_day,
                       day - cohort_day AS offset_days
                FROM d JOIN f ON d.user_id = f.user_id)
            SELECT cohort_day, offset_days, count(*) AS n_users
            FROM a GROUP BY 1, 2
        """,
        "event_melt": """
            WITH types AS (
                SELECT DISTINCT event_type FROM events),
            counts AS (
                SELECT user_id, event_type, count(*) AS n
                FROM events GROUP BY 1, 2)
            SELECT u.user_id, t.event_type,
                   CAST(coalesce(c.n, 0) AS BIGINT) AS n
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN types t
            LEFT JOIN counts c
              ON c.user_id = u.user_id AND c.event_type = t.event_type
        """,
        "event_share": """
            SELECT event_type, count(*) AS n,
                   CAST(count(*) * 1000000 // sum(count(*)) OVER ()
                        AS BIGINT) AS share_ppm
            FROM events GROUP BY 1
        """,
        "event_quartiles": """
            SELECT event_type, event_id,
                   CAST(ntile(4) OVER (PARTITION BY event_type
                        ORDER BY value, event_id) AS BIGINT) AS quartile
            FROM events
        """,
        "semi_join_bloom": """
            SELECT l_orderkey, l_linenumber FROM lineitem l
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey
                            AND o.o_orderpriority = '1-URGENT')
        """,
        "anti_join_bloom": """
            SELECT l_orderkey, l_linenumber FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey
                                AND o.o_orderpriority = '1-URGENT')
        """,
        # exact lower weighted median per group via a RANGE-framed
        # cumulative window (relational.group_weighted_median)
        "group_wmedian": """
            WITH s AS (
                SELECT l_returnflag,
                       CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                       CAST(round(l_quantity) AS BIGINT) AS w
                FROM lineitem
            ),
            c AS (
                SELECT l_returnflag, v,
                       sum(w) OVER (
                           PARTITION BY l_returnflag ORDER BY v
                       ) AS cw,
                       sum(w) OVER (PARTITION BY l_returnflag) AS tw
                FROM s
            )
            SELECT l_returnflag,
                   CAST(min(v) AS BIGINT) AS wmedian,
                   CAST(min(tw) AS BIGINT) AS total_w
            FROM c WHERE 2 * cw >= tw GROUP BY 1
        """,
        # exact-integer Pearson partials per group: n*Sxy - Sx*Sy and
        # the two den factors (relational.group_corr_parts)
        "group_corr": """
            WITH xy AS (
                SELECT l_returnflag,
                       CAST(round(l_quantity) AS BIGINT) AS x,
                       CAST(round(l_discount * 100) AS BIGINT) AS y
                FROM lineitem
            )
            SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
                       AS corr_num,
                   CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
                       AS corr_den_x,
                   CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS BIGINT)
                       AS corr_den_y
            FROM xy GROUP BY 1
        """,
        # global equi-depth histogram: ntile(8) over (price, orderkey)
        # with per-bin count/min/max (relational.equidepth_histogram)
        "value_bins": """
            WITH r AS (
                SELECT o_totalprice,
                       ntile(8) OVER (
                           ORDER BY o_totalprice, o_orderkey
                       ) AS tile
                FROM orders
            )
            SELECT tile, CAST(count(*) AS BIGINT) AS n,
                   min(o_totalprice) AS lo, max(o_totalprice) AS hi
            FROM r GROUP BY 1
        """,
        "value_quantiles_cont": """
            WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                              AS c FROM lineitem),
            q AS (SELECT quantile_cont(c, [0.0, 0.25, 0.5, 0.75, 1.0])
                         AS qv FROM v),
            ks AS (SELECT unnest([1, 2, 3, 4, 5]) AS k)
            SELECT CAST(k - 1 AS BIGINT) AS q_quarters,
                   CAST(round(4 * qv[k]) AS BIGINT) AS value_x4
            FROM q CROSS JOIN ks
        """,
        "above_avg_orders": """
            WITH v AS (SELECT o_orderkey, o_custkey,
                              CAST(round(o_totalprice * 100) AS BIGINT)
                                  AS price_cents
                       FROM orders)
            SELECT o_orderkey, o_custkey, price_cents FROM (
                SELECT *,
                       count(*) OVER (PARTITION BY o_custkey) AS n,
                       sum(price_cents) OVER (PARTITION BY o_custkey) AS s
                FROM v) t
            WHERE CAST(n AS HUGEINT) * price_cents > CAST(s AS HUGEINT)
        """,
        "group_quantiles_cont": """
            WITH v AS (SELECT l_returnflag,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                                  AS c
                       FROM lineitem),
            q AS (SELECT l_returnflag,
                         quantile_cont(c, [0.25, 0.5, 0.75]) AS qv
                  FROM v GROUP BY 1),
            ks AS (SELECT unnest([1, 2, 3]) AS k)
            SELECT l_returnflag, CAST(k AS BIGINT) AS q_quarters,
                   CAST(round(4 * qv[k]) AS BIGINT) AS value_x4
            FROM q CROSS JOIN ks
        """,
        "moving_sum": """
            SELECT event_id,
                   CAST(SUM(c) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 2 PRECEDING
                                     AND CURRENT ROW)
                        AS BIGINT) AS moving_cents
            FROM (SELECT event_id, user_id, ts,
                         CAST(round(value * 100) AS BIGINT) AS c
                  FROM events WHERE value IS NOT NULL)
        """,
        "order_key_agg": """
            SELECT o_custkey,
                   string_agg(CAST(o_orderkey AS VARCHAR),
                              ',' ORDER BY o_orderkey) AS agg
            FROM orders GROUP BY o_custkey
        """,
        "profile_orders": """
            -- distinct_exact mirrors the engine's HLL auto-cutover flag:
            -- at oracle scale every block enumerates its distincts under
            -- the cap, so the engine reports exact counts and TRUE
            SELECT col, n_rows, n_null, n_distinct,
                   TRUE AS distinct_exact FROM (
                SELECT 'o_orderkey' AS col, count(*) AS n_rows,
                       count(*) - count(o_orderkey) AS n_null,
                       count(DISTINCT o_orderkey) AS n_distinct FROM orders
                UNION ALL
                SELECT 'o_custkey', count(*),
                       count(*) - count(o_custkey),
                       count(DISTINCT o_custkey) FROM orders
                UNION ALL
                SELECT 'o_orderstatus', count(*),
                       count(*) - count(o_orderstatus),
                       count(DISTINCT o_orderstatus) FROM orders
                UNION ALL
                SELECT 'o_totalprice', count(*),
                       count(*) - count(o_totalprice),
                       count(DISTINCT o_totalprice) FROM orders
                UNION ALL
                SELECT 'o_orderpriority', count(*),
                       count(*) - count(o_orderpriority),
                       count(DISTINCT o_orderpriority) FROM orders
            )
        """,
        # the composite curation pipeline: quality gate -> near-dup CC
        # closure on the survivors -> split assignment, all one statement
        "curate_corpus": """
            WITH RECURSIVE q AS (
                SELECT doc_id, text FROM (
                    SELECT doc_id, text,
                           CASE WHEN trim(text) = ''
                                THEN CAST([] AS VARCHAR[])
                                ELSE regexp_split_to_array(trim(text),
                                                           '\\s+')
                           END AS t
                    FROM documents)
                WHERE len(t) >= 5
                  AND list_max(list_transform(t, x -> length(x))) <= 40
                  AND len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 10
                      <= length(text)
            ),
            toks AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\\s+') AS t
                FROM q),
            sh AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(t) - 1, 2)),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])))
                           AS s
                FROM toks),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
            pairs AS (
                SELECT i AS a, j AS b FROM inter
                JOIN sizes sa ON sa.doc_id = i
                JOIN sizes sb ON sb.doc_id = j
                WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
            sym AS (SELECT a, b FROM pairs
                    UNION ALL SELECT b, a FROM pairs),
            reach(v, r) AS (
                SELECT a AS v, a AS r FROM sym
                UNION
                SELECT reach.v, sym.b FROM reach JOIN sym ON sym.a = reach.r),
            lbl AS (SELECT v, min(r) AS l FROM reach GROUP BY v)
            SELECT doc_id,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                            < 'e6' THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                            < 'f3' THEN 'val'
                        ELSE 'test' END AS split
            FROM q
            WHERE doc_id NOT IN (SELECT v FROM lbl WHERE l < v)
        """,
        # winnowing (Schleimer et al.): md5-60-bit k-gram hash (k=5),
        # min per window of 4 (window covers everything when cnt <= 4)
        "doc_winnow": """
            WITH grams AS (
                SELECT doc_id,
                       CASE WHEN length(text) < 5 THEN text
                            ELSE substr(text, i, 5) END AS gr,
                       i
                FROM (SELECT doc_id, text,
                             unnest(range(1, greatest(length(text) - 4, 1)
                                             + 1)) AS i
                      FROM documents)
            ),
            hs AS (SELECT doc_id, i,
                          ('0x' || substr(md5(gr), 1, 15))::BIGINT AS h
                   FROM grams),
            m AS (SELECT doc_id, count(*) AS cnt FROM hs GROUP BY 1),
            wins AS (
                SELECT hs.doc_id,
                       min(h) OVER (PARTITION BY hs.doc_id ORDER BY i
                                    ROWS BETWEEN CURRENT ROW
                                    AND 3 FOLLOWING) AS wmin,
                       i, m.cnt
                FROM hs JOIN m USING (doc_id)
            )
            SELECT DISTINCT doc_id, wmin AS h FROM wins
            WHERE (cnt <= 4 AND i = 1) OR (cnt > 4 AND i <= cnt - 3)
        """,
        "weekday_heatmap": """
            SELECT CAST(isodow(ts) AS BIGINT) AS dow, event_type,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "session_summary": """
            WITH e AS (
                SELECT user_id, ts,
                       CASE WHEN ts - LAG(ts) OVER (
                                PARTITION BY user_id ORDER BY ts)
                            > INTERVAL 30 MINUTE THEN 1 ELSE 0 END
                           AS new_sess
                FROM events),
            s AS (
                SELECT user_id, ts,
                       SUM(new_sess) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sess_idx
                FROM e),
            per AS (
                SELECT user_id, sess_idx, count(*) AS n_events,
                       epoch_us(max(ts)) - epoch_us(min(ts)) AS dwell
                FROM s GROUP BY 1, 2)
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_sessions,
                   CAST(sum(n_events) AS BIGINT) AS n_events,
                   CAST(max(n_events) AS BIGINT) AS max_session_events,
                   CAST(sum(dwell) AS BIGINT) AS dwell_us
            FROM per GROUP BY user_id
        """,
        "part_top_brands": """
            WITH c AS (SELECT p_type, p_brand, count(*) AS n
                       FROM part GROUP BY 1, 2)
            SELECT p_type, p_brand, n,
                   CAST(row_number() OVER (
                       PARTITION BY p_type
                       ORDER BY n DESC, p_brand) AS BIGINT) AS rank
            FROM c QUALIFY rank <= 3
        """,
        "hourly_activity": """
            SELECT CAST(hour(ts) AS BIGINT) AS hour, count(*) AS n
            FROM events GROUP BY 1
        """,
        "monthly_revenue_delta": """
            WITH m AS (
                SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
                           AS month,
                       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                            AS BIGINT) AS revenue_cents
                FROM orders GROUP BY 1)
            SELECT month, revenue_cents,
                   revenue_cents - lag(revenue_cents)
                       OVER (ORDER BY month) AS delta_cents
            FROM m
        """,
        "q6_revenue": """
            SELECT CAST(coalesce(sum(
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round(l_discount * 10000) AS BIGINT)), 0)
                   AS BIGINT) AS revenue_micros
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND CAST(round(l_discount * 10000) AS BIGINT)
                  BETWEEN 300 AND 700
              AND l_quantity < 24
        """,
        "q3_top_orders": """
            SELECT l_orderkey,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (10000 - CAST(round(l_discount * 10000)
                                            AS BIGINT))) AS BIGINT)
                       AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON c_custkey = o_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
              AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
            GROUP BY 1
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "supplier_ranks": """
            WITH v AS (SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
                              CAST(round(s_acctbal * 100) AS BIGINT) AS c
                       FROM supplier WHERE s_acctbal IS NOT NULL)
            SELECT DISTINCT s_nationkey, c AS value,
                   CAST(rank() OVER (PARTITION BY s_nationkey ORDER BY c)
                        AS BIGINT) AS rnk,
                   CAST(count(*) OVER (PARTITION BY s_nationkey ORDER BY c)
                        AS BIGINT) AS cume_n,
                   CAST(count(*) OVER (PARTITION BY s_nationkey)
                        AS BIGINT) AS n_rows
            FROM v
        """,
        "user_streaks": """
            WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                       FROM events),
            isl AS (SELECT user_id,
                           day - CAST(row_number() OVER (
                               PARTITION BY user_id ORDER BY day)
                               AS INTEGER) AS k
                    FROM d)
            SELECT user_id, CAST(max(run) AS BIGINT) AS longest_streak
            FROM (SELECT user_id, k, count(*) AS run
                  FROM isl GROUP BY 1, 2)
            GROUP BY user_id
        """,
        "embedding_dim_stats": """
            SELECT CAST(d - 1 AS BIGINT) AS dim,
                   count(*) AS n,
                   min(x) AS min_val, max(x) AS max_val
            FROM (SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
                         generate_subscripts(embedding, 1) AS d
                  FROM embeddings)
            GROUP BY d
        """,
        "term_postings": """
            SELECT token,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id) AS postings
            FROM (SELECT DISTINCT doc_id, t AS token
                  FROM (SELECT doc_id,
                               unnest(CASE WHEN trim(text) = ''
                                           THEN CAST([] AS VARCHAR[])
                                           ELSE regexp_split_to_array(
                                                trim(text), '\\s+')
                                      END) AS t
                        FROM documents))
            WHERE token IN ('hash', 'join', 'scan', 'vector')
            GROUP BY token
        """,
        "time_weighted": """
            WITH v AS (SELECT user_id, ts, event_id,
                              CAST(round(value * 100) AS BIGINT) AS c
                       FROM events WHERE value IS NOT NULL),
            d AS (SELECT user_id, c,
                         (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id))
                          - epoch_us(ts)) // 1000000 AS dur_s
                  FROM v)
            SELECT user_id,
                   CAST(sum(c * dur_s) AS BIGINT) AS weighted_cents_s,
                   CAST(sum(dur_s) AS BIGINT) AS dur_s
            FROM d WHERE dur_s IS NOT NULL GROUP BY user_id
        """,
        "multi_grain": """
            SELECT 'day' AS grain, CAST(date_trunc('day', ts) AS DATE)
                       AS period, count(*) AS n
            FROM events GROUP BY 2
            UNION ALL
            SELECT 'week', CAST(date_trunc('week', ts) AS DATE), count(*)
            FROM events GROUP BY 2
            UNION ALL
            SELECT 'month', CAST(date_trunc('month', ts) AS DATE), count(*)
            FROM events GROUP BY 2
        """,
        "users_vs_customers": """
            WITH ue AS (SELECT user_id AS id, count(*) AS n_events
                        FROM events GROUP BY 1),
            oc AS (SELECT o_custkey AS id, count(*) AS n_orders
                   FROM orders GROUP BY 1)
            SELECT coalesce(ue.id, oc.id) AS id,
                   coalesce(n_events, 0) AS n_events,
                   coalesce(n_orders, 0) AS n_orders
            FROM ue FULL JOIN oc ON ue.id = oc.id
        """,
        "top_orders_ties": """
            SELECT o_custkey, o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   CAST(rank() OVER (
                       PARTITION BY o_custkey
                       ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)
                           DESC) AS BIGINT) AS rnk
            FROM orders
            QUALIFY rnk <= 3
        """,
        "winsorize": """
            WITH v AS (SELECT event_id,
                              CAST(round(value * 100) AS BIGINT) AS c
                       FROM events WHERE value IS NOT NULL),
            b AS (SELECT quantile_disc(c, 0.01) AS lo,
                         quantile_disc(c, 0.99) AS hi FROM v)
            SELECT event_id,
                   least(greatest(c, b.lo), b.hi) AS clipped_cents
            FROM v, b
        """,
        "active_users_7d": """
            WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
            SELECT d.day, count(DISTINCT e.user_id) AS n_users
            FROM d JOIN events e
              ON CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day
            GROUP BY 1
        """,
        "locf_fill": """
            SELECT event_id,
                   last_value(c IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS filled_cents
            FROM (SELECT event_id, user_id, ts,
                         CAST(round(value * 100) AS BIGINT) AS c
                  FROM events)
        """,
        "user_active_time": """
            WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                               epoch_us(ts) + 600000000 AS e
                        FROM events),
            m AS (SELECT user_id, s, e,
                         CASE WHEN s > max(e) OVER (
                                  PARTITION BY user_id ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING)
                              THEN 1 ELSE coalesce(NULL, 0) END
                         + CASE WHEN row_number() OVER (
                                    PARTITION BY user_id ORDER BY s, e) = 1
                                THEN 1 ELSE 0 END AS new_island
                  FROM iv),
            isl AS (SELECT user_id, s, e,
                           sum(new_island) OVER (
                               PARTITION BY user_id ORDER BY s, e
                               ROWS UNBOUNDED PRECEDING) AS island
                    FROM m)
            SELECT user_id,
                   CAST(sum(cov) AS BIGINT) AS covered_us
            FROM (SELECT user_id, island, max(e) - min(s) AS cov
                  FROM isl GROUP BY 1, 2)
            GROUP BY user_id
        """,
        # top journey trigrams: chained lead() windows, deterministic
        # (n desc, path asc) cut mirrors the engine's sort+limit
        "event_journeys": """
            SELECT e1 || ' ' || e2 || ' ' || e3 AS path, count(*) AS n
            FROM (SELECT event_type AS e1,
                         lead(event_type, 1) OVER w AS e2,
                         lead(event_type, 2) OVER w AS e3
                  FROM events
                  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            WHERE e2 IS NOT NULL AND e3 IS NOT NULL
            GROUP BY 1 ORDER BY n DESC, path LIMIT 50
        """,
        "event_transitions": """
            SELECT from_type, event_type AS to_type, count(*) AS n
            FROM (SELECT event_type,
                         lag(event_type) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id
                         ) AS from_type
                  FROM events)
            WHERE from_type IS NOT NULL
            GROUP BY 1, 2
        """,
        "event_cooccurrence": """
            SELECT a.event_type AS t1, b.event_type AS t2,
                   count(*) AS n
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND b.ts > a.ts
             AND b.ts <= a.ts + INTERVAL 1 HOUR
            GROUP BY 1, 2
        """,
        "user_daily_dense": """
            WITH c AS (SELECT user_id, CAST(ts AS DATE) AS day,
                              count(*) AS n
                       FROM events GROUP BY 1, 2),
            b AS (SELECT user_id, min(day) AS mn, max(day) AS mx
                  FROM c GROUP BY 1),
            spine AS (SELECT user_id,
                             CAST(unnest(generate_series(mn, mx,
                                         INTERVAL 1 DAY)) AS DATE) AS day
                      FROM b)
            SELECT s.user_id, s.day, coalesce(c.n, 0) AS n
            FROM spine s LEFT JOIN c USING (user_id, day)
        """,
        "sample_bottomk": """
            SELECT doc_id FROM documents
            ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 50
        """,
        # SCD-2 validity intervals (stages/relational.scd2_intervals):
        # lead(ts) over each user's (ts, event_id)-ordered stream
        "event_intervals": """
            SELECT user_id, event_id, ts, event_type,
                   lead(ts) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id
                   ) AS valid_to
            FROM events
        """,
        "latest_event": """
            SELECT event_id, ts, user_id, event_type
            FROM (SELECT event_id, ts, user_id, event_type,
                         row_number() OVER (
                             PARTITION BY user_id
                             ORDER BY ts DESC, event_id
                         ) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        # deterministic per-user modal event type
        # (stages/relational.group_mode): ties break on type asc — NOT
        # the engine mode() aggregate, whose tie-break is unspecified
        "user_top_event": """
            WITH per AS (
                SELECT user_id, event_type, count(*) AS n
                FROM events GROUP BY 1, 2),
            top AS (
                SELECT user_id, event_type, n FROM (
                    SELECT user_id, event_type, n,
                           row_number() OVER (
                               PARTITION BY user_id
                               ORDER BY n DESC, event_type) AS rn
                    FROM per) WHERE rn = 1)
            SELECT t.user_id, t.event_type AS mode,
                   CAST(t.n AS BIGINT) AS n_mode,
                   CAST(s.n_rows AS BIGINT) AS n_rows
            FROM top t
            JOIN (SELECT user_id, count(*) AS n_rows
                  FROM events GROUP BY 1) s
              ON t.user_id = s.user_id
        """,
        "event_ranks": """
            WITH v AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS c
                       FROM events WHERE value IS NOT NULL)
            SELECT DISTINCT event_type, c AS value,
                   CAST(rank() OVER (PARTITION BY event_type ORDER BY c)
                        AS BIGINT) AS rnk,
                   CAST(count(*) OVER (PARTITION BY event_type ORDER BY c)
                        AS BIGINT) AS cume_n,
                   CAST(count(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n_rows
            FROM v
        """,
        "value_mad": """
            WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                              AS c FROM lineitem),
            m AS (SELECT quantile_disc(c, 0.5) AS med FROM v)
            SELECT CAST(any_value(m.med) AS BIGINT) AS median,
                   CAST(quantile_disc(abs(v.c - m.med), 0.5) AS BIGINT)
                       AS mad
            FROM v CROSS JOIN m
        """,
        "doc_repetition": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            ex AS (SELECT doc_id, unnest(t) AS tok FROM toks),
            cnt AS (SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY 1, 2),
            top AS (SELECT doc_id, max(c) AS top_n FROM cnt GROUP BY 1)
            SELECT k.doc_id,
                   CAST(len(k.t) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(k.t)) AS BIGINT) AS n_distinct,
                   CAST(coalesce(top.top_n, 0) * 1000000
                        // greatest(len(k.t), 1) AS BIGINT) AS top_share_ppm
            FROM toks k LEFT JOIN top USING (doc_id)
        """,
        "doc_chunks": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            n AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
            ch AS (SELECT doc_id, t, n,
                          unnest(range(0, CAST(ceil(n / 50.0) AS BIGINT)))
                              AS chunk_idx
                   FROM n)
            SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                   CAST(least(50, n - chunk_idx * 50) AS BIGINT) AS n_tokens,
                   array_to_string(
                       t[chunk_idx * 50 + 1 : least(n, chunk_idx * 50 + 50)],
                       ' ') AS chunk_text
            FROM ch
        """,
        "users_cumulative": """
            WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day
                       FROM events GROUP BY 1),
            c AS (SELECT day, count(*) AS n FROM f GROUP BY 1)
            SELECT day, CAST(sum(n) OVER (ORDER BY day) AS BIGINT)
                       AS cum_users
            FROM c
        """,
        "split_assign": """
            SELECT doc_id,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                            THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
                            THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "group_outliers": """
            WITH v AS (SELECT event_id, event_type,
                              CAST(round(value * 100) AS BIGINT) AS value_cents
                       FROM events),
            s AS (SELECT event_type,
                         CAST(count(*) AS HUGEINT) AS n,
                         CAST(sum(value_cents) AS HUGEINT) AS sv,
                         CAST(sum(value_cents * value_cents) AS HUGEINT) AS sv2
                  FROM v GROUP BY 1)
            SELECT v.event_id, v.event_type, v.value_cents
            FROM v JOIN s USING (event_type)
            WHERE (s.n * v.value_cents - s.sv) > 0
              AND (s.n * v.value_cents - s.sv) * (s.n * v.value_cents - s.sv)
                  > 4 * (s.n * s.sv2 - s.sv * s.sv)
        """,
        "user_mode": """
            SELECT user_id, event_type, n, CAST(rn AS BIGINT) AS rank
            FROM (
                SELECT user_id, event_type, count(*) AS n,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY count(*) DESC, event_type) AS rn
                FROM events GROUP BY 1, 2)
            WHERE rn = 1
        """,
        "user_gaps": """
            SELECT user_id, count(*) AS n_gaps,
                   CAST(sum(gap) AS BIGINT) AS sum_gap_us,
                   CAST(max(gap) AS BIGINT) AS max_gap_us
            FROM (SELECT user_id,
                         epoch_us(ts) - lag(epoch_us(ts)) OVER
                             (PARTITION BY user_id ORDER BY ts) AS gap
                  FROM events)
            WHERE gap IS NOT NULL
            GROUP BY 1
        """,
        # docs containing the corpus top bigram, with occurrence counts
        # (corpus_ops.q_phrase_search: ngram_counts top-1 + stateless scan)
        "phrase_search": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            grams AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(t)),
                              i -> t[i] || ' ' || t[i + 1])) AS gram
                FROM toks WHERE len(t) >= 2),
            cnt AS (SELECT gram, count(*) AS c FROM grams GROUP BY 1),
            top AS (SELECT gram FROM cnt ORDER BY c DESC, gram LIMIT 1)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
            FROM grams JOIN top USING (gram)
            GROUP BY 1
        """,
        "ngram_counts": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            grams AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(t)),
                              i -> t[i] || ' ' || t[i + 1])) AS gram
                FROM toks WHERE len(t) >= 2)
            SELECT gram,
                   count(*) AS n_occurrences,
                   count(DISTINCT doc_id) AS n_docs
            FROM grams
            GROUP BY 1
            ORDER BY n_occurrences DESC, gram
            LIMIT 100
        """,
        # bigram LIFT collocations: margins over ALL bigrams, support
        # filter on output only; same fixed-point integer division as
        # kg_lift (tokens are \\S+, so split_part on ' ' is lossless)
        "collocations": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            grams AS (
                SELECT unnest(list_transform(range(1, len(t)),
                              i -> t[i] || ' ' || t[i + 1])) AS gram
                FROM toks WHERE len(t) >= 2),
            e AS (
                SELECT split_part(gram, ' ', 1) AS w1,
                       split_part(gram, ' ', 2) AS w2,
                       CAST(count(*) AS BIGINT) AS c
                FROM grams GROUP BY 1, 2),
            lm AS (SELECT w1, CAST(sum(c) AS BIGINT) AS n_left
                   FROM e GROUP BY 1),
            rm AS (SELECT w2, CAST(sum(c) AS BIGINT) AS n_right
                   FROM e GROUP BY 1),
            tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM e)
            SELECT w1, w2, c, n_left, n_right,
                   CAST((c * tot.n * 1000000) // (n_left * n_right)
                        AS BIGINT) AS lift_e6
            FROM e
            JOIN lm USING (w1)
            JOIN rm USING (w2)
            CROSS JOIN tot
            WHERE c >= 5
            ORDER BY lift_e6 DESC, w1, w2
            LIMIT 100
        """,
        # robust median + MAD per group (stages/relational.group_mad):
        # both quantile_disc, same ceil(q*n)-1 discrete semantics
        "group_mad": """
            WITH med AS (
                SELECT l_returnflag, quantile_disc(l_quantity, 0.5) AS m
                FROM lineitem GROUP BY 1)
            SELECT l.l_returnflag, any_value(med.m) AS median,
                   quantile_disc(abs(l.l_quantity - med.m), 0.5) AS mad
            FROM lineitem l
            JOIN med ON l.l_returnflag = med.l_returnflag
            GROUP BY 1
        """,
        "group_quantiles": " UNION ALL ".join(
            f"SELECT l_returnflag, CAST({q} AS DOUBLE) AS q, "
            f"quantile_disc(l_quantity, {q}) AS value "
            f"FROM lineitem GROUP BY l_returnflag"
            for q in co.QUANTILE_QS
        ),
        "value_quantiles": " UNION ALL ".join(
            f"SELECT CAST({q} AS DOUBLE) AS q, "
            f"quantile_disc(l_quantity, {q}) AS value FROM lineitem"
            for q in co.QUANTILE_QS
        ),
        # --- training-data corpus ops (driver views: documents/embeddings).
        # Every definition below mirrors the Ray kernel 1:1; tokens are
        # maximal \\S+ runs on trimmed text in BOTH implementations.
        "doc_stats": """
            WITH toks AS (
                SELECT doc_id, text,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents)
            SELECT doc_id,
                   length(text)               AS n_chars,
                   len(t)                     AS n_tokens,
                   len(list_distinct(t))      AS n_distinct_tokens,
                   list_max(list_transform(t, x -> length(x))) AS max_token_len,
                   len(list_filter(t, x -> x IN ('the','a'))) AS n_stopwords,
                   len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct
            FROM toks
        """,
        "token_counts": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            flat AS (SELECT doc_id, unnest(t) AS token FROM toks)
            SELECT token,
                   count(*) AS n_occurrences,
                   count(DISTINCT doc_id) AS n_docs
            FROM flat
            GROUP BY 1
            ORDER BY n_occurrences DESC, token
            LIMIT 100
        """,
        "quality_filter": """
            WITH toks AS (
                SELECT doc_id, text,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            s AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       len(t) AS n_tokens,
                       list_max(list_transform(t, x -> length(x))) AS max_token_len,
                       len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct
                FROM toks)
            SELECT doc_id, n_tokens
            FROM s
            WHERE n_tokens >= 5 AND max_token_len <= 40
              AND n_punct * 10 <= n_chars
        """,
        "lang_id": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            c AS (
                SELECT doc_id,
                       len(list_filter(t, x -> x IN ('der','die','das','und'))) AS c_de,
                       len(list_filter(t, x -> x IN ('the','a')))               AS c_en,
                       len(list_filter(t, x -> x IN ('el','los','y')))          AS c_es,
                       len(list_filter(t, x -> x IN ('le','la','et')))          AS c_fr
                FROM toks)
            SELECT doc_id,
                   CASE WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
                        WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
                        WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
                        WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
                        ELSE 'fr' END AS pred_lang
            FROM c
        """,
        "doc_fingerprint": """
            SELECT doc_id, md5(text) AS digest FROM documents
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_dups
            FROM documents GROUP BY text
        """,
        # benchmark decontamination: corpus docs sharing any distinct
        # word-8-gram with the held-out slice (doc_id % 20 == 0); grams
        # are space-joined \\S+ token runs — identical to
        # textstats.word_shingles(text, 8) on the Ray side
        "decontaminate": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            grams AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, len(t) - 6),
                           i -> t[i]   || ' ' || t[i+1] || ' ' || t[i+2]
                             || ' ' || t[i+3] || ' ' || t[i+4] || ' ' || t[i+5]
                             || ' ' || t[i+6] || ' ' || t[i+7]))) AS g
                FROM toks WHERE len(t) >= 8),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0)
            SELECT doc_id, count(*) AS n_hit_grams
            FROM grams
            WHERE doc_id % 20 <> 0 AND g IN (SELECT g FROM bench)
            GROUP BY 1
        """,
        # CCNet-style boilerplate-segment removal at 3-word-window
        # granularity (engine: stages/curation.segment_dedup — one
        # (hash, doc_id) counting shuffle + broadcast-set streaming
        # rewrite; oracle recomputes on the segment STRINGS, so the
        # engine's internal 64-bit hash key is contract-checked too)
        "boilerplate_segments": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents),
            seg AS (SELECT doc_id,
                           unnest(generate_series(
                               1, CAST((len(ws) + 2) // 3 AS BIGINT))) AS i,
                           ws FROM w),
            segs AS (SELECT doc_id, i,
                            array_to_string(ws[(i-1)*3+1 : i*3], ' ') AS seg
                     FROM seg)
            SELECT seg, count(DISTINCT doc_id) AS n_docs
            FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= 2
        """,
        "segment_dedup": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents),
            seg AS (SELECT doc_id,
                           unnest(generate_series(
                               1, CAST((len(ws) + 2) // 3 AS BIGINT))) AS i,
                           ws FROM w),
            segs AS (SELECT doc_id, i,
                            array_to_string(ws[(i-1)*3+1 : i*3], ' ') AS seg
                     FROM seg),
            bp AS (SELECT seg FROM segs
                   GROUP BY seg HAVING count(DISTINCT doc_id) >= 2)
            SELECT s.doc_id,
                   coalesce(string_agg(s.seg, ' ' ORDER BY s.i)
                            FILTER (WHERE b.seg IS NULL), '') AS clean_text,
                   count(*) AS n_segs,
                   count(b.seg) AS n_dropped
            FROM segs s LEFT JOIN bp b USING (seg)
            GROUP BY s.doc_id
        """,
        # TPC-H-Q13 count-of-counts: orders-per-customer histogram with
        # the zero-order customers the inner join drops (engine:
        # combiner rollup + distributed anti-join + histogram rollup)
        "order_count_distribution": """
            SELECT n_orders, count(*) AS n_customers FROM (
                SELECT c_custkey,
                       count(o_custkey) AS n_orders
                FROM customer LEFT JOIN orders ON c_custkey = o_custkey
                GROUP BY c_custkey)
            GROUP BY n_orders
        """,
        # explicit GROUPING SETS (neither rollup nor cube) with the SQL
        # GROUPING() bitmask (engine: stages/relational.grouped_sets —
        # one corpus scan, coarser sets re-aggregate the detail result)
        "order_grouping_sets": """
            SELECT o_orderpriority, o_orderstatus,
                   CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT)
                       AS gid,
                   count(*) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_total_cents
            FROM orders
            GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """,
        # structured regex mining (PII/URL-miner shape): leftmost
        # non-overlapping matches, per-doc counts; RE2 == Rust-regex on
        # group-free patterns (engine: stages/curation.extract_patterns)
        "extract_patterns": """
            WITH m AS (
                SELECT doc_id, 'a_word' AS kind,
                       unnest(regexp_extract_all(text, '\\ba[a-z]*\\b')) AS hit
                FROM documents
                UNION ALL
                SELECT doc_id, 'long_word',
                       unnest(regexp_extract_all(text, '\\b[a-z]{6,}\\b'))
                FROM documents)
            SELECT doc_id, kind, hit, count(*) AS n
            FROM m GROUP BY doc_id, kind, hit
        """,
        "pattern_stats": """
            WITH m AS (
                SELECT doc_id, 'a_word' AS kind,
                       unnest(regexp_extract_all(text, '\\ba[a-z]*\\b')) AS hit
                FROM documents
                UNION ALL
                SELECT doc_id, 'long_word',
                       unnest(regexp_extract_all(text, '\\b[a-z]{6,}\\b'))
                FROM documents)
            SELECT kind, hit, count(*) AS n_matches,
                   count(DISTINCT doc_id) AS n_docs
            FROM m GROUP BY kind, hit
        """,
        "redact": """
            SELECT doc_id,
                   regexp_replace(text, '\\b(customer|order)\\b',
                                  '<PII>', 'g') AS clean,
                   len(regexp_extract_all(text, '\\b(customer|order)\\b'))
                       AS n_redactions
            FROM documents
        """,
        # top-100 vocabulary (count desc, token asc tie-break) → per-doc
        # in-vocab / unk token counts
        "vocab_encode": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            flat AS (SELECT doc_id, unnest(t) AS token FROM toks),
            vocab AS (
                SELECT token FROM (
                    SELECT token, count(*) AS c FROM flat GROUP BY 1
                    ORDER BY c DESC, token LIMIT 100)),
            enc AS (
                SELECT f.doc_id, count(*) AS n_in_vocab
                FROM flat f JOIN vocab v USING (token) GROUP BY 1)
            SELECT t.doc_id,
                   len(t.t) AS n_tokens,
                   coalesce(e.n_in_vocab, 0) AS n_in_vocab,
                   len(t.t) - coalesce(e.n_in_vocab, 0) AS n_unk
            FROM toks t LEFT JOIN enc e USING (doc_id)
        """,
        # BPE-ish pretokenizer — IDENTICAL regex on both sides (verified:
        # RE2 and rust-regex produce the same token sequences incl. Unicode
        # letter/digit classes, contractions, empty/whitespace-only docs)
        "token_bpe": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
                       AS n_bpe_tokens,
                   len(list_distinct(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')))
                       AS n_bpe_distinct,
                   len(regexp_extract_all(text, '\S+')) AS n_ws_tokens
            FROM documents
        """,
        # exact all-pairs word-3-gram-shingle Jaccard — the ground truth the
        # MinHash+LSH pipeline must reproduce (its miss probability at the
        # 0.5 threshold is ~1e-8 with 128 perms; corpus pairs are all >=0.8)
        # directed containment (|sub∩sup|/|sub| ≥ 4/5, integer-exact);
        # same shingle CTEs as the Jaccard oracle, both directions kept
        "dedup_containment": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            sh AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(t) - 1, 2)),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
                FROM toks),
            sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                      FROM sh GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS i, b.doc_id AS j,
                       CAST(count(*) AS BIGINT) AS c
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT doc_sub, doc_sup, inter, n_sub FROM (
                SELECT i AS doc_sub, j AS doc_sup, c AS inter,
                       sa.n AS n_sub
                FROM inter JOIN sizes sa ON sa.doc_id = i
                WHERE 5 * c >= 4 * sa.n
                UNION ALL
                SELECT j, i, c, sb.n
                FROM inter JOIN sizes sb ON sb.doc_id = j
                WHERE 5 * c >= 4 * sb.n)
            ORDER BY doc_sub, doc_sup
        """,
        # dedup_ngram_jaccard is the EXACT inverted-index similarity
        # join; dedup_minhash is the LSH pipeline whose verify step makes it
        # agree with the same exact-Jaccard answer — both share one oracle.
        "dedup_ngram_jaccard": _JACCARD_ORACLE_SQL,
        "dedup_minhash": _JACCARD_ORACLE_SQL,
        # cross-corpus (incremental-ingest) variant: exact all-pairs
        # Jaccard restricted to (even=standing, odd=arriving) pairs —
        # stages/dedup.py minhash_cross_pairs
        "dedup_incremental": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            sh AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(t) - 1, 2)),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
                FROM toks),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
                FROM sh a JOIN sh b
                  ON a.s = b.s AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
                GROUP BY 1, 2)
            SELECT i AS doc_a, j AS doc_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = i
            JOIN sizes sb ON sb.doc_id = j
            WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
        """,
        # global window ground truth for the TeraSort-shaped distributed
        # rank (stages/relational.py global_rank): range partition +
        # prefix-sum offsets must equal the single-sort row_number/ntile
        "order_global_rank": """
            SELECT o_orderkey,
                   row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk,
                   ntile(8)     OVER (ORDER BY o_totalprice, o_orderkey) AS tile
            FROM orders
        """,
        # all-pairs levenshtein ground truth for the SymSpell
        # deletion-neighborhood decomposition (stages/dedup.py
        # fuzzy_match_pairs) — candidate generation is complete for d<=1,
        # and the engine's verify step computes the same exact distance
        "fuzzy_match": """
            SELECT a.c_custkey AS id_a,
                   b.c_custkey AS id_b,
                   CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
            FROM customer a
            JOIN customer b
              ON a.c_custkey < b.c_custkey
             AND levenshtein(a.c_name, b.c_name) <= 1
        """,
        # survivors after transitive closure over the same pair set:
        # recursive min-label propagation = the union-find the Ray side
        # runs distributed (stages/dedup.py dedup_apply)
        "dedup_minhash_apply": """
            WITH RECURSIVE toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            sh AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(t) - 1, 2)),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
                FROM toks),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
            pairs AS (
                SELECT i AS a, j AS b FROM inter
                JOIN sizes sa ON sa.doc_id = i
                JOIN sizes sb ON sb.doc_id = j
                WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
            sym AS (SELECT a, b FROM pairs
                    UNION ALL SELECT b, a FROM pairs),
            reach(v, r) AS (
                SELECT a AS v, a AS r FROM sym
                UNION
                SELECT reach.v, sym.b FROM reach JOIN sym ON sym.a = reach.r),
            lbl AS (SELECT v, min(r) AS l FROM reach GROUP BY v)
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT v FROM lbl WHERE l < v)
        """,
        "dedup_cluster_sizes": """
            WITH RECURSIVE toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            sh AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(t) - 1, 2)),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
                FROM toks),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            inter AS (
                SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
            pairs AS (
                SELECT i AS a, j AS b FROM inter
                JOIN sizes sa ON sa.doc_id = i
                JOIN sizes sb ON sb.doc_id = j
                WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
            sym AS (SELECT a, b FROM pairs
                    UNION ALL SELECT b, a FROM pairs),
            reach(v, r) AS (
                SELECT a AS v, a AS r FROM sym
                UNION
                SELECT reach.v, sym.b FROM reach JOIN sym ON sym.a = reach.r),
            lbl AS (SELECT v, min(r) AS l FROM reach GROUP BY v),
            cl AS (SELECT l, count(*) AS sz FROM lbl GROUP BY l)
            SELECT CAST(sz AS BIGINT) AS cluster_size,
                   CAST(count(*) AS BIGINT) AS n_clusters
            FROM cl GROUP BY sz
        """,
        # SimHash is SQL-computable since the feature hash moved to
        # md5-60/64-bit: the full sign-sum per bit is mirrored below, so
        # both simhash queries are hash-exact (banding recall is exact
        # for hamming<=3 by pigeonhole over 4 bands)
        "dedup_simhash": f"""
            WITH {_SIMHASH_SIMS_SQL}
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_dups
            FROM sims GROUP BY sh
        """,
        "dedup_simhash_near": f"""
            WITH {_SIMHASH_SIMS_SQL}
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
            FROM sims a JOIN sims b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sh, b.sh)) <= 3
        """,
        "dedup_embedding": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(
                CAST(a.embedding AS DOUBLE[]),
                CAST(b.embedding AS DOUBLE[])) >= 0.45
        """,
        "ann_topk": """
            WITH q AS (
                SELECT vec_id AS qid, embedding AS qe
                FROM embeddings WHERE vec_id < 10),
            s AS (
                SELECT q.qid, e.vec_id AS nid,
                       list_cosine_similarity(
                           CAST(q.qe AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS c
                FROM q JOIN embeddings e ON e.vec_id <> q.qid)
            SELECT qid AS query_id, nid AS neighbor_id, rank
            FROM (
                SELECT qid, nid,
                       ROW_NUMBER() OVER (
                           PARTITION BY qid ORDER BY c DESC, nid) AS rank
                FROM s)
            WHERE rank <= 5
        """,
        # RRF of the cosine and Euclidean rankings; contributions are
        # exact integers 1e6 // (60 + rank), so the fusion is float-free
        # (ranks themselves are deterministic: score order, nid tiebreak)
        "retrieval_fusion": """
            WITH q AS (
                SELECT vec_id AS qid, embedding AS qe
                FROM embeddings WHERE vec_id < 10),
            s AS (
                SELECT q.qid, e.vec_id AS nid,
                       list_cosine_similarity(
                           CAST(q.qe AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS c,
                       list_distance(
                           CAST(q.qe AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS d
                FROM q JOIN embeddings e ON e.vec_id <> q.qid),
            rc AS (SELECT qid, nid,
                          ROW_NUMBER() OVER (
                              PARTITION BY qid ORDER BY c DESC, nid) AS r
                   FROM s),
            rd AS (SELECT qid, nid,
                          ROW_NUMBER() OVER (
                              PARTITION BY qid ORDER BY d ASC, nid) AS r
                   FROM s),
            u AS (
                SELECT qid, nid, 1000000 // (60 + r) AS pts
                FROM rc WHERE r <= 20
                UNION ALL
                SELECT qid, nid, 1000000 // (60 + r)
                FROM rd WHERE r <= 20),
            f AS (SELECT qid, nid, CAST(sum(pts) AS BIGINT) AS rrf_pts
                  FROM u GROUP BY 1, 2)
            SELECT query_id, neighbor_id, rrf_pts, rank FROM (
                SELECT qid AS query_id, nid AS neighbor_id, rrf_pts,
                       ROW_NUMBER() OVER (
                           PARTITION BY qid
                           ORDER BY rrf_pts DESC, nid) AS rank
                FROM f)
            WHERE rank <= 10
            ORDER BY query_id, rank
        """,
        # codebook assignment is integer-exact end-to-end: quantize to
        # floor(x*1000 + 0.5) int64 (both engines compute this in IEEE
        # double, identically), then ±1 probe dot products are exact
        # integer sums in any order — argmax with lowest-probe tie-break
        # one-pass decomposable covariance sufficient stats (similarity.py
        # embedding_cov_stats); same floor(x*1000+0.5) int quantization as
        # embed_probe_assign so sums are reduction-order-free
        "embed_cov_stats": """
            WITH idx AS (SELECT * FROM (VALUES (1),(2),(3),(4)) t(d)),
            q AS (SELECT embedding AS e FROM embeddings)
            SELECT CAST(a.d AS BIGINT) AS i, CAST(b.d AS BIGINT) AS j,
                   count(*) AS n,
                   CAST(SUM(CAST(floor(CAST(q.e[a.d] AS DOUBLE) * 1000 + 0.5)
                            AS BIGINT)) AS BIGINT) AS sum_i,
                   CAST(SUM(CAST(floor(CAST(q.e[b.d] AS DOUBLE) * 1000 + 0.5)
                            AS BIGINT)) AS BIGINT) AS sum_j,
                   CAST(SUM(CAST(floor(CAST(q.e[a.d] AS DOUBLE) * 1000 + 0.5)
                            AS BIGINT)
                       * CAST(floor(CAST(q.e[b.d] AS DOUBLE) * 1000 + 0.5)
                              AS BIGINT)) AS BIGINT) AS sum_ij
            FROM q, idx a, idx b
            WHERE a.d <= b.d
            GROUP BY 1, 2
        """,
        "embed_probe_assign": """
            WITH x AS (
                SELECT vec_id,
                       generate_subscripts(embedding, 1) - 1 AS idx,
                       CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                  * 1000 + 0.5) AS BIGINT) AS xq
                FROM embeddings),
            s AS (
                SELECT vec_id,
                       CAST(SUM(CASE WHEN (idx >> 0) & 1 = 0
                                THEN xq ELSE -xq END) AS BIGINT) AS s0,
                       CAST(SUM(CASE WHEN (idx >> 1) & 1 = 0
                                THEN xq ELSE -xq END) AS BIGINT) AS s1,
                       CAST(SUM(CASE WHEN (idx >> 2) & 1 = 0
                                THEN xq ELSE -xq END) AS BIGINT) AS s2,
                       CAST(SUM(CASE WHEN (idx >> 3) & 1 = 0
                                THEN xq ELSE -xq END) AS BIGINT) AS s3
                FROM x GROUP BY vec_id)
            SELECT vec_id,
                   CASE WHEN s0 >= s1 AND s0 >= s2 AND s0 >= s3 THEN 0
                        WHEN s1 >= s2 AND s1 >= s3 THEN 1
                        WHEN s2 >= s3 THEN 2
                        ELSE 3 END AS cluster,
                   GREATEST(s0, s1, s2, s3) AS score
            FROM s
        """,
        "knn_label": """
            WITH q AS (
                SELECT vec_id AS qid, embedding AS qe
                FROM embeddings WHERE vec_id < 10),
            s AS (
                SELECT q.qid, e.vec_id AS nid, e.label,
                       list_cosine_similarity(
                           CAST(q.qe AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS c
                FROM q JOIN embeddings e ON e.vec_id <> q.qid),
            topk AS (
                SELECT qid, label FROM (
                    SELECT qid, label,
                           ROW_NUMBER() OVER (
                               PARTITION BY qid ORDER BY c DESC, nid) AS rank
                    FROM s)
                WHERE rank <= 5),
            votes AS (
                SELECT qid, label, count(*) AS cnt
                FROM topk GROUP BY 1, 2)
            SELECT qid AS query_id, label AS knn_label FROM (
                SELECT qid, label,
                       ROW_NUMBER() OVER (
                           PARTITION BY qid ORDER BY cnt DESC, label) AS rn
                FROM votes)
            WHERE rn = 1
        """,
        "multimodal_features": """
            SELECT doc_id AS media_id,
                   strlen(text) AS n_bytes,
                   sha256(text) AS digest
            FROM documents
        """,
        "multimodal_resize": """
            WITH d AS (
                SELECT doc_id AS media_id,
                       64 + strlen(text) % 512 AS width,
                       64 + (strlen(text) // 7) % 512 AS height
                FROM documents)
            SELECT media_id, width, height,
                   CASE WHEN greatest(width, height) > 256
                        THEN width * 256 // greatest(width, height)
                        ELSE width END AS out_width,
                   CASE WHEN greatest(width, height) > 256
                        THEN height * 256 // greatest(width, height)
                        ELSE height END AS out_height
            FROM d
        """,
        "multimodal_frames": """
            WITH f AS (
                SELECT doc_id AS media_id,
                       1 + strlen(text) % 60 AS n_frames
                FROM documents),
            s AS (
                SELECT media_id, n_frames,
                       greatest(1, n_frames // 8) AS stride
                FROM f)
            SELECT media_id,
                   unnest(range(0, n_frames, stride)) AS frame_idx,
                   n_frames
            FROM s
        """,
        "kg_nodes": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            )
            SELECT b.entity_id,
                   e.canonical_name,
                   MIN(m.ent_type) AS ent_type,
                   COUNT(*) AS mention_count
            FROM read_parquet('{g}/golden_mentions/*.parquet') m
            JOIN best b
              ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            JOIN read_parquet('{g}/entities.parquet') e
              ON e.entity_id = b.entity_id
            GROUP BY 1, 2
        """,
        "q10_returned_items": """
            WITH rev AS (
                SELECT o_custkey,
                       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (10000 - CAST(round(l_discount * 10000)
                                            AS BIGINT))) AS BIGINT)
                           AS revenue
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE l_returnflag = 'R'
                  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
                GROUP BY 1)
            SELECT c_custkey, c_name, n_name, revenue
            FROM customer
            JOIN rev ON c_custkey = o_custkey
            JOIN nation ON n_nationkey = c_nationkey
            ORDER BY revenue DESC, c_custkey
            LIMIT 20
        """,
        "kg_embeddedness": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            e AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            und AS MATERIALIZED (
                SELECT DISTINCT least(subj_id, obj_id) AS a,
                                greatest(subj_id, obj_id) AS b
                FROM e WHERE subj_id <> obj_id
            ),
            sym AS MATERIALIZED (
                SELECT a AS u, b AS v FROM und
                UNION ALL SELECT b, a FROM und
            ),
            sup AS (
                SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS support
                FROM und e
                JOIN sym s1 ON s1.u = e.a
                JOIN sym s2 ON s2.u = e.b AND s2.v = s1.v
                GROUP BY 1, 2
            )
            SELECT und.a, und.b,
                   CAST(coalesce(sup.support, 0) AS BIGINT) AS support
            FROM und LEFT JOIN sup ON und.a = sup.a AND und.b = sup.b
            ORDER BY 1, 2
        """,
        "kg_entity_churn": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            ed AS MATERIALIZED (
                SELECT DISTINCT e, day FROM (
                    SELECT s.entity_id AS e, CAST(t.ts AS DATE) AS day
                    FROM read_parquet('{g}/golden_triples/*.parquet') t
                    JOIN lm s ON t.subj_mention_id = s.mention_id
                    UNION ALL
                    SELECT o.entity_id, CAST(t.ts AS DATE)
                    FROM read_parquet('{g}/golden_triples/*.parquet') t
                    JOIN lm o ON t.obj_mention_id = o.mention_id
                )
            ),
            fs AS (SELECT e, min(day) AS f FROM ed GROUP BY 1)
            SELECT day, CAST(count(*) AS BIGINT) AS n_active,
                   CAST(sum(CASE WHEN day = f THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_new
            FROM ed JOIN fs USING (e)
            GROUP BY 1 ORDER BY 1
        """,
        # counting-semiring walks: UNION ALL recursion (no dedup — every
        # walk counts), hop-capped exactly like the engine's 3 rounds
        "kg_paths": f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            e2 AS MATERIALIZED (
                SELECT DISTINCT s.entity_id AS subj_id, t.pred,
                                o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            sym AS MATERIALIZED (
                SELECT subj_id AS src, obj_id AS dst FROM e2
                UNION ALL SELECT obj_id, subj_id FROM e2
            ),
            walks(node, hops) AS (
                SELECT (SELECT min(src) FROM sym), 0
                UNION ALL
                SELECT s.dst, w.hops + 1
                FROM walks w JOIN sym s ON s.src = w.node
                WHERE w.hops < 3
            )
            SELECT node, CAST(count(*) AS BIGINT) AS n_paths
            FROM walks WHERE hops >= 1 GROUP BY node
        """,
        # SCD-2 change-point timeline over the same rewritten stream as
        # kg_latest_assertion: one object per (subj, pred, ts) (min
        # tie-break), keep first/changed objects ordered by ts, LEAD for
        # the validity window (graph.py validity_intervals)
        "kg_validity": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            rt AS (
                SELECT s.entity_id AS subj_id, t.pred,
                       o.entity_id AS obj_id, t.ts
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            d AS (
                SELECT subj_id, pred, ts, min(obj_id) AS obj_id
                FROM rt GROUP BY 1, 2, 3
            ),
            c AS (
                SELECT *, lag(obj_id) OVER (
                    PARTITION BY subj_id, pred ORDER BY ts
                ) AS prev FROM d
            ),
            k AS (
                SELECT subj_id, pred, obj_id, ts AS valid_from
                FROM c WHERE prev IS NULL OR obj_id <> prev
            )
            SELECT subj_id, pred, obj_id, valid_from,
                   lead(valid_from) OVER (
                       PARTITION BY subj_id, pred ORDER BY valid_from
                   ) AS valid_to
            FROM k
        """,
        # predicate drift: the event_trends regression re-applied to the
        # rewritten assertion stream (events.event_trends key='pred')
        "kg_pred_trend": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            rt AS (
                SELECT s.entity_id AS subj_id, t.pred,
                       o.entity_id AS obj_id, t.ts
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            dc AS (
                SELECT pred, CAST(ts AS DATE) AS day,
                       CAST(count(*) AS BIGINT) AS n
                FROM rt GROUP BY 1, 2
            ),
            xy AS (
                SELECT pred,
                       CAST(day - DATE '1970-01-01' AS BIGINT) AS x,
                       n AS y
                FROM dc
            )
            SELECT pred,
                   CAST(count(*) AS BIGINT) AS n_days,
                   CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
                       AS slope_num,
                   CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
                       AS slope_den
            FROM xy GROUP BY 1
        """,
        # p+ closure rollup on the min predicate: distinct pairs with
        # min hops (≤4), then count/max per ancestor (graph.py
        # closure_rollup = regular_path_pairs(p, p) + rollup)
        "kg_descendants": f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            e2 AS MATERIALIZED (
                SELECT DISTINCT s.entity_id AS subj_id, t.pred,
                                o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            p AS MATERIALIZED (SELECT min(pred) AS p1 FROM e2),
            walk(src, dst, hops) AS (
                SELECT subj_id, obj_id, 1 FROM e2 JOIN p ON e2.pred = p.p1
                UNION ALL
                SELECT w.src, e.obj_id, w.hops + 1
                FROM walk w
                JOIN e2 e ON e.subj_id = w.dst
                JOIN p ON e.pred = p.p1
                WHERE w.hops < 4
            ),
            mp AS (
                SELECT src, dst, min(hops) AS hops FROM walk GROUP BY 1, 2
            )
            SELECT src, CAST(count(*) AS BIGINT) AS n_desc,
                   CAST(max(hops) AS BIGINT) AS depth
            FROM mp GROUP BY 1
        """,
        # release diff between the two quartile cutoffs: FULL JOIN of the
        # covering rows, unchanged objects drop out (graph.py
        # snapshot_diff; integer-µs cutoff arithmetic mirrors the engine)
        "kg_diff": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            rt AS (
                SELECT s.entity_id AS subj_id, t.pred,
                       o.entity_id AS obj_id, t.ts
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            d AS (
                SELECT subj_id, pred, ts, min(obj_id) AS obj_id
                FROM rt GROUP BY 1, 2, 3
            ),
            c AS (
                SELECT *, lag(obj_id) OVER (
                    PARTITION BY subj_id, pred ORDER BY ts
                ) AS prev FROM d
            ),
            k AS (
                SELECT subj_id, pred, obj_id, ts AS valid_from
                FROM c WHERE prev IS NULL OR obj_id <> prev
            ),
            iv AS (
                SELECT subj_id, pred, obj_id, valid_from,
                       lead(valid_from) OVER (
                           PARTITION BY subj_id, pred ORDER BY valid_from
                       ) AS valid_to
                FROM k
            ),
            cut AS (
                SELECT epoch_us(min(ts))
                           + (epoch_us(max(ts)) - epoch_us(min(ts))) // 4
                           AS t1,
                       epoch_us(min(ts))
                           + (3 * (epoch_us(max(ts)) - epoch_us(min(ts))))
                             // 4 AS t2
                FROM rt
            ),
            s1 AS (
                SELECT subj_id, pred, obj_id AS obj_before
                FROM iv, cut
                WHERE epoch_us(valid_from) <= cut.t1
                  AND (valid_to IS NULL OR epoch_us(valid_to) > cut.t1)
            ),
            s2 AS (
                SELECT subj_id, pred, obj_id AS obj_after
                FROM iv, cut
                WHERE epoch_us(valid_from) <= cut.t2
                  AND (valid_to IS NULL OR epoch_us(valid_to) > cut.t2)
            )
            SELECT COALESCE(s1.subj_id, s2.subj_id) AS subj_id,
                   COALESCE(s1.pred, s2.pred) AS pred,
                   obj_before, obj_after,
                   CASE WHEN obj_before IS NULL THEN 'added'
                        WHEN obj_after IS NULL THEN 'removed'
                        ELSE 'changed' END AS change
            FROM s1
            FULL JOIN s2
              ON s1.subj_id = s2.subj_id AND s1.pred = s2.pred
            WHERE obj_before IS NULL OR obj_after IS NULL
               OR obj_before <> obj_after
        """,
        # believed-assertion count at 8 evenly spaced cutoffs over the
        # SCD-2 timeline (__ray_entry__ _q_kg_belief_curve)
        "kg_belief_curve": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            rt AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, t.pred,
                       o.entity_id AS obj_id, t.ts
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            d AS (
                SELECT subj_id, pred, ts, min(obj_id) AS obj_id
                FROM rt GROUP BY 1, 2, 3
            ),
            c AS (
                SELECT *, lag(obj_id) OVER (
                    PARTITION BY subj_id, pred ORDER BY ts
                ) AS prev FROM d
            ),
            kk AS (
                SELECT subj_id, pred, obj_id, ts AS valid_from
                FROM c WHERE prev IS NULL OR obj_id <> prev
            ),
            iv AS (
                SELECT subj_id, pred, valid_from,
                       lead(valid_from) OVER (
                           PARTITION BY subj_id, pred ORDER BY valid_from
                       ) AS valid_to
                FROM kk
            ),
            bounds AS (
                SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi
                FROM rt
            ),
            cuts AS (
                SELECT k, lo + k * (hi - lo) // 8 AS at_us
                FROM bounds, unnest(range(1, 9)) AS t(k)
            )
            SELECT c2.k, c2.at_us,
                   CAST(count(iv.valid_from) AS BIGINT) AS n_believed
            FROM cuts c2
            LEFT JOIN iv
              ON epoch_us(iv.valid_from) <= c2.at_us
             AND (iv.valid_to IS NULL
                  OR epoch_us(iv.valid_to) > c2.at_us)
            GROUP BY 1, 2
        """,
        # per-entity activity window (subject OR object role) over the
        # rewritten stream (__ray_entry__ _q_kg_entity_lifetimes)
        "kg_entity_lifetimes": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            rt AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, o.entity_id AS obj_id, t.ts
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            roles AS (
                SELECT subj_id AS entity_id, epoch_us(ts) AS us FROM rt
                UNION ALL
                SELECT obj_id, epoch_us(ts) FROM rt
            )
            SELECT entity_id,
                   CAST(min(us) AS BIGINT) AS first_us,
                   CAST(max(us) AS BIGINT) AS last_us,
                   CAST(count(*) AS BIGINT) AS n_assertions
            FROM roles GROUP BY 1
        """,
        # reciprocal-assertion lag over mutually-asserted pairs
        # (graph.py reciprocity_lag)
        "kg_reciprocity_lag": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            rt AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, o.entity_id AS obj_id, t.ts
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            dm AS MATERIALIZED (
                SELECT least(subj_id, obj_id) AS a,
                       greatest(subj_id, obj_id) AS b,
                       subj_id < obj_id AS fwd,
                       min(epoch_us(ts)) AS ts
                FROM rt WHERE subj_id <> obj_id
                GROUP BY 1, 2, 3
            ),
            lags AS (
                SELECT a, b, max(ts) - min(ts) AS lag
                FROM dm GROUP BY 1, 2 HAVING count(*) = 2
            )
            SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(coalesce(sum(lag), 0) AS BIGINT) AS sum_lag_us,
                   CAST(coalesce(max(lag), 0) AS BIGINT) AS max_lag_us
            FROM lags
        """,
        # temporal triangles: closure-time stats over the 3-way join of
        # min-ts undirected edges (graph.py triadic_closure_times)
        "kg_triadic_closure": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            rt AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, o.entity_id AS obj_id, t.ts
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            und AS MATERIALIZED (
                SELECT least(subj_id, obj_id) AS a,
                       greatest(subj_id, obj_id) AS b,
                       min(epoch_us(ts)) AS ts
                FROM rt WHERE subj_id <> obj_id
                GROUP BY 1, 2
            ),
            tri AS MATERIALIZED (
                SELECT greatest(e1.ts, e2.ts, e3.ts)
                         - least(e1.ts, e2.ts, e3.ts) AS close_us
                FROM und e1
                JOIN und e2 ON e2.a = e1.b
                JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
            )
            SELECT CAST(count(*) AS BIGINT) AS n_triangles,
                   CAST(coalesce(sum(close_us), 0) AS BIGINT)
                       AS sum_close_us,
                   CAST(coalesce(max(close_us), 0) AS BIGINT)
                       AS max_close_us
            FROM tri
        """,
        # rich-club: undirected simple edges among the 20 highest-degree
        # nodes (graph.py rich_club_edges)
        "kg_richclub": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            e2 AS MATERIALIZED (
                SELECT DISTINCT s.entity_id AS subj_id,
                                o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            und AS MATERIALIZED (
                SELECT DISTINCT least(subj_id, obj_id) AS a,
                                greatest(subj_id, obj_id) AS b
                FROM e2 WHERE subj_id <> obj_id
            ),
            deg AS (
                SELECT node, count(*) AS deg FROM (
                    SELECT a AS node FROM und
                    UNION ALL SELECT b FROM und
                ) GROUP BY 1
            ),
            club AS MATERIALIZED (
                SELECT node FROM deg ORDER BY deg DESC, node LIMIT 20
            )
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM club) AS n_club,
                   (SELECT CAST(count(*) AS BIGINT) FROM und
                     WHERE a IN (SELECT node FROM club)
                       AND b IN (SELECT node FROM club)) AS n_within,
                   (SELECT CAST(count(*) * (count(*) - 1) // 2 AS BIGINT)
                      FROM club) AS n_possible
        """,
        # extraction-yield count-of-counts over golden triples
        # (__ray_entry__ _q_kg_conv_hist)
        "kg_conv_hist": f"""
            WITH per_conv AS (
                SELECT conv_id, CAST(count(*) AS BIGINT) AS n
                FROM read_parquet('{g}/golden_triples/*.parquet')
                GROUP BY 1
            )
            SELECT n AS n_assertions,
                   CAST(count(*) AS BIGINT) AS n_convs
            FROM per_conv GROUP BY 1
        """,
        # predicate churn: interval/closure counts + closed lifetime µs
        # over the same SCD-2 timeline (graph.py pred_volatility)
        "kg_volatility": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            rt AS (
                SELECT s.entity_id AS subj_id, t.pred,
                       o.entity_id AS obj_id, t.ts
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            d AS (
                SELECT subj_id, pred, ts, min(obj_id) AS obj_id
                FROM rt GROUP BY 1, 2, 3
            ),
            c AS (
                SELECT *, lag(obj_id) OVER (
                    PARTITION BY subj_id, pred ORDER BY ts
                ) AS prev FROM d
            ),
            k AS (
                SELECT subj_id, pred, obj_id, ts AS valid_from
                FROM c WHERE prev IS NULL OR obj_id <> prev
            ),
            iv AS (
                SELECT subj_id, pred, valid_from,
                       lead(valid_from) OVER (
                           PARTITION BY subj_id, pred ORDER BY valid_from
                       ) AS valid_to
                FROM k
            )
            SELECT pred,
                   CAST(count(*) AS BIGINT) AS n_intervals,
                   CAST(count(valid_to) AS BIGINT) AS n_closed,
                   CAST(coalesce(sum(
                       epoch_us(valid_to) - epoch_us(valid_from)
                   ), 0) AS BIGINT) AS closed_dur_us
            FROM iv GROUP BY 1
        """,
        # time travel: the validity-interval row covering the midpoint
        # cutoff (integer-µs arithmetic on both sides; graph.py
        # belief_snapshot over validity_intervals)
        "kg_snapshot": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            rt AS (
                SELECT s.entity_id AS subj_id, t.pred,
                       o.entity_id AS obj_id, t.ts
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            d AS (
                SELECT subj_id, pred, ts, min(obj_id) AS obj_id
                FROM rt GROUP BY 1, 2, 3
            ),
            c AS (
                SELECT *, lag(obj_id) OVER (
                    PARTITION BY subj_id, pred ORDER BY ts
                ) AS prev FROM d
            ),
            k AS (
                SELECT subj_id, pred, obj_id, ts AS valid_from
                FROM c WHERE prev IS NULL OR obj_id <> prev
            ),
            iv AS (
                SELECT subj_id, pred, obj_id, valid_from,
                       lead(valid_from) OVER (
                           PARTITION BY subj_id, pred ORDER BY valid_from
                       ) AS valid_to
                FROM k
            ),
            cut AS (
                SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS t
                FROM rt
            )
            SELECT subj_id, pred, obj_id, valid_from
            FROM iv, cut
            WHERE epoch_us(valid_from) <= cut.t
              AND (valid_to IS NULL OR epoch_us(valid_to) > cut.t)
        """,
        # RPQ p1·p2* (p1 = min pred, p2 = max pred): UNION ALL recursion
        # capped at 1 + 3 star hops, min(hops) per reachable pair — the
        # engine's pair-frontier min-merge computes the same fixpoint
        "kg_rpq": f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            e2 AS MATERIALIZED (
                SELECT DISTINCT s.entity_id AS subj_id, t.pred,
                                o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            p AS MATERIALIZED (
                SELECT min(pred) AS p1, max(pred) AS p2 FROM e2
            ),
            walk(src, dst, hops) AS (
                SELECT subj_id, obj_id, 1 FROM e2 JOIN p ON e2.pred = p.p1
                UNION ALL
                SELECT w.src, e.obj_id, w.hops + 1
                FROM walk w
                JOIN e2 e ON e.subj_id = w.dst
                JOIN p ON e.pred = p.p2
                WHERE w.hops < 4
            )
            SELECT src, dst, CAST(min(hops) AS BIGINT) AS hops
            FROM walk GROUP BY 1, 2
        """,
        "split_leakage": f"""
            WITH pairs AS ({_JACCARD_ORACLE_SQL})
            SELECT doc_a, doc_b,
                   CASE WHEN substr(md5(CAST(doc_a AS VARCHAR)), 1, 2) < 'e6'
                            THEN 'train'
                        WHEN substr(md5(CAST(doc_a AS VARCHAR)), 1, 2) < 'f3'
                            THEN 'val'
                        ELSE 'test' END AS split_a,
                   CASE WHEN substr(md5(CAST(doc_b AS VARCHAR)), 1, 2) < 'e6'
                            THEN 'train'
                        WHEN substr(md5(CAST(doc_b AS VARCHAR)), 1, 2) < 'f3'
                            THEN 'val'
                        ELSE 'test' END AS split_b
            FROM pairs
            WHERE (CASE WHEN substr(md5(CAST(doc_a AS VARCHAR)), 1, 2) < 'e6'
                            THEN 'train'
                        WHEN substr(md5(CAST(doc_a AS VARCHAR)), 1, 2) < 'f3'
                            THEN 'val' ELSE 'test' END)
               <> (CASE WHEN substr(md5(CAST(doc_b AS VARCHAR)), 1, 2) < 'e6'
                            THEN 'train'
                        WHEN substr(md5(CAST(doc_b AS VARCHAR)), 1, 2) < 'f3'
                            THEN 'val' ELSE 'test' END)
            ORDER BY 1, 2
        """,
        "q8_market_share": """
            WITH mkt AS (
                SELECT o_orderkey, year(o_orderdate) AS yr
                FROM orders JOIN customer ON c_custkey = o_custkey
                JOIN nation ON n_nationkey = c_nationkey
                WHERE n_name = 'NATION_13'),
            f AS (
                SELECT mkt.yr,
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
                           AS rev,
                       l_suppkey
                FROM lineitem JOIN mkt ON l_orderkey = o_orderkey
                WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'),
            home AS (
                SELECT s_suppkey FROM supplier
                JOIN nation ON n_nationkey = s_nationkey
                WHERE n_name = 'NATION_12')
            SELECT CAST(yr AS BIGINT) AS yr,
                   CAST(coalesce(sum(CASE WHEN l_suppkey IN
                       (SELECT s_suppkey FROM home) THEN rev END), 0)
                       AS BIGINT) AS home_rev,
                   CAST(sum(rev) AS BIGINT) AS total_rev
            FROM f GROUP BY 1 ORDER BY 1
        """,
        "q19_disjunctive_revenue": """
            SELECT CAST(coalesce(sum(
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
                   ), 0) AS BIGINT) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#4'
                   AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 15
                   AND p_size BETWEEN 1 AND 10)
               OR (p_brand = 'Brand#2'
                   AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 25
                   AND p_size BETWEEN 1 AND 25)
               OR (p_brand = 'Brand#19'
                   AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 35
                   AND p_size BETWEEN 1 AND 40)
        """,
        "q12_late_shipments": """
            SELECT o_orderpriority,
                   CAST(sum(CASE WHEN l_shipdate >
                                      o_orderdate + INTERVAL 90 DAY
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
                   CAST(count(*) AS BIGINT) AS n_total
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1 ORDER BY 1
        """,
        "q7_nation_volume": """
            WITH rev AS (
                SELECT l_orderkey, l_suppkey,
                       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (10000 - CAST(round(l_discount * 10000)
                                            AS BIGINT))) AS BIGINT) AS r
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                GROUP BY 1, 2)
            SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                   CAST(year(o_orderdate) AS BIGINT) AS yr,
                   CAST(sum(r) AS BIGINT) AS revenue
            FROM rev
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation sn ON sn.n_nationkey = s_nationkey
            JOIN nation cn ON cn.n_nationkey = c_nationkey
            WHERE sn.n_name IN ('NATION_12', 'NATION_13')
              AND cn.n_name IN ('NATION_12', 'NATION_13')
              AND sn.n_name <> cn.n_name
            GROUP BY 1, 2, 3
            ORDER BY 1, 2, 3
        """,
        "q2_min_cost_shipper": """
            WITH st AS (
                SELECT DISTINCT p_type, l_suppkey
                FROM lineitem JOIN part ON l_partkey = p_partkey),
            sa AS (
                SELECT p_type, l_suppkey,
                       CAST(round(s_acctbal * 100) AS BIGINT)
                           AS acctbal_cents
                FROM st JOIN supplier ON s_suppkey = l_suppkey)
            SELECT p_type, l_suppkey AS s_suppkey, acctbal_cents
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY p_type
                      ORDER BY acctbal_cents, l_suppkey) AS rn
                  FROM sa)
            WHERE rn = 1 ORDER BY p_type
        """,
        # sliding 1h window anchored at each event; the engine's
        # two-sided searchsorted replaces this O(n^2) self-join
        "event_bursts": """
            SELECT user_id, CAST(max(c) AS BIGINT) AS max_burst FROM (
                SELECT a.user_id, a.event_id, count(*) AS c
                FROM events a JOIN events b ON a.user_id = b.user_id
                 AND b.ts >= a.ts
                 AND b.ts <= a.ts + INTERVAL 1 HOUR
                GROUP BY 1, 2)
            GROUP BY 1 ORDER BY 1
        """,
        "q16_supplier_counts": """
            SELECT p_brand, p_type,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT)
                       AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0)
              AND p_size <= 10
            GROUP BY 1, 2
            ORDER BY supplier_cnt DESC, p_brand, p_type
        """,
        # Efraimidis–Spirakis weighted sample: top-50 by u^(1/w) with
        # u = (md5_60(doc_id)+1)/(2^60+1); pow/division are IEEE double
        # in both engines and md5 priorities never tie in practice
        "sample_weighted": """
            SELECT doc_id, CAST(n_chars AS BIGINT) AS weight
            FROM documents
            ORDER BY pow(
                (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                     ::BIGINT + 1) / 1152921504606846977.0,
                1.0 / greatest(n_chars, 1)) DESC,
                doc_id
            LIMIT 50
        """,
        "fk_audit": """
            SELECT fk, n_rows, n_orphans FROM (
                SELECT 'lineitem.l_orderkey->orders' AS fk,
                       CAST(count(*) AS BIGINT) AS n_rows,
                       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1
                                     ELSE 0 END) AS BIGINT) AS n_orphans
                FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey
                                         FROM orders) o
                  ON l_orderkey = o_orderkey
                UNION ALL
                SELECT 'lineitem.l_partkey->part',
                       CAST(count(*) AS BIGINT),
                       CAST(sum(CASE WHEN p_partkey IS NULL THEN 1
                                     ELSE 0 END) AS BIGINT)
                FROM lineitem LEFT JOIN (SELECT DISTINCT p_partkey
                                         FROM part) p
                  ON l_partkey = p_partkey
                UNION ALL
                SELECT 'lineitem.l_suppkey->supplier',
                       CAST(count(*) AS BIGINT),
                       CAST(sum(CASE WHEN s_suppkey IS NULL THEN 1
                                     ELSE 0 END) AS BIGINT)
                FROM lineitem LEFT JOIN (SELECT DISTINCT s_suppkey
                                         FROM supplier) s
                  ON l_suppkey = s_suppkey
                UNION ALL
                SELECT 'orders.o_custkey->customer',
                       CAST(count(*) AS BIGINT),
                       CAST(sum(CASE WHEN c_custkey IS NULL THEN 1
                                     ELSE 0 END) AS BIGINT)
                FROM orders LEFT JOIN (SELECT DISTINCT c_custkey
                                       FROM customer) c
                  ON o_custkey = c_custkey
            ) ORDER BY fk
        """,
        # widest path: (max, min) semiring over the same weighted sym
        # edge set as kg_sssp; source excluded (engine sentinel absorbs it)
        "kg_widest": f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            wedges AS MATERIALIZED (
                SELECT s.entity_id AS src, t.pred, o.entity_id AS dst,
                       COUNT(*) AS w
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
                GROUP BY 1, 2, 3
            ),
            sym AS MATERIALIZED (
                SELECT src, dst, w FROM wedges
                UNION ALL SELECT dst, src, w FROM wedges
            ),
            reach(node, wmin, hops) AS (
                SELECT (SELECT min(src) FROM sym),
                       CAST(4611686018427387904 AS BIGINT), 0
                UNION
                SELECT s.dst, least(r.wmin, s.w), r.hops + 1
                FROM reach r JOIN sym s ON s.src = r.node
                WHERE r.hops < 4
            )
            SELECT node, CAST(max(wmin) AS BIGINT) AS width
            FROM reach
            WHERE node <> (SELECT min(src) FROM sym)
            GROUP BY node
        """,
        "event_disorder": """
            WITH w AS (
                SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                       max(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS prev_max
                FROM events)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CASE WHEN ts_us < prev_max THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_late,
                   CAST(coalesce(max(CASE WHEN prev_max > ts_us
                                          THEN prev_max - ts_us END), 0)
                        AS BIGINT) AS max_late_us
            FROM w GROUP BY 1 ORDER BY 1
        """,
        "kg_conflicts": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            e AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, t.pred, o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            )
            SELECT subj_id, pred,
                   CAST(count(DISTINCT obj_id) AS BIGINT) AS n_objs,
                   min(obj_id) AS min_obj, max(obj_id) AS max_obj
            FROM e GROUP BY 1, 2
            HAVING count(DISTINCT obj_id) > 1
            ORDER BY 1, 2
        """,
        "kg_functionality": f"""
            WITH best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            e AS MATERIALIZED (
                SELECT s.entity_id AS subj_id, t.pred, o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            pair AS (
                SELECT pred, subj_id,
                       count(DISTINCT obj_id) AS n
                FROM e GROUP BY 1, 2
            )
            SELECT pred, CAST(count(*) AS BIGINT) AS n_subjects,
                   CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_functional
            FROM pair GROUP BY 1 ORDER BY 1
        """,
        # deterministic random walks: recursive CTE mirrors the engine's
        # md5_60(node|step|walk) mod deg next-hop rule bit-exactly
        "kg_walks": walks_sql,
        # skip-gram window-2 pairs over the SAME deterministic walks
        "kg_skipgrams": f"""
            SELECT a.node AS center, b.node AS context,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM ({walks_sql}) a JOIN ({walks_sql}) b
              ON a.start = b.start AND a.walk = b.walk
             AND a.step <> b.step AND abs(a.step - b.step) <= 2
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # TPC-H join-shape compositions (corpus_ops.q_q4/q14/q15/q17/q18/q22)
        "q4_order_priority": """
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
            GROUP BY 1 ORDER BY 1
        """,
        "q14_promo_share": """
            SELECT CAST(coalesce(sum(CASE WHEN p_type = 'PROMO' THEN
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
                   END), 0) AS BIGINT) AS promo_rev,
                   CAST(coalesce(sum(
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
                   ), 0) AS BIGINT) AS total_rev
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
        """,
        "q15_top_supplier": """
            WITH rev AS (
                SELECT l_suppkey,
                       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (10000 - CAST(round(l_discount * 10000)
                                            AS BIGINT))) AS BIGINT)
                           AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
                GROUP BY 1)
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier JOIN rev ON s_suppkey = l_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
            ORDER BY s_suppkey
        """,
        "q17_small_qty": """
            WITH pb AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4'),
            lp AS (
                SELECT l_partkey,
                       CAST(round(l_quantity) AS BIGINT) AS qty,
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                           AS price_cents
                FROM lineitem JOIN pb ON l_partkey = p_partkey),
            ag AS (SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS cnt,
                          CAST(sum(qty) AS BIGINT) AS sum_qty
                   FROM lp GROUP BY 1)
            SELECT CAST(coalesce(sum(price_cents), 0) AS BIGINT)
                       AS revenue_cents
            FROM lp JOIN ag ON l_partkey = k
            WHERE 5 * qty * cnt < sum_qty
        """,
        "q18_volume_customers": """
            WITH po AS (
                SELECT l_orderkey,
                       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                           AS total_qty
                FROM lineitem GROUP BY 1
                HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 170)
            SELECT c_name, o_custkey, o_orderkey, o_orderdate, total_qty
            FROM po
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            ORDER BY total_qty DESC, o_orderkey
        """,
        "q22_idle_customers": """
            WITH s AS (
                SELECT CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                            AS BIGINT) AS sm
                FROM customer WHERE c_acctbal > 0.0)
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
                   CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                       AS totacctbal_cents
            FROM customer, s
            WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n > sm
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >=
                                    TIMESTAMP '2000-01-01 00:00:00')
            GROUP BY 1 ORDER BY 1
        """,
        "q11_important_parts": """
            WITH rs AS (SELECT s_suppkey FROM supplier
                        JOIN nation ON n_nationkey = s_nationkey
                        WHERE n_regionkey = 0),
            pv AS (SELECT l_partkey,
                          CAST(sum(CAST(round(l_extendedprice * 100)
                                        AS BIGINT)) AS BIGINT) AS value_cents
                   FROM lineitem
                   WHERE l_suppkey IN (SELECT s_suppkey FROM rs)
                   GROUP BY 1),
            tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS t,
                           CAST(count(*) AS BIGINT) AS n FROM pv)
            SELECT l_partkey, value_cents FROM pv, tot
            WHERE value_cents * n > 2 * t
            ORDER BY value_cents DESC, l_partkey
        """,
        "q20_dominant_suppliers": """
            WITH sq AS (
                SELECT l_partkey, l_suppkey,
                       CAST(sum(CAST(round(l_quantity) AS BIGINT))
                            AS BIGINT) AS q
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE p_name LIKE 'small %'
                  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                GROUP BY 1, 2),
            pt AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS tq
                   FROM sq GROUP BY 1)
            SELECT DISTINCT s_suppkey, s_name
            FROM sq JOIN pt USING (l_partkey)
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE 2 * q > tq
            ORDER BY s_suppkey
        """,
        "q21_waiting_suppliers": """
            WITH lo AS (
                SELECT l_orderkey, l_suppkey,
                       max(CASE WHEN l_shipdate >
                                     o_orderdate + INTERVAL 90 DAY
                                THEN 1 ELSE 0 END) AS late
                FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                WHERE o_orderstatus = 'F' GROUP BY 1, 2),
            per_order AS (
                SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp,
                       CAST(sum(late) AS BIGINT) AS n_late,
                       max(CASE WHEN late = 1 THEN l_suppkey END)
                           AS late_supp
                FROM lo GROUP BY 1)
            SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM per_order JOIN supplier ON s_suppkey = late_supp
            WHERE n_supp > 1 AND n_late = 1
            GROUP BY 1, 2 ORDER BY numwait DESC, s_name
        """,
        # lift_e6 = weight·N·10⁶ // (n_s·n_o): exact fixed-point, both
        # engines do truncating integer division on positive operands
        "kg_lift": f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            e AS (
                SELECT s.entity_id AS subj_id, t.pred,
                       o.entity_id AS obj_id,
                       CAST(COUNT(*) AS BIGINT) AS weight
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
                GROUP BY 1, 2, 3
            ),
            sw AS (SELECT subj_id, CAST(sum(weight) AS BIGINT) AS n_s
                   FROM e GROUP BY 1),
            ow AS (SELECT obj_id, CAST(sum(weight) AS BIGINT) AS n_o
                   FROM e GROUP BY 1),
            tot AS (SELECT CAST(sum(weight) AS BIGINT) AS n FROM e)
            SELECT e.subj_id, e.pred, e.obj_id, e.weight, sw.n_s, ow.n_o,
                   CAST((e.weight * tot.n * 1000000) // (sw.n_s * ow.n_o)
                        AS BIGINT) AS lift_e6
            FROM e
            JOIN sw USING (subj_id)
            JOIN ow USING (obj_id)
            CROSS JOIN tot
            ORDER BY lift_e6 DESC, e.subj_id, e.pred, e.obj_id
        """,
    }
    # incremental-fold invariant: same answer as the full recompute
    out["kg_validity_incremental"] = out["kg_validity"]
    from joint_entity_and_relation_extraction_ray.functions.sketch import (
        hll_estimate_num,
    )

    # fixed-point PageRank family (int64 parts-per-10¹² — bit-exact
    # mirrors of stages/graph.pagerank(fixed_point=True); see _pr_sql)
    out["kg_pagerank"] = _pr_sql()
    out["kg_pagerank_weighted"] = _pr_sql(weighted=True)
    out["kg_ppr"] = _pr_sql(ppr=True)
    out["kg_hits"] = _hits_sql()
    # iterative fixpoints with exact integer/string state: the recursion
    # carries the FULL state each round under an iteration cap matching
    # the engine's (extra rounds past the fixpoint are no-ops, so
    # cap-iteration state == engine's early-exit state).
    sym_prelude = f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            ep AS MATERIALIZED (
                SELECT s.entity_id AS s, o.entity_id AS o
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            und AS MATERIALIZED (
                SELECT DISTINCT least(s, o) AS a, greatest(s, o) AS b
                FROM ep WHERE s <> o
            ),
            sym AS MATERIALIZED (
                SELECT a AS src, b AS dst FROM und
                UNION ALL SELECT b, a FROM und
            ),
    """
    out["kg_labelprop"] = (
        sym_prelude
        + """
            lb(iter, node, label) AS (
                SELECT 0, src, src FROM (SELECT DISTINCT src FROM sym)
                UNION ALL
                SELECT w.it + 1, w.node, w.label FROM (
                    SELECT g.it, g.node, g.label,
                           ROW_NUMBER() OVER (PARTITION BY g.it, g.node
                                              ORDER BY g.n DESC, g.label
                           ) AS rn
                    FROM (
                        SELECT p.iter AS it, s.dst AS node, p.label,
                               COUNT(*) AS n
                        FROM lb p JOIN sym s ON s.src = p.node
                        GROUP BY p.iter, s.dst, p.label
                    ) g
                ) w WHERE w.rn = 1 AND w.it < 10
            )
            SELECT node, label FROM lb WHERE iter = 10
        """
    )
    out["kg_kcore"] = (
        sym_prelude
        + """
            ks(iter, src, dst) AS (
                SELECT 0, src, dst FROM sym
                UNION ALL
                SELECT w.it + 1, w.src, w.dst FROM (
                    SELECT p.iter AS it, p.src, p.dst,
                           COUNT(*) OVER (PARTITION BY p.iter, p.src)
                               AS dsrc,
                           COUNT(*) OVER (PARTITION BY p.iter, p.dst)
                               AS ddst
                    FROM ks p
                ) w WHERE w.it < 50 AND w.dsrc >= 2 AND w.ddst >= 2
            )
            SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM ks WHERE iter = 50 GROUP BY src
        """
    )
    # 3-truss: support peel — each round keeps edges in ≥1 triangle OF
    # THE CURRENT SUBGRAPH (support via the symmetric self-join on the
    # carried edge set), capped at the engine's 30 rounds.
    out["kg_ktruss"] = (
        sym_prelude
        + """
            kt(iter, a, b) AS (
                SELECT 0, a, b FROM und
                UNION ALL
                SELECT x.it + 1, x.a, x.b
                FROM (
                    SELECT p.iter AS it, p.a, p.b, s1.dst AS c
                    FROM kt p
                    JOIN (SELECT iter, a AS src, b AS dst FROM kt
                          UNION ALL SELECT iter, b, a FROM kt) s1
                      ON s1.iter = p.iter AND s1.src = p.a
                    JOIN (SELECT iter, a AS src, b AS dst FROM kt
                          UNION ALL SELECT iter, b, a FROM kt) s2
                      ON s2.iter = p.iter AND s2.src = p.b
                     AND s2.dst = s1.dst
                ) x
                WHERE x.it < 30
                GROUP BY x.it, x.a, x.b
                HAVING COUNT(*) >= 1
            )
            SELECT a, b FROM kt WHERE iter = 30
        """
    )
    # md5-60 HyperBall family: registers + estimates recomputed exactly
    # in SQL (see _hyperball_sql) — approximate ALGORITHMS, exact ORACLES
    out["kg_hyperball"] = _hyperball_sql("ball", hops=4)
    out["kg_neighborhood"] = _hyperball_sql("nf", hops=6)
    out["kg_harmonic"] = _hyperball_sql("harmonic", hops=4)
    out["kg_eff_diameter"] = _hyperball_sql("effdiam", hops=6)
    # Broder bow-tie: SCC via mutual reachability (the kg_scc oracle
    # core), core = largest SCC (ties → min id), IN/OUT = ≤30-hop
    # multi-source BFS from the core set (the engine's max_iters cap).
    out["kg_bowtie"] = f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            edges0 AS MATERIALIZED (
                SELECT DISTINCT s.entity_id AS src, o.entity_id AS dst
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            nodes AS MATERIALIZED (
                SELECT DISTINCT n FROM (
                    SELECT src AS n FROM edges0
                    UNION ALL SELECT dst FROM edges0)
            ),
            e AS MATERIALIZED (
                SELECT src, dst FROM edges0 WHERE src <> dst
            ),
            reach(src, dst) AS (
                SELECT src, dst FROM e
                UNION
                SELECT r.src, e.dst FROM reach r JOIN e ON e.src = r.dst
            ),
            mutual AS MATERIALIZED (
                SELECT a.src AS v, a.dst AS u
                FROM reach a JOIN reach b
                  ON a.src = b.dst AND a.dst = b.src
            ),
            scc AS MATERIALIZED (
                SELECT n.n AS node,
                       CASE WHEN min(m.u) IS NULL OR n.n < min(m.u)
                            THEN n.n ELSE min(m.u) END AS scc_id
                FROM nodes n LEFT JOIN mutual m ON m.v = n.n
                GROUP BY n.n
            ),
            sizes AS (
                SELECT scc_id, COUNT(*) AS n FROM scc GROUP BY scc_id
            ),
            core_id AS (
                SELECT MIN(scc_id) AS cid FROM sizes
                WHERE n = (SELECT MAX(n) FROM sizes)
            ),
            core AS MATERIALIZED (
                SELECT node FROM scc WHERE scc_id = (SELECT cid FROM core_id)
            ),
            fwd(w, d) AS (
                SELECT node, 0 FROM core
                UNION
                SELECT e.dst, f.d + 1 FROM fwd f JOIN e ON e.src = f.w
                WHERE f.d < 30
            ),
            bwd(w, d) AS (
                SELECT node, 0 FROM core
                UNION
                SELECT e.src, f.d + 1 FROM bwd f JOIN e ON e.dst = f.w
                WHERE f.d < 30
            ),
            n_core AS (SELECT COUNT(*) AS c FROM core),
            n_out AS (
                SELECT COUNT(DISTINCT w) AS c FROM fwd
                WHERE w NOT IN (SELECT node FROM core)
            ),
            n_in AS (
                SELECT COUNT(DISTINCT w) AS c FROM bwd
                WHERE w NOT IN (SELECT node FROM core)
            ),
            n_tot AS (SELECT COUNT(*) AS c FROM scc)
            SELECT cls, CAST(n_nodes AS BIGINT) AS n_nodes FROM (
                SELECT 'core' AS cls, (SELECT c FROM n_core) AS n_nodes
                UNION ALL
                SELECT 'in', (SELECT c FROM n_in)
                UNION ALL
                SELECT 'out', (SELECT c FROM n_out)
                UNION ALL
                SELECT 'other', (SELECT c FROM n_tot)
                                - (SELECT c FROM n_core)
                                - (SELECT c FROM n_in)
                                - (SELECT c FROM n_out)
            )
        """
    # corrupt-tail negatives: md5-60 draw over the rank-ordered entity
    # universe, self-corruptions and true edges removed, distinct —
    # replays stages/graph.negative_samples(k=2, seed=13) exactly
    out["kg_negatives"] = f"""
            WITH best AS (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            pos AS MATERIALIZED (
                SELECT DISTINCT s.entity_id AS subj_id, t.pred,
                                o.entity_id AS obj_id
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
            ),
            uni AS MATERIALIZED (
                SELECT n, ROW_NUMBER() OVER (ORDER BY n) - 1 AS r
                FROM (
                    SELECT DISTINCT n FROM (
                        SELECT subj_id AS n FROM pos
                        UNION ALL SELECT obj_id FROM pos)
                )
            ),
            nc AS (SELECT COUNT(*) AS c FROM uni),
            cand AS (
                SELECT p.subj_id, p.pred, u.n AS obj_id
                FROM pos p
                CROSS JOIN (SELECT unnest(range(2)) AS i) ii
                CROSS JOIN nc
                JOIN uni u
                  ON u.r = ('0x' || substr(md5(
                               p.subj_id || chr(31) || '13' || chr(31)
                               || CAST(ii.i AS VARCHAR) || chr(31)
                               || p.pred || p.obj_id), 1, 15))::BIGINT
                           % nc.c
                WHERE u.n <> p.subj_id
            )
            SELECT DISTINCT c.subj_id, c.pred, c.obj_id
            FROM cand c
            WHERE NOT EXISTS (
                SELECT 1 FROM pos p2
                WHERE p2.subj_id = c.subj_id AND p2.pred = c.pred
                  AND p2.obj_id = c.obj_id)
        """
    # TF-IDF top-5: score = tf · ln(n_docs/df). ln is deterministic here
    # — DuckDB's ln, polars' .log() and CPython's math.log all call the
    # same libm on this platform (bitwise-verified over the full (tf,df)
    # range in round 4), and ties break on the term string.
    out["tfidf"] = """
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(text, '\\S+')) AS term
                FROM documents
            ),
            tf AS (
                SELECT doc_id, term, COUNT(*) AS tf
                FROM tok GROUP BY 1, 2
            ),
            dfx AS (
                SELECT term, COUNT(DISTINCT doc_id) AS df
                FROM tok GROUP BY 1
            ),
            nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
            scored AS (
                SELECT t.doc_id, t.term, t.tf, d.df,
                       t.tf * ln((SELECT n FROM nd) / d.df) AS score
                FROM tf t JOIN dfx d USING (term)
            ),
            top AS (
                SELECT doc_id,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, term)
                           AS rank,
                       term, tf, df, score
                FROM scored
            )
            SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
                   CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
                   score
            FROM top WHERE rank <= 5
        """
    # Sampled Brandes betweenness in int64 micro-units: forward pass =
    # bounded-hop walk counting (σ = walks at min dist); backward pass
    # UNROLLED per level (≤6) with the engine's exact integer floors
    # floor(σ_v·(scale+δ_w)/σ_w); one true division at the very end.
    def _betweenness_sql(
        scale: int = 10**6, hops: int = 6, n_sources: int = 8
    ) -> str:
        head = f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (PARTITION BY alias, ent_type
                                              ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')) WHERE rn = 1),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type),
            ep AS MATERIALIZED (
                SELECT s.entity_id AS s, o.entity_id AS o
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id),
            und AS MATERIALIZED (
                SELECT DISTINCT least(s, o) AS a, greatest(s, o) AS b
                FROM ep WHERE s <> o),
            sym AS MATERIALIZED (
                SELECT a AS src, b AS dst FROM und
                UNION ALL SELECT b, a FROM und),
            srcs AS MATERIALIZED (
                SELECT src FROM (SELECT DISTINCT src FROM sym)
                ORDER BY ('0x' || substr(md5(CAST(src AS VARCHAR)), 1, 15))
                             ::BIGINT,
                         src
                LIMIT {n_sources}),
            walks(it, s, v, n) AS (
                SELECT 0, src, src, 1::BIGINT FROM srcs
                UNION ALL
                SELECT x.it + 1, x.s, x.v, SUM(x.n)
                FROM (
                    SELECT p.it AS it, p.s, e.dst AS v, p.n
                    FROM walks p JOIN sym e ON e.src = p.v
                ) x
                WHERE x.it < {hops}
                GROUP BY x.it, x.s, x.v
            ),
            lvl AS MATERIALIZED (
                SELECT s, v, MIN(it) AS dist FROM walks GROUP BY s, v),
            sig AS MATERIALIZED (
                SELECT w.s, w.v, l.dist, SUM(w.n) AS sigma
                FROM walks w
                JOIN lvl l ON l.s = w.s AND l.v = w.v AND w.it = l.dist
                GROUP BY 1, 2, 3),
            d{hops} AS (SELECT s, v, sigma, 0::BIGINT AS delta
                        FROM sig WHERE dist = {hops})"""
        parts = [head]
        for d in range(hops - 1, 0, -1):
            parts.append(f""",
            c{d} AS (
                SELECT gq.s, gq.v,
                       SUM((gq.sigma * ({scale} + w.delta)) // w.sigma)
                           AS dsum
                FROM sig gq
                JOIN sym e ON e.src = gq.v
                JOIN d{d + 1} w ON w.s = gq.s AND w.v = e.dst
                WHERE gq.dist = {d}
                GROUP BY 1, 2),
            d{d} AS (
                SELECT gq.s, gq.v, gq.sigma, COALESCE(c.dsum, 0) AS delta
                FROM sig gq LEFT JOIN c{d} c ON c.s = gq.s AND c.v = gq.v
                WHERE gq.dist = {d})""")
        unions = "\n                UNION ALL\n".join(
            f"                SELECT s, v, dsum FROM c{d}"
            for d in range(1, hops)
        )
        parts.append(f""",
            allc AS (
{unions})
            SELECT v AS node,
                   CAST(SUM(dsum) AS DOUBLE) / {float(scale)!r}
                       AS betweenness
            FROM allc GROUP BY v
        """)
        return "".join(parts)

    out["kg_betweenness"] = _betweenness_sql()
    # Minimum spanning forest: Kruskal SIMULATED over the strict total
    # order (cost, u|v) — one recursive step per edge rank carrying the
    # component labels; under a strict total order Kruskal's forest is
    # unique and equals the engine's Borůvka (the pytest already pins
    # exactly this equivalence in-process).
    out["kg_mst"] = f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (PARTITION BY alias, ent_type
                                              ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')) WHERE rn = 1),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type),
            ed AS MATERIALIZED (
                SELECT s.entity_id AS src, o.entity_id AS dst,
                       COUNT(*) AS w
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
                GROUP BY s.entity_id, t.pred, o.entity_id),
            re AS MATERIALIZED (
                SELECT a, b, w,
                       ROW_NUMBER() OVER (ORDER BY w, a || '|' || b) AS r
                FROM (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                             w
                      FROM ed WHERE src <> dst)),
            nds AS MATERIALIZED (
                SELECT DISTINCT n FROM (
                    SELECT a AS n FROM re UNION ALL SELECT b FROM re)),
            ks(r, kind, node, comp, a, b, w) AS (
                SELECT 0, 0, n, n, CAST(NULL AS VARCHAR),
                       CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
                FROM nds
                UNION ALL
                (
                WITH cur AS (SELECT * FROM ks),
                er AS (SELECT e.a, e.b, e.w FROM re e
                       WHERE e.r = (SELECT MAX(r) FROM cur) + 1),
                cab AS (
                    SELECT er.a, er.b, er.w,
                           (SELECT comp FROM cur
                            WHERE kind = 0 AND node = er.a) AS ca,
                           (SELECT comp FROM cur
                            WHERE kind = 0 AND node = er.b) AS cb
                    FROM er)
                SELECT (SELECT MAX(r) FROM cur) + 1, 0, c.node,
                       CASE WHEN cab.ca <> cab.cb
                             AND c.comp IN (cab.ca, cab.cb)
                            THEN least(cab.ca, cab.cb) ELSE c.comp END,
                       NULL, NULL, NULL
                FROM cur c CROSS JOIN cab WHERE c.kind = 0
                UNION ALL
                SELECT (SELECT MAX(r) FROM cur) + 1, 1, NULL, NULL,
                       cab.a, cab.b, cab.w
                FROM cab WHERE cab.ca <> cab.cb
                )
            )
            SELECT a AS u, b AS v, CAST(w AS BIGINT) AS cost
            FROM ks WHERE kind = 1
        """

    # Hyperplane-LSH near-dup: md5-derived ±1 planes over int64-
    # quantized coords make every signature bit the sign of an INTEGER
    # dot, and the cosine verification is the cross-multiplied integer
    # rule (threshold 0.45 = 9/20) — candidate set AND verification
    # replayed exactly (dedup.embedding_dup_pairs_lsh, r4).
    out["dedup_embedding_lsh"] = """
            WITH eq AS MATERIALIZED (
                SELECT vec_id,
                       unnest(range(1, len(embedding) + 1)) AS dim,
                       CAST(floor(unnest(embedding) * 1000.0 + 0.5)
                            AS BIGINT) AS x
                FROM embeddings),
            pl AS MATERIALIZED (
                SELECT c.col, d.dim,
                       CASE WHEN ('0x' || substr(md5(
                                '11:' || CAST(c.col AS VARCHAR) || ':'
                                      || CAST(d.dim - 1 AS VARCHAR)),
                                1, 15))::BIGINT % 2 = 0
                            THEN 1 ELSE -1 END AS s
                FROM (SELECT unnest(range(192)) AS col) c
                CROSS JOIN (SELECT DISTINCT dim FROM eq) d),
            sig AS MATERIALIZED (
                SELECT e.vec_id, p.col,
                       CASE WHEN SUM(e.x * p.s) > 0 THEN 1 ELSE 0 END
                           AS bit
                FROM eq e JOIN pl p ON p.dim = e.dim
                GROUP BY 1, 2),
            keys AS MATERIALIZED (
                SELECT vec_id,
                       SUM(bit << (col % 6)) + ((col // 6) << 6)
                           AS bucket
                FROM sig GROUP BY vec_id, col // 6),
            cand AS MATERIALIZED (
                SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
                FROM keys a JOIN keys b
                  ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
            n2 AS MATERIALIZED (
                SELECT vec_id, SUM(x * x) AS n2 FROM eq GROUP BY 1),
            dots AS (
                SELECT c.va, c.vb, SUM(ea.x * eb.x) AS dot
                FROM cand c
                JOIN eq ea ON ea.vec_id = c.va
                JOIN eq eb ON eb.vec_id = c.vb AND eb.dim = ea.dim
                GROUP BY 1, 2)
            SELECT d.va AS vec_a, d.vb AS vec_b
            FROM dots d
            JOIN n2 a ON a.vec_id = d.va
            JOIN n2 b ON b.vec_id = d.vb
            WHERE a.n2 > 0 AND b.n2 > 0 AND d.dot >= 0
              AND 400 * d.dot * d.dot >= 81 * a.n2 * b.n2
        """
    # IVF ANN + its recall monitor: the md5-60 sample/seed ordering
    # makes centroids, bucket layout and probe sets SQL-computable;
    # float cosine ranking recomputes via list_cosine_similarity with
    # integer-only outputs (the ann_topk precedent — stable ranks, nid
    # tie-breaks, no float column ever hashed).
    _ivf_core = """
            q AS MATERIALIZED (
                SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id < 10),
            nt AS (SELECT COUNT(*) AS n FROM embeddings),
            md AS (SELECT GREATEST(1, n // 128) AS m FROM nt),
            samp AS MATERIALIZED (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings, md
                WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
                                      1, 15))::BIGINT % md.m = 0),
            cent AS MATERIALIZED (
                SELECT e, rn - 1 AS cid FROM (
                    SELECT e,
                           ROW_NUMBER() OVER (
                               ORDER BY ('0x' || substr(
                                   md5('13:' || CAST(vec_id AS VARCHAR)),
                                   1, 15))::BIGINT) AS rn
                    FROM samp)
                WHERE rn <= 16),
            assign AS MATERIALIZED (
                SELECT vec_id, cid FROM (
                    SELECT v.vec_id, c.cid,
                           ROW_NUMBER() OVER (
                               PARTITION BY v.vec_id
                               ORDER BY list_cosine_similarity(
                                   CAST(v.embedding AS DOUBLE[]),
                                   c.e) DESC, c.cid) AS rn
                    FROM embeddings v CROSS JOIN cent c)
                WHERE rn = 1),
            probe AS MATERIALIZED (
                SELECT qid, cid FROM (
                    SELECT q.qid, c.cid,
                           ROW_NUMBER() OVER (
                               PARTITION BY q.qid
                               ORDER BY list_cosine_similarity(q.qe, c.e)
                                        DESC, c.cid) AS rn
                    FROM q CROSS JOIN cent c)
                WHERE rn <= 4),
            ivf AS MATERIALIZED (
                SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
                    SELECT s.qid, s.nid,
                           ROW_NUMBER() OVER (
                               PARTITION BY s.qid
                               ORDER BY s.c DESC, s.nid) AS rank
                    FROM (
                        SELECT q.qid, v.vec_id AS nid,
                               list_cosine_similarity(
                                   q.qe, CAST(v.embedding AS DOUBLE[]))
                                   AS c
                        FROM q
                        JOIN probe p ON p.qid = q.qid
                        JOIN assign a ON a.cid = p.cid
                        JOIN embeddings v ON v.vec_id = a.vec_id
                        WHERE v.vec_id <> q.qid) s)
                WHERE rank <= 5)
    """
    out["ann_topk_ivf"] = (
        "WITH"
        + _ivf_core
        + """
            SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
            FROM ivf
        """
    )
    out["ann_recall"] = (
        "WITH"
        + _ivf_core
        + """,
            exact AS (
                SELECT qid AS query_id, nid AS neighbor_id FROM (
                    SELECT q.qid, e.vec_id AS nid,
                           ROW_NUMBER() OVER (
                               PARTITION BY q.qid
                               ORDER BY list_cosine_similarity(
                                   q.qe, CAST(e.embedding AS DOUBLE[]))
                                        DESC, e.vec_id) AS rank
                    FROM q JOIN embeddings e ON e.vec_id <> q.qid)
                WHERE rank <= 5),
            hits AS (
                SELECT e.query_id, COUNT(*) AS n_hits
                FROM exact e JOIN ivf i
                  ON i.query_id = e.query_id
                 AND i.neighbor_id = e.neighbor_id
                GROUP BY 1)
            SELECT e.query_id,
                   CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM exact e LEFT JOIN hits h USING (query_id)
            GROUP BY e.query_id, h.n_hits
        """
    )

    # Exact-arithmetic Lloyd's k-means (similarity.kmeans_fixed_
    # assignments): rational (Σ, n) centroids, cross-multiplied HUGEINT
    # nearest-centroid compares, md5-60 seeding; rounds unrolled.
    def _kmeans_sql(k: int = 4, iters: int = 3, quant: int = 10**6) -> str:
        parts = [f"""
            WITH eq AS MATERIALIZED (
                SELECT vec_id,
                       unnest(range(1, len(embedding) + 1)) AS dim,
                       CAST(floor(unnest(embedding) * {float(quant)!r}
                                  + 0.5) AS BIGINT) AS x
                FROM embeddings),
            sd AS MATERIALIZED (
                SELECT vec_id, rn - 1 AS cl FROM (
                    SELECT vec_id,
                           ROW_NUMBER() OVER (
                               ORDER BY ('0x' || substr(
                                   md5(CAST(vec_id AS VARCHAR)),
                                   1, 15))::BIGINT) AS rn
                    FROM (SELECT DISTINCT vec_id FROM embeddings))
                WHERE rn <= {k}),
            s0 AS (SELECT sd.cl, e.dim, e.x AS s
                   FROM sd JOIN eq e USING (vec_id)),
            n0 AS (SELECT cl, 1::BIGINT AS n FROM sd)"""]
        for t in range(1, iters + 2):
            p = t - 1
            parts.append(f""",
            d{t} AS MATERIALIZED (
                SELECT e.vec_id, s.cl, n.n,
                       SUM(CAST(n.n * e.x - s.s AS HUGEINT)
                           * (n.n * e.x - s.s)) AS dist
                FROM eq e
                JOIN s{p} s ON s.dim = e.dim
                JOIN n{p} n ON n.cl = s.cl
                GROUP BY 1, 2, 3),
            a{t} AS MATERIALIZED (
                SELECT d1.vec_id, MIN(d1.cl) AS cl
                FROM d{t} d1
                WHERE NOT EXISTS (
                    SELECT 1 FROM d{t} d2
                    WHERE d2.vec_id = d1.vec_id AND (
                        d2.dist * d1.n * d1.n < d1.dist * d2.n * d2.n
                        OR (d2.dist * d1.n * d1.n
                            = d1.dist * d2.n * d2.n
                            AND d2.cl < d1.cl)))
                GROUP BY 1)""")
            if t <= iters:
                parts.append(f""",
            nn{t} AS (SELECT cl, COUNT(*) AS n FROM a{t} GROUP BY 1),
            ss{t} AS (SELECT a.cl, e.dim, SUM(e.x) AS s
                      FROM a{t} a JOIN eq e USING (vec_id)
                      GROUP BY 1, 2),
            n{t} AS (SELECT p.cl, COALESCE(x.n, p.n) AS n
                     FROM n{p} p LEFT JOIN nn{t} x USING (cl)),
            s{t} AS (SELECT p.cl, p.dim, COALESCE(y.s, p.s) AS s
                     FROM s{p} p LEFT JOIN ss{t} y
                       ON y.cl = p.cl AND y.dim = p.dim)""")
        parts.append(f"""
            SELECT vec_id, CAST(cl AS BIGINT) AS cluster
            FROM a{iters + 1}
        """)
        return "".join(parts)

    out["embed_kmeans"] = _kmeans_sql()

    # EXACT-integer product quantization (VERDICT r4 #3, r5): the
    # per-subspace Lloyd's is the _kmeans_sql unroll with a `sub`
    # grouping dimension (sub = (dim-1)//dsub); the ADC lookup table is
    # the floored common-scale integer (A*scale)//n² (HUGEINT `//` ==
    # the engine's Python floor division on the same non-negative
    # ints), a vector's score is the sum of its m code lookups, and
    # ranking is (score asc, neighbor_id asc) minus self — replaying
    # stages/similarity.pq_train_exact/pq_encode_exact/pq_ann_topk_exact
    # move for move.
    def _pq_sql(
        kind: str,
        k: int = 5,
        m: int = 32,
        ksub: int = 32,
        iters: int = 4,
        quant: int = 10**6,
        scale: int = 10**3,
        n_queries: int = 10,
    ) -> str:
        parts = [f"""
            WITH eq AS MATERIALIZED (
                SELECT vec_id, dim, (dim - 1) // (len_d // {m}) AS sub, x
                FROM (
                    SELECT vec_id,
                           unnest(range(1, len(embedding) + 1)) AS dim,
                           CAST(floor(unnest(embedding) * {float(quant)!r}
                                      + 0.5) AS BIGINT) AS x,
                           len(embedding) AS len_d
                    FROM embeddings)),
            sd AS MATERIALIZED (
                SELECT vec_id, rn - 1 AS cl FROM (
                    SELECT vec_id,
                           ROW_NUMBER() OVER (
                               ORDER BY ('0x' || substr(
                                   md5(CAST(vec_id AS VARCHAR)),
                                   1, 15))::BIGINT, vec_id) AS rn
                    FROM (SELECT DISTINCT vec_id FROM embeddings))
                WHERE rn <= {ksub}),
            s0 AS (SELECT sd.cl, e.sub, e.dim, e.x AS s
                   FROM sd JOIN eq e USING (vec_id)),
            n0 AS (SELECT sd.cl, u.sub, 1::BIGINT AS n
                   FROM sd CROSS JOIN (SELECT DISTINCT sub FROM eq) u)"""]
        for t in range(1, iters + 2):
            p = t - 1
            parts.append(f""",
            d{t} AS MATERIALIZED (
                SELECT e.vec_id, s.sub, s.cl, n.n,
                       SUM(CAST(n.n * e.x - s.s AS HUGEINT)
                           * (n.n * e.x - s.s)) AS dist
                FROM eq e
                JOIN s{p} s ON s.dim = e.dim
                JOIN n{p} n ON n.cl = s.cl AND n.sub = s.sub
                GROUP BY 1, 2, 3, 4),
            a{t} AS MATERIALIZED (
                SELECT d1.vec_id, d1.sub, MIN(d1.cl) AS cl
                FROM d{t} d1
                WHERE NOT EXISTS (
                    SELECT 1 FROM d{t} d2
                    WHERE d2.vec_id = d1.vec_id AND d2.sub = d1.sub
                      AND (
                        d2.dist * d1.n * d1.n < d1.dist * d2.n * d2.n
                        OR (d2.dist * d1.n * d1.n
                            = d1.dist * d2.n * d2.n
                            AND d2.cl < d1.cl)))
                GROUP BY 1, 2)""")
            if t <= iters:
                parts.append(f""",
            nn{t} AS (SELECT sub, cl, COUNT(*) AS n
                      FROM a{t} GROUP BY 1, 2),
            ss{t} AS (SELECT a.sub, a.cl, e.dim, SUM(e.x) AS s
                      FROM a{t} a
                      JOIN eq e ON e.vec_id = a.vec_id
                                AND e.sub = a.sub
                      GROUP BY 1, 2, 3),
            n{t} AS (SELECT p.cl, p.sub, COALESCE(x.n, p.n) AS n
                     FROM n{p} p LEFT JOIN nn{t} x
                       ON x.sub = p.sub AND x.cl = p.cl),
            s{t} AS (SELECT p.cl, p.sub, p.dim, COALESCE(y.s, p.s) AS s
                     FROM s{p} p LEFT JOIN ss{t} y
                       ON y.sub = p.sub AND y.cl = p.cl
                      AND y.dim = p.dim)""")
        fin = iters
        parts.append(f""",
            qe AS MATERIALIZED (
                SELECT * FROM eq WHERE vec_id < {n_queries}),
            lA AS (
                SELECT q.vec_id AS qid, s.sub, s.cl, n.n,
                       SUM(CAST(n.n * q.x - s.s AS HUGEINT)
                           * (n.n * q.x - s.s)) AS A
                FROM qe q
                JOIN s{fin} s ON s.dim = q.dim
                JOIN n{fin} n ON n.cl = s.cl AND n.sub = s.sub
                GROUP BY 1, 2, 3, 4),
            lut AS (SELECT qid, sub, cl,
                           (A * {scale}) // (n * n) AS l
                    FROM lA),
            sc AS (
                SELECT l.qid, c.vec_id AS nid, SUM(l.l) AS score
                FROM a{iters + 1} c
                JOIN lut l ON l.sub = c.sub AND l.cl = c.cl
                GROUP BY 1, 2),
            pqk AS (
                SELECT qid AS query_id, nid AS neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY score, nid) AS rank
                FROM sc WHERE nid <> qid
                QUALIFY rank <= {k})""")
        if kind == "topk":
            parts.append("""
            SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
            FROM pqk
        """)
        else:
            parts.append(f""",
            exd AS (
                SELECT q.vec_id AS qid, e.vec_id AS nid,
                       SUM(CAST(q.x - e.x AS HUGEINT) * (q.x - e.x)) AS d
                FROM qe q JOIN eq e ON e.dim = q.dim
                WHERE e.vec_id <> q.vec_id
                GROUP BY 1, 2),
            exk AS (
                SELECT qid, nid,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY d, nid) AS rnk
                FROM exd QUALIFY rnk <= {k}),
            hits AS (
                SELECT e.qid, COUNT(*) AS h
                FROM exk e JOIN pqk p ON p.query_id = e.qid
                                      AND p.neighbor_id = e.nid
                GROUP BY 1)
            SELECT q.qid AS query_id,
                   CAST(COALESCE(h.h, 0) AS BIGINT) AS n_hits,
                   CAST({k} AS BIGINT) AS k
            FROM (SELECT DISTINCT vec_id AS qid FROM qe) q
            LEFT JOIN hits h USING (qid)
        """)
        return "".join(parts)

    out["pq_topk"] = _pq_sql("topk")
    out["pq_recall"] = _pq_sql("recall")

    # BPE fit SIMULATED (curation._bpe_learn, Sennrich-style): one
    # recursive step per merge round carries the tokenized vocabulary;
    # the best pair is argmax(count desc, pair lex asc); left-to-right
    # non-overlapping replacement is the run-parity rule (overlap chains
    # exist only when left == right, and the Python loop merges the
    # even offsets of each run).
    def _bpe_fit_sql(num_merges: int) -> str:
        return f"""
            WITH RECURSIVE wf AS MATERIALIZED (
                SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
                    SELECT unnest(regexp_extract_all(text, '\\S+')) AS word
                    FROM documents)
                GROUP BY word),
            init AS MATERIALIZED (
                SELECT word,
                       unnest(range(1, len(string_split(word, '')) + 2))
                           AS pos,
                       unnest(list_append(string_split(word, ''), '</w>'))
                           AS sym
                FROM wf),
            st(it, kind, word, pos, sym, cnt) AS (
                SELECT 0, 0, word, pos, sym, CAST(NULL AS BIGINT)
                FROM init
                UNION ALL
                (
                WITH cur AS (SELECT * FROM st),
                bp AS (
                    SELECT s1.it, s1.sym AS a, s2.sym AS b, SUM(f.n) AS cnt
                    FROM cur s1
                    JOIN cur s2 ON s2.word = s1.word
                               AND s2.pos = s1.pos + 1 AND s2.kind = 0
                    JOIN wf f ON f.word = s1.word
                    WHERE s1.kind = 0 AND s1.it < {num_merges}
                    GROUP BY 1, 2, 3
                    ORDER BY cnt DESC, a, b
                    LIMIT 1),
                mt AS (
                    SELECT s1.word, s1.pos
                    FROM cur s1
                    JOIN cur s2 ON s2.word = s1.word
                               AND s2.pos = s1.pos + 1 AND s2.kind = 0
                    CROSS JOIN bp
                    WHERE s1.kind = 0 AND s1.sym = bp.a
                      AND s2.sym = bp.b),
                runs AS (
                    SELECT word, pos,
                           pos - ROW_NUMBER() OVER (PARTITION BY word
                                                    ORDER BY pos) AS grp
                    FROM mt),
                merged AS (
                    SELECT word, pos FROM (
                        SELECT word, pos,
                               pos - MIN(pos) OVER (PARTITION BY word,
                                                    grp) AS off
                        FROM runs)
                    WHERE off % 2 = 0),
                newtok AS (
                    SELECT c.word, c.pos AS oldpos,
                           CASE WHEN m.pos IS NOT NULL
                                THEN c.sym || bp.b ELSE c.sym END AS sym
                    FROM cur c
                    CROSS JOIN bp
                    LEFT JOIN merged m ON m.word = c.word
                                      AND m.pos = c.pos
                    WHERE c.kind = 0
                      AND NOT EXISTS (SELECT 1 FROM merged x
                                      WHERE x.word = c.word
                                        AND x.pos = c.pos - 1))
                SELECT bp.it + 1, 0, n.word,
                       ROW_NUMBER() OVER (PARTITION BY n.word
                                          ORDER BY n.oldpos),
                       n.sym, NULL
                FROM newtok n CROSS JOIN bp
                UNION ALL
                SELECT bp.it + 1, 1, bp.a, NULL, bp.b, bp.cnt FROM bp
                )
            )"""

    out["bpe_merges"] = (
        _bpe_fit_sql(24)
        + """
            SELECT CAST(it - 1 AS BIGINT) AS rank, word AS "left",
                   sym AS "right", cnt AS pair_count
            FROM st WHERE kind = 1
        """
    )
    # BPE encode SIMULATED: a second recursion re-tokenizes the
    # vocabulary against the learned table — each round every word
    # applies its lowest-rank (then leftmost) applicable merge, until
    # no word has one; per-doc subword counts come from the word
    # multiset join.
    out["bpe_encode"] = (
        _bpe_fit_sql(24)
        + """,
            mg AS MATERIALIZED (
                SELECT CAST(it - 1 AS BIGINT) AS rank, word AS a,
                       sym AS b
                FROM st WHERE kind = 1),
            enc(it, word, pos, sym) AS (
                SELECT 0, word, pos, sym FROM init
                UNION ALL
                (
                WITH cur AS (SELECT * FROM enc),
                cand AS (
                    SELECT s1.word, s1.pos, m.rank
                    FROM cur s1
                    JOIN cur s2 ON s2.word = s1.word
                               AND s2.pos = s1.pos + 1
                    JOIN mg m ON m.a = s1.sym AND m.b = s2.sym),
                pick AS (
                    SELECT word, pos FROM (
                        SELECT word, pos,
                               ROW_NUMBER() OVER (PARTITION BY word
                                                  ORDER BY rank, pos)
                                   AS rn
                        FROM cand) WHERE rn = 1),
                nxt AS (
                    SELECT c.word, c.pos AS oldpos,
                           CASE WHEN p.pos IS NOT NULL
                                THEN c.sym ||
                                     (SELECT s2.sym FROM cur s2
                                      WHERE s2.word = c.word
                                        AND s2.pos = c.pos + 1)
                                ELSE c.sym END AS sym
                    FROM cur c
                    LEFT JOIN pick p ON p.word = c.word
                                    AND p.pos = c.pos
                    WHERE NOT EXISTS (SELECT 1 FROM pick x
                                      WHERE x.word = c.word
                                        AND x.pos = c.pos - 1))
                SELECT (SELECT MAX(it) FROM cur) + 1, n.word,
                       ROW_NUMBER() OVER (PARTITION BY n.word
                                          ORDER BY n.oldpos),
                       n.sym
                FROM nxt n
                WHERE EXISTS (SELECT 1 FROM cand)
                )
            ),
            fin AS (
                SELECT word, CAST(COUNT(*) AS BIGINT) AS n_sub
                FROM enc WHERE it = (SELECT MAX(it) FROM enc)
                GROUP BY word),
            docw AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(text, '\\S+')) AS word
                FROM documents)
            SELECT d.doc_id,
                   CAST(COALESCE(SUM(f.n_sub), 0) AS BIGINT)
                       AS n_subwords
            FROM (SELECT doc_id FROM documents) d
            LEFT JOIN docw w ON w.doc_id = d.doc_id
            LEFT JOIN fin f ON f.word = w.word
            GROUP BY d.doc_id
        """
    )
    # FFD sequence packing SIMULATED: items ranked per md5-60 bucket
    # (n_tokens desc, id asc); one recursive step per rank carries the
    # open-bin rooms and emits the chosen bin — the greedy loop replayed
    # move-for-move (stages/packing.pack_sequences, budget=512, 16
    # buckets; over-budget docs close their bin with room -1).
    out["pack_sequences"] = """
            WITH RECURSIVE items AS MATERIALIZED (
                SELECT doc_id, n_tokens,
                       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                       1, 15))::BIGINT % 16 AS bucket,
                       ROW_NUMBER() OVER (
                           PARTITION BY ('0x' || substr(
                               md5(CAST(doc_id AS VARCHAR)),
                               1, 15))::BIGINT % 16
                           ORDER BY n_tokens DESC, doc_id) AS rk
                FROM (
                    SELECT doc_id,
                           CAST(len(regexp_extract_all(text, '\\S+'))
                                AS BIGINT) AS n_tokens
                    FROM documents)
            ),
            ffd(it, bucket, kind, bin, room, doc_id, n_tokens) AS (
                SELECT 0, bucket, -1, CAST(NULL AS BIGINT),
                       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                       CAST(NULL AS BIGINT)
                FROM (SELECT DISTINCT bucket FROM items)
                UNION ALL
                (
                SELECT p.it + 1, p.bucket, 0, p.bin,
                       p.room - CASE WHEN p.bin = (
                           SELECT MIN(b.bin) FROM ffd b
                           WHERE b.kind = 0 AND b.bucket = p.bucket
                             AND b.room >= i.n_tokens)
                           THEN i.n_tokens ELSE 0 END,
                       NULL, NULL
                FROM ffd p
                JOIN items i ON i.bucket = p.bucket AND i.rk = p.it + 1
                WHERE p.kind = 0
                UNION ALL
                SELECT p0.it + 1, i.bucket, 0,
                       COALESCE((SELECT MAX(b.bin) + 1 FROM ffd b
                                 WHERE b.kind = 0
                                   AND b.bucket = i.bucket), 0),
                       CASE WHEN i.n_tokens <= 512
                            THEN 512 - i.n_tokens ELSE -1 END,
                       NULL, NULL
                FROM (SELECT DISTINCT it, bucket FROM ffd) p0
                JOIN items i ON i.bucket = p0.bucket AND i.rk = p0.it + 1
                WHERE NOT EXISTS (
                    SELECT 1 FROM ffd b
                    WHERE b.kind = 0 AND b.bucket = i.bucket
                      AND b.room >= i.n_tokens)
                UNION ALL
                SELECT p0.it + 1, i.bucket, 1,
                       COALESCE(
                           (SELECT MIN(b.bin) FROM ffd b
                            WHERE b.kind = 0 AND b.bucket = i.bucket
                              AND b.room >= i.n_tokens),
                           COALESCE((SELECT MAX(b.bin) + 1 FROM ffd b
                                     WHERE b.kind = 0
                                       AND b.bucket = i.bucket), 0)),
                       NULL, i.doc_id, i.n_tokens
                FROM (SELECT DISTINCT it, bucket FROM ffd) p0
                JOIN items i ON i.bucket = p0.bucket AND i.rk = p0.it + 1
                )
            )
            SELECT doc_id, n_tokens,
                   CAST(bucket AS VARCHAR) || ':'
                     || CAST(bin AS VARCHAR) AS shard_id
            FROM ffd WHERE kind = 1
        """
    # Bloom decontamination, replayed EXACTLY (false positives and all):
    # m derives from the md5-60 HLL estimate of the bench gram count
    # (layout-independent by construction), bit positions are md5
    # double-hash ((h1%m) + i·(h2%m)) % m with k=11, and a corpus gram
    # "hits" iff all k positions are set — curation.decontaminate_bloom
    out["decontaminate_bloom"] = f"""
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS t
                FROM documents),
            grams AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(1, len(t) - 6),
                           i -> t[i]   || ' ' || t[i+1] || ' ' || t[i+2]
                             || ' ' || t[i+3] || ' ' || t[i+4] || ' ' || t[i+5]
                             || ' ' || t[i+6] || ' ' || t[i+7]))) AS g
                FROM toks WHERE len(t) >= 8),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0),
            sing AS (
                SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
                FROM bench),
            regs AS (
                SELECT h >> 48 AS idx,
                       MAX(CASE WHEN (h & 281474976710655) = 0 THEN 49
                                ELSE 49 - length(bin(h & 281474976710655))
                           END) AS reg
                FROM sing GROUP BY 1),
            agg AS (
                SELECT SUM(1::BIGINT << (49 - reg))
                         + (4096 - COUNT(*)) * (1::BIGINT << 49) AS s,
                       4096 - COUNT(*) AS zeros
                FROM regs),
            nest AS (
                SELECT GREATEST(1, CAST(floor(
                           (CASE WHEN {repr(hll_estimate_num(12))} / s
                                      <= 10240.0 AND zeros > 0
                                 THEN 4096 * ln(4096.0 / zeros)
                                 ELSE {repr(hll_estimate_num(12))} / s
                            END) + 0.5) AS BIGINT)) AS n_est
                FROM agg),
            mm AS (
                SELECT GREATEST(64, ((n_est * 16 + 63) // 64) * 64) AS m
                FROM nest),
            ks AS (SELECT unnest(range(11)) AS i),
            bh AS (
                SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT AS h1,
                       ('0x' || substr(md5(g), 16, 15))::BIGINT | 1 AS h2
                FROM bench),
            bpos AS (
                SELECT DISTINCT
                       ((bh.h1 % mm.m) + ks.i * (bh.h2 % mm.m)) % mm.m AS p
                FROM bh, ks, mm),
            corpus AS (
                SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 20 <> 0),
            ch AS (
                SELECT doc_id, g,
                       ('0x' || substr(md5(g), 1, 15))::BIGINT AS h1,
                       ('0x' || substr(md5(g), 16, 15))::BIGINT | 1 AS h2
                FROM corpus),
            hits AS (
                SELECT ch.doc_id, ch.g
                FROM ch, ks, mm
                WHERE ((ch.h1 % mm.m) + ks.i * (ch.h2 % mm.m)) % mm.m
                      IN (SELECT p FROM bpos)
                GROUP BY ch.doc_id, ch.g
                HAVING COUNT(*) = 11)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_grams
            FROM hits GROUP BY 1
        """
    # Truncated Katz centrality: integer walk counts with per-term
    # right-shift attenuation (graph.py katz_centrality) — the same
    # single-reference recursion scaffolding as _pr_sql, no division
    out["kg_katz"] = f"""
            WITH RECURSIVE best AS MATERIALIZED (
                SELECT alias, ent_type, entity_id
                FROM (
                    SELECT alias, ent_type, entity_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY alias, ent_type
                               ORDER BY prior DESC, entity_id
                           ) AS rn
                    FROM read_parquet('{g}/aliases.parquet')
                ) WHERE rn = 1
            ),
            lm AS MATERIALIZED (
                SELECT m.mention_id, b.entity_id
                FROM read_parquet('{g}/golden_mentions/*.parquet') m
                JOIN best b
                  ON lower(m.surface) = b.alias AND m.ent_type = b.ent_type
            ),
            ed AS MATERIALIZED (
                SELECT s.entity_id AS src, o.entity_id AS dst
                FROM read_parquet('{g}/golden_triples/*.parquet') t
                JOIN lm s ON t.subj_mention_id = s.mention_id
                JOIN lm o ON t.obj_mention_id = o.mention_id
                GROUP BY s.entity_id, t.pred, o.entity_id
            ),
            nds AS MATERIALIZED (
                SELECT DISTINCT m FROM (
                    SELECT src AS m FROM ed UNION ALL SELECT dst FROM ed)
            ),
            ed2 AS MATERIALIZED (
                SELECT src, dst, 0 AS z FROM ed
                UNION ALL SELECT m, m, 1 FROM nds
            ),
            wk(iter, node, w) AS (
                SELECT 0, m, 1 FROM nds
                UNION ALL
                SELECT MIN(x.it) + 1, x.node, SUM(x.c)
                FROM (
                    SELECT p.iter AS it, e2.dst AS node,
                           CASE WHEN e2.z = 1 THEN 0 ELSE p.w END AS c
                    FROM wk p JOIN ed2 e2 ON e2.src = p.node
                ) x
                WHERE x.it < 6
                GROUP BY x.node
            )
            SELECT node,
                   CAST(SUM(w >> (2 * iter)) AS BIGINT) AS katz_q
            FROM wk WHERE iter >= 1 GROUP BY node
        """
    # Per-term burstiness sufficient statistics (exact integers) —
    # curation.token_dispersion
    out["token_dispersion"] = """
            WITH tf AS (
                SELECT doc_id, token, COUNT(*) AS c FROM (
                    SELECT doc_id,
                           unnest(regexp_extract_all(text, '\\S+'))
                               AS token
                    FROM documents)
                GROUP BY 1, 2
            )
            SELECT token,
                   CAST(SUM(c) AS BIGINT) AS n_occurrences,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(c * c) AS BIGINT) AS sum_c2
            FROM tf GROUP BY token HAVING SUM(c) >= 10
        """
    # Per-doc token entropy (functions/textstats.token_entropy):
    # ent_sum_e9 = Σ floor(c·log2(c)·1e9) is an order-independent int
    # sum; entropy_bits is one fixed-order float expression over ints
    out["doc_entropy"] = """
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(text, '\\S+')) AS term
                FROM documents
            ),
            tf AS (
                SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY 1, 2
            ),
            e AS (
                SELECT doc_id, c,
                       CAST(floor(CAST(c AS DOUBLE)
                                  * log2(CAST(c AS DOUBLE))
                                  * 1000000000.0) AS BIGINT) AS e9
                FROM tf
            ),
            agg AS (
                SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct,
                       SUM(e9) AS ent_sum_e9
                FROM e GROUP BY 1
            )
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(n_distinct AS BIGINT) AS n_distinct,
                   CAST(ent_sum_e9 AS BIGINT) AS ent_sum_e9,
                   log2(CAST(n_tokens AS DOUBLE))
                     - ent_sum_e9 / (1000000000.0 * n_tokens)
                       AS entropy_bits
            FROM agg
        """
    # HLL daily rollup: md5-60 registers over CAST(user_id AS VARCHAR)
    # per (event_type, day), exact-integer S, one NUM/S division —
    # replays functions/sketch.py (p=12) bit-for-bit.
    _n12 = repr(hll_estimate_num(12))
    out["events_daily_approx"] = f"""
            WITH du AS (
                SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
                                user_id
                FROM events
            ),
            sing AS (
                SELECT event_type, day,
                       ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                       1, 15))::BIGINT AS h
                FROM du
            ),
            regs AS (
                SELECT event_type, day, h >> 48 AS idx,
                       MAX(CASE WHEN (h & 281474976710655) = 0 THEN 49
                                ELSE 49 - length(bin(h & 281474976710655))
                           END) AS reg
                FROM sing GROUP BY 1, 2, 3
            ),
            agg AS (
                SELECT event_type, day,
                       SUM(1::BIGINT << (49 - reg))
                         + (4096 - COUNT(*)) * (1::BIGINT << 49) AS s,
                       4096 - COUNT(*) AS zeros
                FROM regs GROUP BY 1, 2
            ),
            base AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       COUNT(*) AS n_events,
                       MIN(value) AS min_value, MAX(value) AS max_value
                FROM events GROUP BY 1, 2
            )
            SELECT b.event_type, b.day, b.n_events,
                   CAST(floor((CASE WHEN {_n12} / a.s <= 10240.0
                                     AND a.zeros > 0
                                    THEN 4096 * ln(4096.0 / a.zeros)
                                    ELSE {_n12} / a.s END) + 0.5)
                        AS BIGINT) AS n_users_approx,
                   b.min_value, b.max_value
            FROM base b JOIN agg a USING (event_type, day)
        """
    return out
