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


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_mentions": _q_extract_mentions,
        "extract_triples": _q_extract_triples,
        "link_mentions": _q_link_mentions,
        "canonicalize": _q_canonicalize,
        "kg_edges": _q_kg_edges,
        "kg_nodes": _q_kg_nodes,
    }


def oracle_sql() -> dict[str, str]:
    g = str(_SF001)
    return {
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
    }
