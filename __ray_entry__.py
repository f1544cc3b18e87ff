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
    """Flagship extraction pipeline on /root/testdata/sf0.001 (≥0 rows,
    stable schema): transcripts → scorer actor pool → triples."""
    from joint_entity_and_relation_extraction_ray.pipelines import kg

    combined = kg.extract_for_sf_dir("/root/testdata/sf0.001")
    return kg.triples_of(combined)


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


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_mentions": _q_extract_mentions,
        "extract_triples": _q_extract_triples,
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
    }
