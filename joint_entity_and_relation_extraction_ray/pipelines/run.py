"""Checkpointed end-to-end KG job — the ``ray job submit`` entry point
(SURVEY.md §3.2; BASELINE.json "launched via ray job submit ... resumes
without recomputing upstream").

    ray job submit -- python -m joint_entity_and_relation_extraction_ray.pipelines.run \
        --transcripts /data/transcripts --aliases /data/aliases.parquet \
        --entities /data/entities.parquet --out /data/kg_out

Every stage boundary is a parquet checkpoint with a lineage fingerprint
(state/checkpoint.py); rerunning with the same inputs skips straight to
the first stale stage. Owns its Ray session only under ``__main__`` —
:func:`run_checkpointed` itself never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import pyarrow.parquet as pq
import ray.data

from ..sources.transcripts import read_transcripts
from ..state.checkpoint import Checkpointer
from . import kg


def run_checkpointed(
    transcripts_dir: str,
    aliases_path: str,
    entities_path: str,
    out_root: str,
    *,
    batch_size: int = 512,
    concurrency: int | None = None,
    num_salts: int = 16,
) -> dict:
    """Full pipeline with per-stage checkpoints; returns the run manifest."""
    from ..stages.canonical import canonicalize
    from ..stages.graph import build_edges, build_nodes, rewrite_triples
    from ..stages.linker import link_mentions

    ck = Checkpointer(out_root)
    aliases = pq.read_table(aliases_path)
    ents = pq.read_table(entities_path)
    entity_names = dict(
        zip(ents["entity_id"].to_pylist(), ents["canonical_name"].to_pylist())
    )
    # input lineage: fingerprint the source file listing + row counts
    src_files = sorted(str(p) for p in Path(transcripts_dir).glob("*.parquet"))
    input_sig = {
        "files": src_files,
        "rows": [pq.ParquetFile(f).metadata.num_rows for f in src_files],
    }

    combined = ck.run(
        "combined",
        lambda: kg.extract_combined(
            read_transcripts(transcripts_dir),
            aliases,
            batch_size=batch_size,
            concurrency=concurrency,
        ),
        params={"input": input_sig, "batch_size": batch_size},
    )
    mentions = ck.run(
        "mentions", lambda: kg.mentions_of(combined), deps=["combined"]
    )
    triples = ck.run(
        "triples", lambda: kg.triples_of(combined), deps=["combined"]
    )
    linked = ck.run(
        "linked",
        lambda: link_mentions(mentions, aliases),
        deps=["mentions"],
    )
    canon = ck.run(
        "canon",
        lambda: canonicalize(linked, num_salts=num_salts),
        params={"num_salts": num_salts},
        deps=["linked"],
    )
    edges = ck.run(
        "edges",
        lambda: build_edges(rewrite_triples(triples, canon)),
        deps=["triples", "canon"],
    )
    ck.run(
        "nodes",
        lambda: build_nodes(linked, canon, entity_names),
        deps=["linked", "canon"],
    )
    del edges
    return {
        "out_root": str(out_root),
        "fingerprints": dict(ck.fingerprints),
        "stages": {
            s: (ck.manifest(s) or {}).get("rows") for s in ck.fingerprints
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--transcripts", required=True)
    ap.add_argument("--aliases", required=True)
    ap.add_argument("--entities", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--concurrency", type=int, default=None)
    ap.add_argument("--num-salts", type=int, default=16)
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        manifest = run_checkpointed(
            args.transcripts,
            args.aliases,
            args.entities,
            args.out,
            batch_size=args.batch_size,
            concurrency=args.concurrency,
            num_salts=args.num_salts,
        )
        print(json.dumps(manifest))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
