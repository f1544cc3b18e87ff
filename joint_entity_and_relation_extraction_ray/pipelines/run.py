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
from ..state.checkpoint import Checkpointer, parquet_sig
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
    # input lineage: CONTENT digests (parquet footer metadata), not just a
    # file listing + row counts — an in-place edit that keeps counts
    # constant must still invalidate downstream checkpoints
    src_files = sorted(str(p) for p in Path(transcripts_dir).glob("*.parquet"))
    src_sigs = {f: parquet_sig(f) for f in src_files}
    alias_sig = parquet_sig(aliases_path)
    entities_sig = parquet_sig(entities_path)

    # the model stage runs at PARTITION granularity: shard = input-file
    # group; a mid-stage kill (or one changed input shard) redoes only the
    # affected partitions (SURVEY §4.4)
    num_parts = max(1, min(len(src_files), 16))

    def _shard_files(k: int) -> list[str]:
        return [f for i, f in enumerate(src_files) if i % num_parts == k]

    combined = ck.run_partitioned(
        "combined",
        lambda k: kg.extract_combined(
            read_transcripts(_shard_files(k)),
            aliases,
            batch_size=batch_size,
            concurrency=concurrency,
        ),
        num_parts=num_parts,
        params={"batch_size": batch_size, "aliases": alias_sig},
        part_params=lambda k: {
            "files": {f: src_sigs[f] for f in _shard_files(k)}
        },
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
        params={"aliases": alias_sig},
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
        params={"entities": entities_sig},
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
