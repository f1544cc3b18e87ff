"""EntityLinker — alias-dictionary linking stage (SURVEY.md §2.2 A2/J1).

The alias dictionary is tiny relative to the data, so this is a BROADCAST
lookup, never a shuffle join: ``ray.put`` the dictionary once on the
driver; every actor fetches it ONCE in ``__init__`` (BASELINE.json:6
"entity linking scores candidate mentions against an alias dictionary
broadcast to actors").

Candidate scoring: among candidates whose type matches the mention's
decoded type, pick the highest disambiguation prior (tie-break:
lexicographically smallest entity_id) — a deterministic MAP choice;
``link_score`` is the prior normalized over the type-matching candidate
set. Unmatched mentions keep a null ``cand_entity_id`` and score 0.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..functions.text import normalize_surface
from ..schema import LINKED


def default_pool_size() -> int:
    """Actor-pool size that leaves ≥2 CPUs of headroom for the read /
    split / write tasks feeding and draining the pool — a pool that
    reserves every CPU starves those tasks and stalls the pipeline
    (observed as a deadlock in 4-CPU sessions)."""
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        ncpu = 4
    return max(2, ncpu - 2)


def build_alias_index(
    aliases: pa.Table,
) -> dict[tuple[str, str], tuple[str, float]]:
    """(casefolded alias, ent_type) → (best entity_id, normalized score).

    Ambiguity is resolved at index-build time (once), not per batch.
    """
    groups: dict[tuple[str, str], list[tuple[float, str]]] = {}
    for alias, etype, eid, prior in zip(
        aliases["alias"].to_pylist(),
        aliases["ent_type"].to_pylist(),
        aliases["entity_id"].to_pylist(),
        aliases["prior"].to_pylist(),
    ):
        groups.setdefault((alias, etype), []).append((float(prior), eid))
    index: dict[tuple[str, str], tuple[str, float]] = {}
    for key, cands in groups.items():
        total = sum(p for p, _ in cands)
        # max prior wins; ties broken by smallest entity_id (deterministic)
        best_p, best_id = sorted(cands, key=lambda c: (-c[0], c[1]))[0]
        index[key] = (best_id, best_p / total if total > 0 else 0.0)
    return index


class EntityLinker:
    """Actor-pool stage: T1 MENTIONS batch → T3 LINKED batch."""

    def __init__(self, alias_index_ref):
        try:
            if isinstance(alias_index_ref, ray.ObjectRef):
                alias_index_ref = ray.get(alias_index_ref)
        except Exception:
            pass
        if isinstance(alias_index_ref, pa.Table):  # convenience for tests
            alias_index_ref = build_alias_index(alias_index_ref)
        self.index = alias_index_ref
        # per-actor memo of normalized surfaces (hot surfaces repeat a lot)
        self._norm_cache: dict[str, str] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch["surface"].to_pylist()
        etypes = batch["ent_type"].to_pylist()
        cache = self._norm_cache
        ids: list[str | None] = []
        scores: list[float] = []
        for s, t in zip(surfaces, etypes):
            key = cache.get(s)
            if key is None:
                key = cache[s] = normalize_surface(s)
            hit = self.index.get((key, t))
            if hit is None:
                ids.append(None)
                scores.append(0.0)
            else:
                ids.append(hit[0])
                scores.append(hit[1])
        out = batch.append_column(
            "cand_entity_id", pa.array(ids, pa.string())
        ).append_column("link_score", pa.array(scores, pa.float32()))
        return out.select(LINKED.names).cast(LINKED)


def link_mentions(
    mentions: ray.data.Dataset,
    aliases: pa.Table,
    *,
    concurrency: int | None = None,
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """T1 → T3 via the broadcast alias index."""
    index = build_alias_index(aliases)
    ref = ray.put(index) if ray.is_initialized() else index
    return mentions.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"alias_index_ref": ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency or default_pool_size(),
    )
