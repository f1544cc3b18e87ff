"""Sequence packing — assign documents to fixed-token-budget training
shards (the packing step an LLM data pipeline runs before writing
training examples; no reference analogue, new engine capability).

Deterministic and distributed: docs hash-bucket by id (stable across
runs AND block layouts), each bucket packs its docs first-fit-decreasing
(FFD, the standard bin-packing heuristic) in a deterministic
(n_tokens desc, id asc) order, and shard ids are ``{bucket}:{bin}`` so
buckets never coordinate. The invariants (each doc exactly once; every
multi-doc shard within budget; byte-identical assignment on rerun) are
pinned in tests; since r4 the DuckDB oracle SIMULATES the greedy loop
(items ranked per bucket, one recursive-CTE step per rank carrying the
open-bin state), so the driver query is hash-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.shuffle import bucket_group_apply

PACKED = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("shard_id", pa.string()),
    ]
)


def pack_sequences(
    docs: ray.data.Dataset,
    *,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """(id, n_tokens) rows → (id, n_tokens, shard_id) with per-shard
    token sums ≤ ``budget`` (a doc longer than the budget gets a shard
    of its own). One bucket shuffle; the per-bucket FFD loop is
    O(docs × open_bins) python over ints only — text never moves.
    Deterministic end to end (md5-60 bucketing, (n_tokens desc, id asc)
    order, first-open-bin rule), so the driver oracle replays the exact
    assignment step-by-step in a recursive CTE.
    """

    def _with_bucket(t: pa.Table) -> pa.Table:
        # md5-60 bucketing (schema.md5_60, not the pandas-hash
        # stable_bucket): the bucket id is part of the OUTPUT (shard_id
        # = bucket:bin), so it must be a hash the DuckDB oracle can
        # recompute — that plus the deterministic FFD below is what
        # makes the whole assignment oracle-replayable
        from ..schema import md5_60

        b = (
            md5_60(t[id_col].to_numpy(zero_copy_only=False))
            % num_buckets
        ).astype(np.int32)
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": t[id_col].cast(pa.int64()),
                # null token counts (e.g. null text) pack as 0 tokens
                "n_tokens": pc.fill_null(
                    t[tokens_col].cast(pa.int64()), 0
                ),
                "_bucket": pa.array(b, pa.int32()),
            }
        )

    def _pack_one(bucket: int, ids: np.ndarray, toks: np.ndarray):
        order = np.lexsort((ids, -toks))  # FFD: big first, id tiebreak
        bins_room: list[int] = []
        assign = np.empty(len(ids), dtype=np.int64)
        for pos in order:
            need = int(toks[pos])
            for bi, room in enumerate(bins_room):
                if room >= need:
                    bins_room[bi] = room - need
                    assign[pos] = bi
                    break
            else:
                # an over-budget doc CLOSES its bin (room -1, which no
                # need ≥ 0 can satisfy) so even zero-token docs cannot
                # join it — the own-shard invariant holds
                bins_room.append(
                    budget - need if need <= budget else -1
                )
                assign[pos] = len(bins_room) - 1
        return [f"{bucket}:{bi}" for bi in assign.tolist()]

    def _pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return PACKED.empty_table()
        # a reduce task may receive several hash-equal _bucket values —
        # pack each independently so shard ids stay layout-independent
        out_id, out_tok, out_shard = [], [], []
        buckets = t["_bucket"].to_numpy(zero_copy_only=False)
        ids_all = t["doc_id"].to_numpy(zero_copy_only=False)
        toks_all = t["n_tokens"].to_numpy(zero_copy_only=False)
        for b in np.unique(buckets):
            m = buckets == b
            ids, toks = ids_all[m], toks_all[m]
            out_id.append(ids)
            out_tok.append(toks)
            out_shard.extend(_pack_one(int(b), ids, toks))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
                "n_tokens": pa.array(np.concatenate(out_tok), pa.int64()),
                "shard_id": pa.array(out_shard, pa.string()),
            }
        )

    keyed = docs.map_batches(
        _with_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucket_group_apply(keyed, "_bucket", _pack, num_buckets=num_buckets)
