"""Similarity search over an embedding column (list<float>) — driver brief
"similarity search" family.

- :func:`ann_topk` — exact brute-force cosine top-k: the query matrix is
  broadcast (``ray.put`` once), every batch does one float64 matmul and
  emits its per-query partial top-k, and a tiny groupby(query) merge
  produces the global top-k. Shuffle payload is O(n_queries × k × blocks),
  never the corpus.
- :func:`ann_topk_ivf` — IVF scale path: corpus bucketed by nearest
  centroid (one map), queries probe the ``nprobe`` nearest centroid
  buckets only. Approximate → rows-only in the driver contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _emb_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, m


def ann_topk(
    emb: ray.data.Dataset,
    queries: pa.Table,
    *,
    k: int = 5,
) -> ray.data.Dataset:
    """Exact cosine top-k per query vector → (query_id, neighbor_id, rank).

    `queries`: (vec_id, embedding) rows. Self-matches (same vec_id) are
    excluded. Ties break on neighbor_id ascending (deterministic).
    """
    qids, qmat = _emb_matrix(queries)
    qn = _norm_rows(qmat)
    ref = ray.put((qids, qn)) if ray.is_initialized() else (qids, qn)

    def _partial(t: pa.Table) -> pa.Table:
        q_ids, q = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        ids, m = _emb_matrix(t)
        s = q @ _norm_rows(m).T  # (Q, B)
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, s.shape[1])  # +1 headroom for a self-match
        for qi in range(s.shape[0]):
            row = s[qi]
            top = np.argpartition(-row, kk - 1)[:kk] if kk < len(row) else np.arange(len(row))
            order = top[np.lexsort((ids[top], -row[top]))]
            for ni in order:
                if ids[ni] == q_ids[qi]:
                    continue
                out_q.append(q_ids[qi])
                out_n.append(ids[ni])
                out_s.append(row[ni])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    partial = emb.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)

    def _merge(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(
                group["score"].to_pylist(),
                group["neighbor_id"].to_pylist(),
                group["query_id"].to_pylist(),
            ),
            key=lambda r: (-r[0], r[1]),
        )[:k]
        return pa.table(
            {
                "query_id": pa.array([r[2] for r in rows], pa.int64()),
                "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
                "rank": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            }
        )

    return partial.groupby("query_id").map_groups(_merge, batch_format="pyarrow")


def ann_topk_ivf(
    emb: ray.data.Dataset,
    queries: pa.Table,
    *,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 13,
) -> ray.data.Dataset:
    """IVF-style ANN: bucket corpus by nearest of `n_centroids` seeded
    centroids; each query scans only its `nprobe` closest buckets.

    Centroids are a deterministic sample of the corpus (hash-ordered first
    `n_centroids` vectors) — a kmeans refinement drops in without changing
    the dataflow.
    """
    emb = emb.materialize()
    head = emb.limit(n_centroids * 8).take_all()
    rng = np.random.default_rng(seed)
    cand = np.array([r["embedding"] for r in head], dtype=np.float64)
    sel = rng.permutation(len(cand))[:n_centroids]
    centroids = _norm_rows(cand[sel])
    cref = ray.put(centroids) if ray.is_initialized() else centroids

    def _assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        ids, m = _emb_matrix(t)
        mn = _norm_rows(m)
        bucket = np.argmax(mn @ c.T, axis=1)
        return pa.table(
            {
                "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
                "vec_id": t["vec_id"],
                "embedding": t["embedding"],
            }
        )

    bucketed = emb.map_batches(_assign, batch_format="pyarrow", zero_copy_batch=True)

    qids, qmat = _emb_matrix(queries)
    qn = _norm_rows(qmat)
    probe = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]
    qref = ray.put((qids, qn, probe)) if ray.is_initialized() else (qids, qn, probe)

    def _scan(group: pa.Table) -> pa.Table:
        q_ids, q, pr = ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
        bucket = group["bucket"][0].as_py()
        sel_q = [i for i in range(len(q_ids)) if bucket in pr[i]]
        if not sel_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        ids, m = _emb_matrix(group)
        s = q[sel_q] @ _norm_rows(m).T
        out_q, out_n, out_s = [], [], []
        for row_i, qi in enumerate(sel_q):
            row = s[row_i]
            order = np.lexsort((ids, -row))[: k + 1]
            for ni in order:
                if ids[ni] == q_ids[qi]:
                    continue
                out_q.append(q_ids[qi])
                out_n.append(ids[ni])
                out_s.append(row[ni])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    partial = bucketed.groupby("bucket").map_groups(_scan, batch_format="pyarrow")

    def _merge(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(
                group["score"].to_pylist(),
                group["neighbor_id"].to_pylist(),
                group["query_id"].to_pylist(),
            ),
            key=lambda r: (-r[0], r[1]),
        )[:k]
        return pa.table(
            {
                "query_id": pa.array([r[2] for r in rows], pa.int64()),
                "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
                "rank": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            }
        )

    return partial.groupby("query_id").map_groups(_merge, batch_format="pyarrow")
