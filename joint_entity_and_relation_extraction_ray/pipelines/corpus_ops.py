"""Training-data corpus operators over the driver's `documents` and
`embeddings` parquet tables (driver brief: dedup / similarity search /
text analysis / multimodal — first-class alongside the KG pipeline).

Each public ``q_*`` takes an ``sf_dir`` and returns a lazy
``ray.data.Dataset``; `__ray_entry__.queries()` exposes them and (where
SQL-expressible) `oracle_sql()` carries the DuckDB equivalent.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data

from ..functions import textstats
from ..stages import dedup, multimodal, similarity

N_ANN_QUERIES = 10
ANN_K = 5
# driver-corpus embeddings are not clustered (max pairwise cos ≈ 0.51);
# 0.45 keeps the oracle-checked result non-trivial at every sf
COSINE_DUP_THRESHOLD = 0.45
JACCARD_THRESHOLD = 0.5


def read_documents(sf_dir: str) -> ray.data.Dataset:
    """Column-pruned read: only (doc_id, text) leave storage."""
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def read_embeddings(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


# --- text analysis ---------------------------------------------------------


def q_doc_stats(sf_dir: str) -> ray.data.Dataset:
    return read_documents(sf_dir).map_batches(
        textstats.doc_stats, batch_format="pyarrow", zero_copy_batch=True
    )


def q_lang_id(sf_dir: str) -> ray.data.Dataset:
    return read_documents(sf_dir).map_batches(
        textstats.lang_id, batch_format="pyarrow", zero_copy_batch=True
    )


def q_doc_fingerprint(sf_dir: str) -> ray.data.Dataset:
    return read_documents(sf_dir).map_batches(
        textstats.fingerprint, batch_format="pyarrow", zero_copy_batch=True
    )


def q_doc_winnow(sf_dir: str) -> ray.data.Dataset:
    """Winnowing rolling-hash fingerprints (rows-only: not SQL-expressible)."""
    return read_documents(sf_dir).map_batches(
        textstats.winnow_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# --- dedup -----------------------------------------------------------------


def q_dedup_exact(sf_dir: str) -> ray.data.Dataset:
    return dedup.exact_dedup(read_documents(sf_dir))


def q_dedup_minhash(sf_dir: str) -> ray.data.Dataset:
    return dedup.minhash_dedup_pairs(
        read_documents(sf_dir), threshold=JACCARD_THRESHOLD
    )


def q_dedup_simhash(sf_dir: str) -> ray.data.Dataset:
    return dedup.simhash_dedup(read_documents(sf_dir))


def q_dedup_simhash_near(sf_dir: str) -> ray.data.Dataset:
    """Hamming ≤ 3 near-dup pairs (rows-only: simhash not SQL-computable)."""
    return dedup.simhash_near_pairs(read_documents(sf_dir))


def q_dedup_embedding(sf_dir: str) -> ray.data.Dataset:
    return dedup.embedding_dup_pairs(
        read_embeddings(sf_dir), threshold=COSINE_DUP_THRESHOLD
    )


def q_dedup_embedding_lsh(sf_dir: str) -> ray.data.Dataset:
    """Approximate hyperplane-LSH variant (rows-only: can miss cross-bucket
    pairs by construction)."""
    return dedup.embedding_dup_pairs_lsh(
        read_embeddings(sf_dir), threshold=COSINE_DUP_THRESHOLD
    )


# --- similarity search -----------------------------------------------------


def _query_vectors(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return t.filter(pa.compute.less(t["vec_id"], N_ANN_QUERIES))


def q_ann_topk(sf_dir: str) -> ray.data.Dataset:
    return similarity.ann_topk(
        read_embeddings(sf_dir), _query_vectors(sf_dir), k=ANN_K
    )


def q_ann_topk_ivf(sf_dir: str) -> ray.data.Dataset:
    """IVF-probed approximate ANN (rows-only by construction)."""
    return similarity.ann_topk_ivf(
        read_embeddings(sf_dir), _query_vectors(sf_dir), k=ANN_K
    )


# --- multimodal (stubbed decode, real plumbing) ----------------------------


def q_multimodal_features(sf_dir: str) -> ray.data.Dataset:
    """documents.text encoded as an opaque binary payload → actor-pool
    featurizer. Query output is the SQL-checkable part (n_bytes, sha256);
    the fake feature vector is exercised in pytest."""

    def _to_media(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table(
            {
                "media_id": t["doc_id"],
                "media_type": pa.array(["image"] * len(texts), pa.string()),
                "payload": pa.array(
                    [x.encode("utf-8") for x in texts], pa.binary()
                ),
            }
        )

    media = read_documents(sf_dir).map_batches(
        _to_media, batch_format="pyarrow", zero_copy_batch=True
    )
    return multimodal.featurize(media).select_columns(
        ["media_id", "n_bytes", "digest"]
    )


# --- event-stream ops (windowed / sessionized aggregates) ------------------


def q_sessionize(sf_dir: str) -> ray.data.Dataset:
    from ..stages import events

    return events.sessionize(events.read_events(sf_dir, ["user_id", "ts"]))


def q_events_daily(sf_dir: str) -> ray.data.Dataset:
    from ..stages import events

    return events.daily_rollup(
        events.read_events(sf_dir, ["event_type", "ts", "user_id", "value"])
    )


# --- sampling (O3) ---------------------------------------------------------


def q_sample_hash(sf_dir: str) -> ray.data.Dataset:
    """Deterministic ~10% hash sample: md5(doc_id) hex prefix < '1a'
    (26/256 ≈ 10.2%).

    Hash-based (not systematic) so the sample is unbiased w.r.t. id order,
    yet reproducible across runs/engines — mirrored exactly in SQL. The
    comparison is pure VARCHAR ordering on the lowercase hex digest (no
    hex→int cast on either side), so neither engine's evaluation can throw
    mid-comparison.
    """
    import hashlib

    def _sample(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        keep = [
            i
            for i, d in enumerate(ids)
            if hashlib.md5(str(d).encode()).hexdigest()[:2] < "1a"
        ]
        return t.select(["doc_id"]).take(keep)

    return read_documents(sf_dir).map_batches(
        _sample, batch_format="pyarrow", zero_copy_batch=True
    )


def q_sample_random(sf_dir: str) -> ray.data.Dataset:
    """Seeded ``random_sample`` (rows-only: Ray's sampler isn't
    SQL-reproducible; determinism for a fixed block layout only)."""
    return read_documents(sf_dir).select_columns(["doc_id"]).random_sample(
        0.1, seed=42
    )


# --- bench subset ----------------------------------------------------------


def bench_ops():
    """Headline corpus ops timed by bench.py (names → fn(sf_dir))."""

    def _consume(fn):
        def run(sf_dir: str):
            ds = fn(sf_dir)
            return ds.count()

        return run

    return {
        "doc_stats": _consume(q_doc_stats),
        "dedup_exact": _consume(q_dedup_exact),
        "dedup_minhash": _consume(q_dedup_minhash),
        "ann_topk": _consume(q_ann_topk),
    }
