"""Deduplication operators over a (doc_id, text) / (vec_id, embedding)
corpus — the training-data-pipeline family (driver brief): exact,
MinHash+LSH, SimHash, n-gram Jaccard verification, embedding-cosine.

Scale design notes (10^12-row framing):

- exact dedup = hash fingerprint (map) + groupby(digest) min — one shuffle
  whose payload is (digest, doc_id), never the text;
- MinHash LSH = shingle→signature (map, vectorized) → flat-map to
  (band_key, doc_id) → bucket-shuffle pair-gen (bands are the classic
  shingle→minhash→band→bucket-groupby decomposition) → distinct pairs →
  n-gram Jaccard verify via joins against the shingle table. Pair-gen is
  EXACT by default (no silent truncation); oversized buckets are logged,
  and shingle-less docs are skipped at banding so they never collide on a
  sentinel signature. Callers at scale bound the quadratic explicitly via
  ``max_bucket`` (logged truncation);
- SimHash = 64-bit fingerprint (map) + groupby(fingerprint); near-dup
  variant blocks on 4×16-bit bands (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 band
  equal) then verifies exact hamming distance (vectorized popcount);
- embedding near-dup baseline = brute-force cosine against a broadcast
  normalized matrix (exact; fine to ~1e6×D on a worker); the scale path
  is multi-table random-hyperplane LSH over INT (bucket, vec_id) rows +
  join-side exact-cosine verify (approximate, rows-only oracle).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..functions import textstats
from ..functions.joins import (
    BROADCAST_THRESHOLD_ROWS,
    broadcast_join,
    dataset_to_table,
    join_auto,
)
from ..functions.shuffle import bucket_group_apply

log = logging.getLogger(__name__)

# Pair generation per LSH bucket is exact by default (no silent truncation
# — a dropped pair would diverge from the all-pairs oracle). Buckets above
# BUCKET_WARN are logged; callers at scale can pass max_bucket to bound the
# quadratic explicitly (truncation is then logged too).
BUCKET_WARN = 200


def _upper_pairs(
    ids: np.ndarray, *, max_bucket: int | None, label: str
) -> tuple[np.ndarray, np.ndarray]:
    """All index pairs (i < j) over ``ids`` — vectorized, memory-chunked.

    Returns parallel (a_idx, b_idx) POSITION arrays into ``ids``. Oversized
    buckets are logged; with ``max_bucket`` set the bucket is truncated
    (logged, never silent)."""
    n = len(ids)
    if n > BUCKET_WARN:
        log.warning("%s: LSH bucket of %d ids (quadratic pair-gen)", label, n)
    if max_bucket is not None and n > max_bucket:
        log.warning(
            "%s: truncating bucket %d -> %d ids (max_bucket)", label, n, max_bucket
        )
        n = max_bucket
    if n < 2:
        z = np.empty(0, dtype=np.int64)
        return z, z
    if n <= 4096:  # triu direct: <= 8.4M pairs
        a, b = np.triu_indices(n, k=1)
        return a.astype(np.int64), b.astype(np.int64)
    outs_a, outs_b = [], []
    for i0 in range(0, n - 1, 2048):
        rows = np.arange(i0, min(i0 + 2048, n - 1), dtype=np.int64)
        counts = n - rows - 1
        total = int(counts.sum())
        ends = np.cumsum(counts)
        starts = ends - counts
        j = (
            np.arange(total, dtype=np.int64)
            - np.repeat(starts, counts)
            + np.repeat(rows + 1, counts)
        )
        outs_a.append(np.repeat(rows, counts))
        outs_b.append(j)
    return np.concatenate(outs_a), np.concatenate(outs_b)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Keep-first (min doc_id) per identical text → (doc_id, n_dups).

    Shuffle key is the md5 digest — hash-partition + per-group first
    (groupby min), text bytes never move.
    """
    fp = docs.map_batches(
        textstats.fingerprint, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = fp.groupby("digest").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups")
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_dups": pc.cast(t["n_dups"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def dedup_rows(
    ds: ray.data.Dataset,
    key: str,
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Generic keep-one-per-key distinct (D2): one bucketed shuffle; the
    survivor is deterministic — rows sort by ALL columns inside each
    bucket before keep-first, so the result is independent of block
    arrival order. For scalar-column schemas (sorting list columns is not
    supported); duplicate mention rows from overlapping decode or dirty
    reruns are the canonical use (``dedup_rows(mentions, "mention_id")``).
    """

    def _d(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return t
        df = pl.from_arrow(t)
        out = (
            df.sort(df.columns)
            .unique(subset=[key], keep="first", maintain_order=True)
            .to_arrow()
        )
        return pa.Table.from_arrays(
            [out[n].cast(t.schema.field(n).type) for n in t.schema.names],
            schema=t.schema,
        )

    return bucket_group_apply(ds, key, _d, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup pairs, verified by true n-gram Jaccard
# ---------------------------------------------------------------------------


def shingle_docs(docs: ray.data.Dataset, *, k: int = 3) -> ray.data.Dataset:
    """(doc_id, text) → (doc_id, shingles list<string>, n_shingles)."""

    def _sh(t: pa.Table) -> pa.Table:
        sh = [textstats.word_shingles(x, k) for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "shingles": pa.array(sh, pa.list_(pa.string())),
                "n_shingles": pa.array([len(s) for s in sh], pa.int64()),
            }
        )

    return docs.map_batches(_sh, batch_format="pyarrow", zero_copy_batch=True)


def _band_keys(
    sigs: np.ndarray, doc_ids: list[int], rows_per_band: int
) -> pa.Table:
    """Band signatures → int64 band keys, fully vectorized.

    The key is a splitmix-style MIX of the band's signature values + the
    band index — 8 bytes through the shuffle instead of a ~45-byte string,
    no per-row Python. Equal band signatures always produce equal keys
    (recall is exact); a rare mix collision only MERGES two buckets, which
    adds candidate pairs that the exact-Jaccard verify removes."""
    n_docs, num_perm = sigs.shape
    n_bands = num_perm // rows_per_band
    banded = sigs.reshape(n_docs, n_bands, rows_per_band)
    with np.errstate(over="ignore"):
        h = np.full((n_docs, n_bands), 0x243F6A8885A308D3, dtype=np.uint64)
        for r in range(rows_per_band):
            h ^= banded[:, :, r]
            h *= np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
        h ^= np.arange(n_bands, dtype=np.uint64)[None, :] * np.uint64(
            0xBF58476D1CE4E5B9
        )
    keys = h.reshape(-1).view(np.int64)
    dids = np.repeat(np.asarray(doc_ids, dtype=np.int64), n_bands)
    return pa.table(
        {
            "band_key": pa.array(keys, pa.int64()),
            "doc_id": pa.array(dids, pa.int64()),
        }
    )


def minhash_candidate_pairs(
    shingled: ray.data.Dataset,
    *,
    num_perm: int = 128,
    rows_per_band: int = 2,
    seed: int = 7,
    max_bucket: int | None = None,
) -> ray.data.Dataset:
    """LSH banding → distinct candidate (doc_a < doc_b) pairs.

    Docs with ZERO shingles are skipped at banding: they cannot reach any
    positive Jaccard (the SQL oracle's NULL shingles likewise never match),
    and without the skip they would all share the identical sentinel
    signature and pile into one quadratic bucket."""

    def _bands(t: pa.Table) -> pa.Table:
        sh = t["shingles"].to_pylist()
        ids = t["doc_id"].to_pylist()
        keep = [i for i, s in enumerate(sh) if s]
        sh = [sh[i] for i in keep]
        ids = [ids[i] for i in keep]
        sigs = textstats.minhash_signatures(sh, num_perm=num_perm, seed=seed)
        return _band_keys(sigs, ids, rows_per_band)

    bands = shingled.map_batches(
        _bands, batch_format="pyarrow", zero_copy_batch=True
    )

    def _pairs_bucket(t: pa.Table) -> pa.Table:
        import polars as pl

        grp = (
            pl.from_arrow(t)
            .unique()
            .group_by("band_key")
            .agg(pl.col("doc_id").sort().alias("ids"), pl.len().alias("n"))
            .filter(pl.col("n") >= 2)
        )
        a, b = [], []
        for ids in grp["ids"].to_list():
            arr = np.asarray(ids, dtype=np.int64)
            ai, bi = _upper_pairs(arr, max_bucket=max_bucket, label="minhash")
            a.append(arr[ai])
            b.append(arr[bi])
        a = np.concatenate(a) if a else np.empty(0, dtype=np.int64)
        b = np.concatenate(b) if b else np.empty(0, dtype=np.int64)
        return pa.table(
            {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
        )

    cand = bucket_group_apply(bands, "band_key", _pairs_bucket)

    # distinct pairs (a pair can collide in many bands); doc_a-bucketed so
    # a given pair always dedups inside one bucket
    def _distinct(t: pa.Table) -> pa.Table:
        import polars as pl

        return pl.from_arrow(t).unique().to_arrow().cast(
            pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
        )

    return bucket_group_apply(cand, "doc_a", _distinct)


def verify_jaccard_pairs(
    pairs: ray.data.Dataset,
    shingled: ray.data.Dataset,
    *,
    threshold: float,
) -> ray.data.Dataset:
    """Exact set-Jaccard verification of candidate pairs (J = |∩|/|∪|).

    Shingle sets travel through the joins as one ``\\x1f``-joined string
    per doc (hash joins don't take list-typed payload columns); shingles
    themselves never contain ``\\x1f`` (they're \\S+ tokens + spaces).

    The candidate pair set is normally ≪ the corpus, so the shingle side
    is SEMI-JOIN-reduced first: the candidate doc-id set is broadcast and
    each corpus batch filters to ids that appear in some pair before
    serialization — the joins then touch only candidate docs, not the
    whole corpus.
    """
    pairs = pairs.materialize()

    def _ser(t: pa.Table, side: str) -> pa.Table:
        return pa.table(
            {
                f"doc_{side}": t["doc_id"],
                f"sh_{side}": pc.binary_join(t["shingles"], "\x1f"),
            }
        )

    if pairs.count() <= 1_000_000:
        # FAST PATH: candidate ids fit on the driver → broadcast-filter
        # the corpus to candidate docs, broadcast their serialized shingle
        # sets once, and verify every pair in a single stateless map —
        # zero joins, zero actor pools.
        ptbl = dataset_to_table(pairs)
        ids = np.unique(
            np.concatenate(
                [
                    ptbl["doc_a"].to_numpy(zero_copy_only=False),
                    ptbl["doc_b"].to_numpy(zero_copy_only=False),
                ]
            )
            if ptbl.num_rows
            else np.empty(0, dtype=np.int64)
        )
        id_ref = ray.put(ids) if ray.is_initialized() else ids

        def _reduce_side(t: pa.Table) -> pa.Table:
            want = (
                ray.get(id_ref) if isinstance(id_ref, ray.ObjectRef) else id_ref
            )
            keep = np.isin(t["doc_id"].to_numpy(zero_copy_only=False), want)
            f = t.filter(pa.array(keep))
            return pa.table(
                {
                    "doc_id": f["doc_id"],
                    "sh": pc.binary_join(f["shingles"], "\x1f"),
                }
            )

        red = dataset_to_table(
            shingled.map_batches(
                _reduce_side, batch_format="pyarrow", zero_copy_batch=True
            ).materialize()
        )
        lut_ids = red["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(lut_ids)
        lut = (
            lut_ids[order],
            np.asarray(red["sh"].to_pylist(), dtype=object)[order],
        )
        lut_ref = ray.put(lut) if ray.is_initialized() else lut

        def _verify_direct(t: pa.Table) -> pa.Table:
            sids, sh = (
                ray.get(lut_ref)
                if isinstance(lut_ref, ray.ObjectRef)
                else lut_ref
            )
            a = t["doc_a"].to_numpy(zero_copy_only=False)
            b = t["doc_b"].to_numpy(zero_copy_only=False)
            ia = np.clip(np.searchsorted(sids, a), 0, max(len(sids) - 1, 0))
            ib = np.clip(np.searchsorted(sids, b), 0, max(len(sids) - 1, 0))
            if len(sids):
                ok = (sids[ia] == a) & (sids[ib] == b)  # ids not in the LUT
                a, b, ia, ib = a[ok], b[ok], ia[ok], ib[ok]
            keep_a, keep_b = [], []
            for da, db, x, y in zip(a, b, ia, ib):
                A = set(sh[x].split("\x1f")) if sh[x] else set()
                B = set(sh[y].split("\x1f")) if sh[y] else set()
                union = len(A | B)
                if union and len(A & B) / union >= threshold:
                    keep_a.append(da)
                    keep_b.append(db)
            return pa.table(
                {
                    "doc_a": pa.array(keep_a, pa.int64()),
                    "doc_b": pa.array(keep_b, pa.int64()),
                }
            )

        return pairs.map_batches(
            _verify_direct, batch_format="pyarrow", zero_copy_batch=True
        )

    # SCALE PATH: pair set too big for a driver-side id set — hash joins
    # of the serialized shingle table against the pairs (auto broadcast /
    # shuffle per side size)
    sh_a = shingled.map_batches(
        lambda t: _ser(t, "a"), batch_format="pyarrow", zero_copy_batch=True
    )
    sh_b = shingled.map_batches(
        lambda t: _ser(t, "b"), batch_format="pyarrow", zero_copy_batch=True
    )
    j = join_auto(pairs, sh_a, on=("doc_a",))
    j = join_auto(j, sh_b, on=("doc_b",))

    def _verify(t: pa.Table) -> pa.Table:
        keep_a, keep_b = [], []
        for da, db, sa, sb in zip(
            t["doc_a"].to_pylist(),
            t["doc_b"].to_pylist(),
            t["sh_a"].to_pylist(),
            t["sh_b"].to_pylist(),
        ):
            A = set(sa.split("\x1f")) if sa else set()
            B = set(sb.split("\x1f")) if sb else set()
            union = len(A | B)
            if union and len(A & B) / union >= threshold:
                keep_a.append(da)
                keep_b.append(db)
        return pa.table(
            {
                "doc_a": pa.array(keep_a, pa.int64()),
                "doc_b": pa.array(keep_b, pa.int64()),
            }
        )

    return j.map_batches(_verify, batch_format="pyarrow", zero_copy_batch=True)


def minhash_dedup_pairs(
    docs: ray.data.Dataset,
    *,
    threshold: float = 0.5,
    k: int = 3,
    num_perm: int = 128,
    rows_per_band: int = 2,
    max_bucket: int | None = None,
) -> ray.data.Dataset:
    """Full near-dup pipeline: shingle → MinHash → LSH bucket groupby →
    exact n-gram-Jaccard verify → (doc_a, doc_b) pairs with J ≥ threshold.

    At 128 perms / 2-row bands the probability of missing a pair AT the 0.5
    threshold is (1 - 0.5²)^64 ≈ 1e-8, vanishing further above it — the
    verified output equals the exact all-pairs answer for any corpus whose
    near-dup pairs sit above the threshold (the driver corpus' pairs are
    all ≥ 0.8).
    """
    shingled = shingle_docs(docs, k=k).materialize()
    cand = minhash_candidate_pairs(
        shingled,
        num_perm=num_perm,
        rows_per_band=rows_per_band,
        max_bucket=max_bucket,
    )
    return verify_jaccard_pairs(cand, shingled, threshold=threshold)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity join (inverted-index decomposition)
# ---------------------------------------------------------------------------


def _pair_intersection_counts(
    shingled: ray.data.Dataset,
    *,
    max_posting: int | None,
    label: str,
) -> ray.data.Dataset:
    """Shared core of the exact inverted-index similarity joins
    (:func:`ngram_jaccard_pairs`, :func:`containment_pairs`):
    shingle sets → (shingle_hash:int64, doc_id) postings → per-posting
    co-occurring (doc_a < doc_b) pairs → per-pair intersection counts
    ``(doc_a, doc_b, c)``. Only 16-byte int rows ever shuffle; hash
    collisions (2⁻⁶⁴) can only ADD counts, so any downstream filter on
    ``c`` keeps a superset of the true qualifying pairs — callers
    re-verify survivors against the exact string shingle sets."""

    def _postings(t: pa.Table) -> pa.Table:
        sh = t["shingles"].to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        hs = [textstats.shingle_hashes(s) for s in sh]
        keys = (
            np.concatenate(hs) if hs else np.empty(0, dtype=np.uint64)
        ).view(np.int64)
        dids = np.repeat(ids, [len(h) for h in hs])
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "doc_id": pa.array(dids, pa.int64()),
            }
        )

    postings = shingled.map_batches(
        _postings, batch_format="pyarrow", zero_copy_batch=True
    )

    def _pairs_bucket(t: pa.Table) -> pa.Table:
        import polars as pl

        grp = (
            pl.from_arrow(t)
            .group_by("key")
            .agg(pl.col("doc_id").sort().alias("ids"), pl.len().alias("n"))
            .filter(pl.col("n") >= 2)
        )
        a, b = [], []
        for ids in grp["ids"].to_list():
            arr = np.asarray(ids, dtype=np.int64)
            ai, bi = _upper_pairs(arr, max_bucket=max_posting, label=label)
            a.append(arr[ai])
            b.append(arr[bi])
        a = np.concatenate(a) if a else np.empty(0, dtype=np.int64)
        b = np.concatenate(b) if b else np.empty(0, dtype=np.int64)
        return pa.table(
            {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
        )

    co = bucket_group_apply(postings, "key", _pairs_bucket)

    def _count_pairs(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t)
            .group_by(["doc_a", "doc_b"])
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .to_arrow()
            .cast(
                pa.schema(
                    [
                        ("doc_a", pa.int64()),
                        ("doc_b", pa.int64()),
                        ("c", pa.int64()),
                    ]
                )
            )
        )

    return bucket_group_apply(co, "doc_a", _count_pairs)


def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    *,
    threshold: float = 0.5,
    k: int = 3,
    max_posting: int | None = None,
) -> ray.data.Dataset:
    """EXACT all-pairs n-gram Jaccard join → (doc_a, doc_b) with J ≥ t.

    Unlike :func:`minhash_dedup_pairs` (probabilistic recall), this is the
    exact similarity join via the classic inverted-index decomposition —
    never all-pairs over the corpus:

    1. shingle each doc (word k-grams, distinct);
    2. explode to (shingle_hash:int64, doc_id) postings — 16 bytes/row
       through the shuffle, never the shingle strings;
    3. bucket-shuffle by shingle hash; per posting list emit co-occurring
       (doc_a < doc_b) pairs (J > 0 ⇔ the docs share ≥ 1 shingle, so
       recall is exact);
    4. second bucket-shuffle by doc_a sums per-pair counts = |A ∩ B|
       (estimated via 64-bit hashes);
    5. J = c / (n_a + n_b − c) with TRUE per-doc shingle counts joined in;
    6. survivors re-verified against the exact string shingle sets
       (:func:`verify_jaccard_pairs`), so a 2⁻⁶⁴ hash collision can only
       cost a spurious candidate (removed), never a wrong survivor.

    Skew: a stop-shingle shared by millions of docs makes one posting list
    quadratic — ``max_posting`` bounds it with LOGGED truncation (an
    ultra-frequent shingle carries almost no similarity signal); default
    is exact, oversized lists are warned via BUCKET_WARN.
    """
    shingled = shingle_docs(docs, k=k).materialize()
    counts = _pair_intersection_counts(
        shingled, max_posting=max_posting, label="jaccard"
    )

    # per-doc TRUE shingle-set sizes. Broadcast (doc_id, n) when it fits;
    # at catalog scale fall back to hash joins — never a driver collect.
    sz = shingled.select_columns(["doc_id", "n_shingles"])
    if sz.count() <= BROADCAST_THRESHOLD_ROWS:
        sizes_tbl = dataset_to_table(sz)
        s_ids = sizes_tbl["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(s_ids)
        sizes = (
            s_ids[order],
            sizes_tbl["n_shingles"].to_numpy(zero_copy_only=False)[order],
        )
        sz_ref = ray.put(sizes) if ray.is_initialized() else sizes

        def _jfilter(t: pa.Table) -> pa.Table:
            ids, ns = (
                ray.get(sz_ref) if isinstance(sz_ref, ray.ObjectRef) else sz_ref
            )
            a = t["doc_a"].to_numpy(zero_copy_only=False)
            b = t["doc_b"].to_numpy(zero_copy_only=False)
            c = t["c"].to_numpy(zero_copy_only=False)
            na = ns[np.searchsorted(ids, a)]
            nb = ns[np.searchsorted(ids, b)]
            union = na + nb - c
            keep = (union > 0) & (c >= threshold * union)
            return pa.table(
                {
                    "doc_a": pa.array(a[keep], pa.int64()),
                    "doc_b": pa.array(b[keep], pa.int64()),
                }
            )

        cand = counts.map_batches(
            _jfilter, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        sz_a = sz.map_batches(
            lambda t: pa.table({"doc_a": t["doc_id"], "n_a": t["n_shingles"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        sz_b = sz.map_batches(
            lambda t: pa.table({"doc_b": t["doc_id"], "n_b": t["n_shingles"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        j = join_auto(counts, sz_a, on=("doc_a",))
        j = join_auto(j, sz_b, on=("doc_b",))

        def _jfilter_joined(t: pa.Table) -> pa.Table:
            c = t["c"].to_numpy(zero_copy_only=False)
            union = (
                t["n_a"].to_numpy(zero_copy_only=False)
                + t["n_b"].to_numpy(zero_copy_only=False)
                - c
            )
            keep = (union > 0) & (c >= threshold * union)
            f = t.filter(pa.array(keep))
            return f.select(["doc_a", "doc_b"])

        cand = j.map_batches(
            _jfilter_joined, batch_format="pyarrow", zero_copy_batch=True
        )
    return verify_jaccard_pairs(cand, shingled, threshold=threshold)


def containment_pairs(
    docs: ray.data.Dataset,
    *,
    threshold_num: int = 4,
    threshold_den: int = 5,
    k: int = 3,
    max_posting: int | None = None,
) -> ray.data.Dataset:
    """EXACT directed n-gram CONTAINMENT join → ``(doc_sub, doc_sup,
    inter, n_sub)`` where ``|sub ∩ sup| / |sub| ≥ num/den`` (default
    0.8) and sub ≠ sup.

    The asymmetric near-dup Jaccard misses: a short doc embedded in a
    long one (quote, excerpt, boilerplate wrapper, truncated re-crawl)
    has HIGH containment but LOW Jaccard because the union is dominated
    by the long side — the standard sub/superset-duplicate detector in
    LLM-corpus curation, run next to the symmetric Jaccard join.

    Same inverted-index decomposition as :func:`ngram_jaccard_pairs`
    (shared :func:`_pair_intersection_counts` core — int postings, no
    all-pairs); each undirected candidate then fans out to the
    directions whose side passes the EXACT integer cross-multiplication
    ``den·c ≥ num·n_sub`` (float-free, mirrors the SQL oracle), and
    survivors are re-verified against the exact string shingle sets so
    64-bit hash collisions can only cost a discarded candidate, never a
    wrong pair."""
    shingled = shingle_docs(docs, k=k).materialize()
    counts = _pair_intersection_counts(
        shingled, max_posting=max_posting, label="containment"
    )

    sz = shingled.select_columns(["doc_id", "n_shingles"])
    sz_a = sz.map_batches(
        lambda t: pa.table({"doc_a": t["doc_id"], "n_a": t["n_shingles"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    sz_b = sz.map_batches(
        lambda t: pa.table({"doc_b": t["doc_id"], "n_b": t["n_shingles"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j = join_auto(counts, sz_a, on=("doc_a",))
    j = join_auto(j, sz_b, on=("doc_b",))

    def _directed(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        na = t["n_a"].to_numpy(zero_copy_only=False)
        nb = t["n_b"].to_numpy(zero_copy_only=False)
        ka = (threshold_den * c >= threshold_num * na) & (na > 0)
        kb = (threshold_den * c >= threshold_num * nb) & (nb > 0)
        return pa.table(
            {
                "doc_sub": pa.array(
                    np.concatenate([a[ka], b[kb]]), pa.int64()
                ),
                "doc_sup": pa.array(
                    np.concatenate([b[ka], a[kb]]), pa.int64()
                ),
            }
        )

    cand = j.map_batches(
        _directed, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # exact re-verify on string shingle sets (broadcast fast path: the
    # candidate set is ≪ corpus; join fallback mirrors
    # verify_jaccard_pairs at catalog scale)
    ptbl = dataset_to_table(cand)
    ids = np.unique(
        np.concatenate(
            [
                ptbl["doc_sub"].to_numpy(zero_copy_only=False),
                ptbl["doc_sup"].to_numpy(zero_copy_only=False),
            ]
        )
        if ptbl.num_rows
        else np.empty(0, dtype=np.int64)
    )
    id_ref = ray.put(ids) if ray.is_initialized() else ids

    def _reduce_side(t: pa.Table) -> pa.Table:
        want = ray.get(id_ref) if isinstance(id_ref, ray.ObjectRef) else id_ref
        keep = np.isin(t["doc_id"].to_numpy(zero_copy_only=False), want)
        f = t.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": f["doc_id"],
                "sh": pc.binary_join(f["shingles"], "\x1f"),
            }
        )

    side = dataset_to_table(
        shingled.map_batches(
            _reduce_side, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    sets = {
        i: frozenset(s.split("\x1f")) if s else frozenset()
        for i, s in zip(
            side["doc_id"].to_pylist(), side["sh"].to_pylist()
        )
    }
    sets_ref = ray.put(sets) if ray.is_initialized() else sets

    def _verify(t: pa.Table) -> pa.Table:
        ss = ray.get(sets_ref) if isinstance(sets_ref, ray.ObjectRef) else sets_ref
        subs = t["doc_sub"].to_pylist()
        sups = t["doc_sup"].to_pylist()
        out_sub, out_sup, out_c, out_n = [], [], [], []
        for s_id, p_id in zip(subs, sups):
            a, b = ss.get(s_id, frozenset()), ss.get(p_id, frozenset())
            c = len(a & b)
            if a and threshold_den * c >= threshold_num * len(a):
                out_sub.append(s_id)
                out_sup.append(p_id)
                out_c.append(c)
                out_n.append(len(a))
        return pa.table(
            {
                "doc_sub": pa.array(out_sub, pa.int64()),
                "doc_sup": pa.array(out_sup, pa.int64()),
                "inter": pa.array(out_c, pa.int64()),
                "n_sub": pa.array(out_n, pa.int64()),
            }
        )

    return cand.map_batches(
        _verify, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["doc_sub", "doc_sup"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    def _sh(t: pa.Table) -> pa.Table:
        sig = textstats.simhash64(t["text"].to_pylist())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": pa.array(sig.astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(_sh, batch_format="pyarrow", zero_copy_batch=True)


def simhash_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Keep-first per identical 64-bit SimHash → (doc_id, n_dups)."""
    fp = simhash_fingerprints(docs)
    agg = fp.groupby("simhash").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups")
    )
    return agg.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "n_dups": pc.cast(t["n_dups"], pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def simhash_near_pairs(
    docs: ray.data.Dataset, *, max_hamming: int = 3, max_bucket: int | None = None
) -> ray.data.Dataset:
    """Near-dup (doc_a, doc_b, hamming) pairs with hamming ≤ max_hamming.

    Blocking: 4 × 16-bit bands — any pair within hamming ≤ 3 matches on at
    least one band (pigeonhole), so candidate generation is exact; each
    band-equal bucket is a groupby, pairs verified by true popcount.
    """
    fp = simhash_fingerprints(docs)

    def _bands(t: pa.Table) -> pa.Table:
        # int64 band keys (band_idx << 16 | 16-bit slice), fully vectorized
        sim = np.array(t["simhash"].to_pylist(), dtype=np.int64).view(np.uint64)
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        keys = np.concatenate(
            [
                (
                    ((sim >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(
                        np.int64
                    )
                    | (b << 16)
                )
                for b in range(4)
            ]
        )
        return pa.table(
            {
                "band_key": pa.array(keys, pa.int64()),
                "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
                "simhash": pa.array(
                    np.tile(sim, 4).view(np.int64), pa.int64()
                ),
            }
        )

    bands = fp.map_batches(_bands, batch_format="pyarrow", zero_copy_batch=True)

    def _pairs_bucket(t: pa.Table) -> pa.Table:
        import polars as pl

        grp = (
            pl.from_arrow(t)
            .unique()
            .group_by("band_key")
            .agg(
                pl.struct(["doc_id", "simhash"]).sort().alias("rows"),
                pl.len().alias("n"),
            )
            .filter(pl.col("n") >= 2)
        )
        a, b, hd = [], [], []
        for rows in grp["rows"].to_list():
            ids = np.array([r["doc_id"] for r in rows], dtype=np.int64)
            sims = np.array([r["simhash"] for r in rows], dtype=np.int64).view(
                np.uint64
            )
            ai, bi = _upper_pairs(ids, max_bucket=max_bucket, label="simhash")
            if not len(ai):
                continue
            h = textstats.hamming64(sims[ai], sims[bi])
            keep = (h <= max_hamming) & (ids[ai] != ids[bi])
            a.append(ids[ai][keep])
            b.append(ids[bi][keep])
            hd.append(h[keep].astype(np.int64))
        a = np.concatenate(a) if a else np.empty(0, dtype=np.int64)
        b = np.concatenate(b) if b else np.empty(0, dtype=np.int64)
        hd = np.concatenate(hd) if hd else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "hamming": pa.array(hd, pa.int64()),
            }
        )

    cand = bucket_group_apply(bands, "band_key", _pairs_bucket)

    def _min_h(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t)
            .group_by(["doc_a", "doc_b"])
            .agg(pl.col("hamming").min())
            .to_arrow()
            .cast(
                pa.schema(
                    [("doc_a", pa.int64()), ("doc_b", pa.int64()),
                     ("hamming", pa.int64())]
                )
            )
        )

    return bucket_group_apply(cand, "doc_a", _min_h)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def _normalized_matrix(emb: ray.data.Dataset) -> tuple[np.ndarray, np.ndarray]:
    """Materialize (vec_ids, L2-normalized float64 matrix) — broadcast side."""
    t = dataset_to_table(emb.select_columns(["vec_id", "embedding"]))
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, m / norms


def embedding_dup_pairs(
    emb: ray.data.Dataset, *, threshold: float = 0.8
) -> ray.data.Dataset:
    """Exact brute-force cosine near-dup: (vec_a < vec_b, cos ≥ threshold).

    The right side is broadcast once (``ray.put``); each batch does one
    float64 matmul against it — the documented exact baseline. For corpora
    whose normalized matrix exceeds worker memory use
    :func:`embedding_dup_pairs_lsh`.
    """
    emb = emb.materialize()
    ids, mat = _normalized_matrix(emb)
    ref = ray.put((ids, mat)) if ray.is_initialized() else (ids, mat)

    def _scan(t: pa.Table) -> pa.Table:
        rids, rmat = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        q = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        q = q / qn
        qids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        scores = q @ rmat.T  # (B, N)
        bi, ni = np.nonzero(scores >= threshold)
        a, b = qids[bi], rids[ni]
        keep = a < b  # dedup + self-pair removal
        return pa.table(
            {
                "vec_a": pa.array(a[keep], pa.int64()),
                "vec_b": pa.array(b[keep], pa.int64()),
            }
        )

    return emb.map_batches(_scan, batch_format="pyarrow", zero_copy_batch=True)


def embedding_dup_pairs_lsh(
    emb: ray.data.Dataset,
    *,
    threshold: float = 0.8,
    n_planes: int = 6,
    n_tables: int = 32,
    seed: int = 11,
    num_buckets: int = 64,
    max_bucket: int | None = None,
) -> ray.data.Dataset:
    """Scale path: multi-table random-hyperplane LSH candidate generation +
    exact-cosine verification via joins. Approximate (a pair missed by all
    ``n_tables`` tables is lost) — hence rows-only in the driver contract.

    Dataflow (never ships the embedding matrix through the LSH shuffle):

    1. map: per table ``l``, bucket key = ``l·2^b + bits`` from that
       table's ``b = n_planes`` hyperplanes → (bucket, vec_id) INT rows;
    2. ``bucket_group_apply(bucket)`` → candidate pairs, exact pair-gen
       with logged/capped oversized buckets (:func:`_upper_pairs`);
    3. distinct pairs (a pair can collide in many tables);
    4. verify: join each side's embedding (serialized float64 bytes — hash
       joins don't take list columns) and keep exact cosine ≥ threshold.

    Recall = 1 − (1 − p^b)^L with p = 1 − θ/π: defaults (b=6, L=32) give
    ≈0.92 at cos 0.45 and ≈0.999 at cos 0.8; raise ``n_planes`` at high
    thresholds to prune harder.

    EXACT end to end since r4: hyperplanes are md5-derived ±1 sign
    vectors (the embed_rp construction — signed random projection is
    the classic SimHash hyperplane family), coordinates quantize once to
    int64 (``floor(x·1000 + 0.5)``), so every signature bit is the sign
    of an INTEGER dot product, and the cosine verification is the
    cross-multiplied integer rule ``den²·dot² ≥ num²·‖a‖²‖b‖²`` (with
    threshold as an exact fraction) — no float anywhere a reduction
    order or a boundary ulp could flip, which is what makes the driver
    oracle replay the candidate set AND the verification exactly.
    """
    from fractions import Fraction

    from ..schema import md5_60

    QUANT = 1000
    frac = Fraction(str(threshold))
    t_num, t_den = frac.numerator, frac.denominator

    def _sig(t: pa.Table) -> pa.Table:
        q = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        nrows = len(t)
        if not nrows:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                }
            )
        dim = q.shape[1]
        cols = n_planes * n_tables
        signs = 1 - 2 * (
            md5_60(
                [
                    f"{seed}:{c}:{d}"
                    for d in range(dim)
                    for c in range(cols)
                ]
            )
            % 2
        )
        planes = signs.reshape(dim, cols).astype(np.int64)
        qi = np.floor(q * QUANT + 0.5).astype(np.int64)
        bits = (qi @ planes) > 0  # (n, b*L) — integer dot, exact sign
        bits = bits.reshape(nrows, n_tables, n_planes)
        keys = (bits * (1 << np.arange(n_planes))).sum(axis=2)  # (n, L)
        keys = keys + (np.arange(n_tables) << n_planes)[None, :]
        ids = np.repeat(
            np.asarray(t["vec_id"].to_pylist(), dtype=np.int64), n_tables
        )
        return pa.table(
            {
                "bucket": pa.array(keys.reshape(-1), pa.int64()),
                "vec_id": pa.array(ids, pa.int64()),
            }
        )

    bucketed = emb.map_batches(_sig, batch_format="pyarrow", zero_copy_batch=True)

    def _pairs_bucket(t: pa.Table) -> pa.Table:
        import polars as pl

        grp = (
            pl.from_arrow(t)
            .unique()
            .group_by("bucket")
            .agg(pl.col("vec_id").sort().alias("ids"), pl.len().alias("n"))
            .filter(pl.col("n") >= 2)
        )
        a, b = [], []
        for ids in grp["ids"].to_list():
            arr = np.asarray(ids, dtype=np.int64)
            ai, bi = _upper_pairs(arr, max_bucket=max_bucket, label="emb-lsh")
            a.append(arr[ai])
            b.append(arr[bi])
        a = np.concatenate(a) if a else np.empty(0, dtype=np.int64)
        b = np.concatenate(b) if b else np.empty(0, dtype=np.int64)
        return pa.table(
            {"vec_a": pa.array(a, pa.int64()), "vec_b": pa.array(b, pa.int64())}
        )

    cand = bucket_group_apply(
        bucketed, "bucket", _pairs_bucket, num_buckets=num_buckets
    )

    def _distinct(t: pa.Table) -> pa.Table:
        import polars as pl

        return pl.from_arrow(t).unique().to_arrow().cast(
            pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])
        )

    cand = bucket_group_apply(cand, "vec_a", _distinct, num_buckets=num_buckets)

    def _ser(t: pa.Table, side: str) -> pa.Table:
        m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        mi = np.floor(m * QUANT + 0.5).astype(np.int64)
        return pa.table(
            {
                f"vec_{side}": t["vec_id"],
                f"e_{side}": pa.array(
                    [row.tobytes() for row in mi], pa.binary()
                ),
            }
        )

    e_a = emb.map_batches(
        lambda t: _ser(t, "a"), batch_format="pyarrow", zero_copy_batch=True
    )
    e_b = emb.map_batches(
        lambda t: _ser(t, "b"), batch_format="pyarrow", zero_copy_batch=True
    )
    j = join_auto(cand, e_a, on=("vec_a",))
    j = join_auto(j, e_b, on=("vec_b",))

    def _verify(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table(
                {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
            )
        ea = np.frombuffer(b"".join(t["e_a"].to_pylist()), dtype=np.int64)
        eb = np.frombuffer(b"".join(t["e_b"].to_pylist()), dtype=np.int64)
        ea = ea.reshape(len(t), -1)
        eb = eb.reshape(len(t), -1)
        # cos ≥ num/den ⟺ dot ≥ 0 ∧ den²·dot² ≥ num²·‖a‖²‖b‖² — int64
        # at QUANT=1000 for the DEFAULT thresholds (dot ≤ 64·530² ≈
        # 1.8e7; den²·dot² ≲ 1.3e17), but threshold is a public float
        # knob and a fine-grained Fraction denominator (e.g. 0.405 →
        # den=200 → 4e4·(1.8e7)² > 2⁶³) silently WRAPS int64 and flips
        # verdicts — promote to Python big ints whenever the worst case
        # of either side doesn't provably fit (ADVICE r4 medium)
        dot = np.einsum("ij,ij->i", ea, eb)
        na = np.einsum("ij,ij->i", ea, ea)
        nb = np.einsum("ij,ij->i", eb, eb)
        lhs_max = t_den * t_den * int(np.abs(dot).max(initial=0)) ** 2
        rhs_max = t_num * t_num * int(na.max(initial=0)) * int(
            nb.max(initial=0)
        )
        if max(lhs_max, rhs_max) < 2**63:
            bound_ok = t_den * t_den * dot * dot >= t_num * t_num * na * nb
        else:
            do, nao, nbo = (
                x.astype(object) for x in (dot, na, nb)
            )  # elementwise Python-int arithmetic: exact, no wrap
            bound_ok = (
                (t_den * t_den * do * do >= t_num * t_num * nao * nbo)
                .astype(bool)
            )
        keep = pa.array((na > 0) & (nb > 0) & (dot >= 0) & bound_ok)
        out = t.filter(keep)
        return pa.table({"vec_a": out["vec_a"], "vec_b": out["vec_b"]})

    return j.map_batches(_verify, batch_format="pyarrow", zero_copy_batch=True)


def dedup_apply(
    docs: ray.data.Dataset,
    pairs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("doc_a", "doc_b"),
    num_buckets: int = 32,
    broadcast_threshold: int = BROADCAST_THRESHOLD_ROWS,
) -> ray.data.Dataset:
    """Materialize the DEDUPLICATED corpus from a near-dup pair set — the
    step a training-data pipeline actually consumes: connected components
    over the pair graph (transitive closure: a~b, b~c ⇒ one cluster),
    survivor = min id per component, everything else dropped.

    Scale shape: CC runs only on the pair graph (nodes = docs that appear
    in ANY pair — a small fraction of the corpus); the drop set is
    ``members - survivors``, broadcast to a stateless filter when small
    (the common case), else removed with a co-bucketed hash anti-join —
    the corpus itself never shuffles in either path.
    """
    a, b = pair_cols

    pairs = pairs.materialize()  # consumed twice: count guard + edges
    if pairs.count() == 0:
        # clean corpus: nothing to merge, nothing to drop — and an empty
        # edge Dataset would materialize as 0-column blocks downstream
        return docs

    edges = pairs.map_batches(
        lambda t: pa.table({"src": t[a], "dst": t[b]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from .canonical import connected_components

    labels = connected_components(edges)
    dropped = labels.filter(expr="node != label").select_columns(["node"])

    if dropped.count() <= broadcast_threshold:
        drop_ref = ray.put(
            pa.concat_tables(
                [ray.get(r) for r in dropped.to_arrow_refs()],
                promote_options="default",
            )["node"].combine_chunks()
        )

        def _filter(t: pa.Table, ref=drop_ref) -> pa.Table:
            drop = ray.get(ref)
            return t.filter(
                pc.invert(pc.is_in(t[id_col].combine_chunks(), value_set=drop))
            )

        return docs.map_batches(
            _filter, batch_format="pyarrow", zero_copy_batch=True
        )

    # catalog-scale drop set: co-bucketed anti-join, corpus never sorted
    import polars as pl

    from ..functions.shuffle import cobucket_apply

    def _anti(dt: pa.Table, rt: pa.Table) -> pa.Table:
        ddf = pl.from_arrow(dt)
        rdf = pl.from_arrow(rt).rename({"node": id_col})
        return ddf.join(rdf, on=id_col, how="anti").to_arrow().cast(dt.schema)

    return cobucket_apply(
        docs,
        dropped,
        lambda t: t[id_col].combine_chunks(),
        lambda t: t["node"].combine_chunks(),
        _anti,
        num_buckets=num_buckets,
    )


# --- fuzzy (edit-distance) matching -----------------------------------------


def _dist_le1(a: str, b: str) -> int | None:
    """Exact Levenshtein distance IF ≤ 1 else None — O(len), no DP table
    (the bounded-distance check a verify pass needs; SQL mirror is
    ``levenshtein(a,b) <= 1``)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    d = la - lb
    if d > 1 or d < -1:
        return None
    if d == 0:  # one substitution?
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return None
                seen = True
        return 1
    if d > 0:  # make a the shorter
        a, b, la = b, a, lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1 :] else None


def fuzzy_match_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    col: str,
    num_buckets: int = 32,
    max_bucket: int | None = None,
) -> ray.data.Dataset:
    """Edit-distance ≤ 1 similarity SELF-join → (id_a, id_b, dist) with
    id_a < id_b — the fuzzy alias/entity matcher (typo'd surface forms,
    OCR slips) a KG-construction pipeline runs over its surface
    dictionary. SQL mirror: ``levenshtein(a, b) <= 1`` over a self-join.

    SymSpell deletion-neighborhood decomposition — never all-pairs:

    1. each string emits itself + every 1-deletion variant as an int64
       hash posting (key, id) — strings never enter the shuffle;
    2. bucket by key; co-posted ids become candidate pairs (complete for
       d ≤ 1: equal strings share themselves; ins/del pairs share the
       shorter string; substitution pairs share the deletion at the
       differing position);
    3. pairs dedup on a second int-keyed shuffle (a pair can share
       several variants);
    4. names join back via ``join_auto`` (broadcast small / co-bucketed
       big) and an exact O(len) bounded-distance check keeps true pairs —
       a hash collision can only add a candidate, never a survivor.

    Skew: a hub variant shared by g strings emits g²/2 candidates;
    ``max_bucket`` bounds it with LOGGED truncation (default exact)."""
    from ..schema import stable_hash64

    names = ds.select_columns([id_col, col]).materialize()

    def _postings(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        strs = t[col].to_pylist()
        out_s, out_i = [], []
        for i, s in zip(ids, strs):
            vs = {s}
            for j in range(len(s)):
                vs.add(s[:j] + s[j + 1 :])
            out_s.extend(vs)
            out_i.extend([i] * len(vs))
        keys = stable_hash64(np.asarray(out_s, dtype=object)).view(np.int64)
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "doc_id": pa.array(np.asarray(out_i, dtype=np.int64)),
            }
        )

    postings = names.map_batches(
        _postings, batch_format="pyarrow", zero_copy_batch=True
    )

    def _pairs_bucket(t: pa.Table) -> pa.Table:
        import polars as pl

        grp = (
            pl.from_arrow(t)
            .group_by("key")
            .agg(pl.col("doc_id").sort().alias("ids"), pl.len().alias("n"))
            .filter(pl.col("n") >= 2)
        )
        a, b = [], []
        for ids in grp["ids"].to_list():
            arr = np.unique(np.asarray(ids, dtype=np.int64))
            ai, bi = _upper_pairs(arr, max_bucket=max_bucket, label="fuzzy")
            a.append(arr[ai])
            b.append(arr[bi])
        a = np.concatenate(a) if a else np.empty(0, dtype=np.int64)
        b = np.concatenate(b) if b else np.empty(0, dtype=np.int64)
        return pa.table(
            {"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())}
        )

    cand = bucket_group_apply(
        postings, "key", _pairs_bucket, num_buckets=num_buckets
    )

    def _dedup(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t).unique(["id_a", "id_b"]).to_arrow().cast(
                pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
            )
        )

    cand = bucket_group_apply(cand, "id_a", _dedup, num_buckets=num_buckets)

    # join_auto renames the right key onto the left key, so each join
    # contributes exactly one extra column: the name
    with_a = join_auto(
        cand, names, on=("id_a",), right_on=(id_col,), num_partitions=num_buckets
    ).map_batches(
        lambda t: t.rename_columns(
            ["name_a" if c == col else c for c in t.schema.names]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    with_b = join_auto(
        with_a, names, on=("id_b",), right_on=(id_col,), num_partitions=num_buckets
    )

    def _verify(t: pa.Table) -> pa.Table:
        ida = t["id_a"].to_pylist()
        idb = t["id_b"].to_pylist()
        na = t["name_a"].to_pylist()
        nb = t[col].to_pylist()
        oa, ob, od = [], [], []
        for i, j, x, y in zip(ida, idb, na, nb):
            d = _dist_le1(x, y)
            if d is not None:
                oa.append(i)
                ob.append(j)
                od.append(d)
        return pa.table(
            {
                "id_a": pa.array(oa, pa.int64()),
                "id_b": pa.array(ob, pa.int64()),
                "dist": pa.array(od, pa.int64()),
            }
        )

    return with_b.map_batches(
        _verify, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# incremental (cross-corpus) near-dup join
# ---------------------------------------------------------------------------


def minhash_cross_pairs(
    old_docs: ray.data.Dataset,
    new_docs: ray.data.Dataset,
    *,
    threshold: float = 0.5,
    k: int = 3,
    num_perm: int = 128,
    rows_per_band: int = 2,
    max_bucket: int | None = None,
) -> ray.data.Dataset:
    """Incremental dedup: near-dups of NEW docs against the OLD corpus —
    ``(doc_a, doc_b)`` with ``doc_a`` old, ``doc_b`` new, exact-Jaccard
    verified at ``threshold``. Old–old and new–new pairs are NEVER
    generated: the per-band pair space is g_old × g_new, not C(g, 2) —
    the production shape of continuous ingestion, where the old corpus'
    band keys are the standing index and each arriving shard only joins
    buckets against it (never re-pairs history with itself).

    Doc ids must be globally unique across the two sides (same contract
    as any cross-corpus key join)."""
    import polars as pl

    from ..functions import textstats

    sh_old = shingle_docs(old_docs, k=k).materialize()
    sh_new = shingle_docs(new_docs, k=k).materialize()

    def _bands_side(side: int):
        def _f(t: pa.Table) -> pa.Table:
            sh = t["shingles"].to_pylist()
            ids = t["doc_id"].to_pylist()
            keep = [i for i, s in enumerate(sh) if s]
            sh = [sh[i] for i in keep]
            ids = [ids[i] for i in keep]
            sigs = textstats.minhash_signatures(
                sh, num_perm=num_perm, seed=7
            )
            b = _band_keys(sigs, ids, rows_per_band)
            return b.append_column(
                "side", pa.array([side] * b.num_rows, pa.int64())
            )

        return _f

    bands = sh_old.map_batches(
        _bands_side(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        sh_new.map_batches(
            _bands_side(1), batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def _cross_bucket(t: pa.Table) -> pa.Table:
        grp = (
            pl.from_arrow(t)
            .unique()
            .group_by("band_key")
            .agg(
                pl.col("doc_id").filter(pl.col("side") == 0).alias("old"),
                pl.col("doc_id").filter(pl.col("side") == 1).alias("new"),
            )
            .filter((pl.col("old").list.len() > 0) & (pl.col("new").list.len() > 0))
        )
        a, b = [], []
        for olds, news in zip(grp["old"].to_list(), grp["new"].to_list()):
            o = np.unique(np.asarray(olds, dtype=np.int64))
            n = np.unique(np.asarray(news, dtype=np.int64))
            if max_bucket and len(o) * len(n) > max_bucket:
                log.warning(
                    "cross bucket truncated: %d x %d > max_bucket=%d",
                    len(o), len(n), max_bucket,
                )
                o = o[: max(1, max_bucket // max(len(n), 1))]
            a.append(np.repeat(o, len(n)))
            b.append(np.tile(n, len(o)))
        a = np.concatenate(a) if a else np.empty(0, dtype=np.int64)
        b = np.concatenate(b) if b else np.empty(0, dtype=np.int64)
        return pa.table(
            {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
        )

    cand = bucket_group_apply(bands, "band_key", _cross_bucket)

    def _distinct(t: pa.Table) -> pa.Table:
        return pl.from_arrow(t).unique().to_arrow().cast(
            pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
        )

    cand = bucket_group_apply(cand, "doc_a", _distinct)
    return verify_jaccard_pairs(
        cand, sh_old.union(sh_new), threshold=threshold
    )


CLUSTER_SIZES = pa.schema(
    [("cluster_size", pa.int64()), ("n_clusters", pa.int64())]
)


def dedup_cluster_sizes(
    pairs: ray.data.Dataset,
    *,
    pair_cols: tuple[str, str] = ("doc_a", "doc_b"),
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Near-dup cluster-size histogram: ``(cluster_size, n_clusters)``
    over the connected components of the pair graph — the curation
    diagnostic that distinguishes "dedup is trimming isolated pairs"
    from "one boilerplate template collapsed half the crawl" (the giant
    clusters are where aggressive keep-one dedup silently deletes
    coverage, so they get eyeballed before `dedup_apply` runs).

    Scale shape: CC runs on the pair graph only (nodes = docs appearing
    in ≥1 pair); sizes are one label-bucketed count shuffle over the
    (node, label) int64 table — each label lands in exactly one bucket,
    so per-label counts are final, not partial — and the histogram is a
    second tiny shuffle over the distinct sizes. The corpus itself is
    never read, let alone shuffled.
    """
    import polars as pl

    from ..functions.shuffle import bucket_group_apply
    from .canonical import connected_components

    a, b = pair_cols
    pairs = pairs.materialize()  # count guard + edge build
    if pairs.count() == 0:
        return ray.data.from_arrow(CLUSTER_SIZES.empty_table())

    edges = pairs.map_batches(
        lambda t: pa.table({"src": t[a], "dst": t[b]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    labels = connected_components(edges).select_columns(["label"])

    def _sizes(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by("label")
            .agg(pl.len().cast(pl.Int64).alias("cluster_size"))
            .to_arrow()
        )

    sizes = bucket_group_apply(labels, "label", _sizes, num_buckets=num_buckets)

    def _hist(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by("cluster_size")
            .agg(pl.len().cast(pl.Int64).alias("n_clusters"))
            .select(["cluster_size", "n_clusters"])
            .to_arrow()
            .cast(CLUSTER_SIZES)
        )

    return bucket_group_apply(
        sizes.select_columns(["cluster_size"]),
        "cluster_size",
        _hist,
        num_buckets=4,
    )


def minhash_blocking_stats(
    docs: ray.data.Dataset,
    *,
    threshold: float = 0.5,
    k: int = 3,
    num_perm: int = 128,
    rows_per_band: int = 2,
    max_bucket: int | None = None,
) -> ray.data.Dataset:
    """Blocking-quality report for the MinHash+LSH pipeline — the two
    numbers every entity-resolution / dedup deployment tunes against,
    as ONE exact-integer row:

    - ``reduction_ppm``: candidate pairs as ppm of all n·(n-1)/2
      pairs — how much work LSH saved vs the quadratic join (lower is
      better; the blocking literature's reduction ratio);
    - ``precision_ppm``: verified pairs as ppm of candidates — how
      much of the shuffled candidate volume was real (higher is
      better; low precision means bands are too wide for the corpus).

    Pure reuse of the verified pipeline stages (`shingle_docs` →
    `minhash_candidate_pairs` → `verify_jaccard_pairs`); the three
    counts are streamed Dataset counts, nothing new materializes on
    the driver. Rows-only by design: the candidate set depends on the
    MinHash permutations, which have no SQL mirror (the VERIFIED set
    does — that is the dedup_minhash query)."""
    shingled = shingle_docs(docs, k=k).materialize()
    cand = minhash_candidate_pairs(
        shingled,
        num_perm=num_perm,
        rows_per_band=rows_per_band,
        max_bucket=max_bucket,
    ).materialize()
    verified = verify_jaccard_pairs(cand, shingled, threshold=threshold)
    n_docs = docs.count()
    n_cand = cand.count()
    n_ver = verified.count()
    total_pairs = n_docs * (n_docs - 1) // 2
    return ray.data.from_arrow(
        pa.table(
            {
                "n_docs": pa.array([n_docs], pa.int64()),
                "n_candidate_pairs": pa.array([n_cand], pa.int64()),
                "n_verified_pairs": pa.array([n_ver], pa.int64()),
                "reduction_ppm": pa.array(
                    [n_cand * 1_000_000 // total_pairs if total_pairs else 0],
                    pa.int64(),
                ),
                "precision_ppm": pa.array(
                    [n_ver * 1_000_000 // n_cand if n_cand else 0],
                    pa.int64(),
                ),
            }
        )
    )
