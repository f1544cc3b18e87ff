"""Corpus-curation operators: benchmark decontamination, regex redaction
and vocabulary encoding — the remaining standard stages of an LLM
training-data pipeline (driver brief: text analysis / training-data ops
are first-class alongside the KG pipeline).

Decontamination (the "remove test-set overlap" step every pretraining
corpus runs): the benchmark side is small by nature (eval sets are
O(10^3..10^5) docs even when the corpus is 100 TB), so its distinct
word-n-gram set is built distributed, collected once under an explicit
size guard, and BROADCAST via ``ray.put`` — the corpus side then streams
through a stateless ``map_batches`` membership scan; the corpus never
shuffles and the gram set ships to each worker once (plasma-cached), not
per batch.

Redaction is a pure vectorized polars kernel (regex replace + match
count); vocabulary encoding composes the distributed token-count top-k
(one partial-counts shuffle) with a broadcast membership encode.

All outputs are integer/string columns mirrored 1:1 by DuckDB oracle SQL
(`__ray_entry__.oracle_sql`): tokens are maximal ``\\S+`` runs, n-grams
are space-joined, vocab ties break on (count desc, token asc).
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from ..functions import textstats
from ..functions.shuffle import bucket_group_apply
from .linker import default_pool_size

# eval benchmarks are small; 50M distinct grams ≈ 4 GB of strings is the
# most a sane broadcast should carry — beyond that, fail loudly rather
# than OOM the driver (the alternative at that size is a co-bucketed
# semi-join on gram hash, same shape as dedup.ngram_jaccard_pairs)
MAX_BENCH_GRAMS = 50_000_000

_TOKEN_COUNT_SCHEMA = pa.schema(
    [
        ("token", pa.string()),
        ("n_occurrences", pa.int64()),
        ("n_docs", pa.int64()),
    ]
)


def token_counts(docs: ray.data.Dataset, k: int = 100) -> ray.data.Dataset:
    """Corpus token frequencies, top-k by (count desc, token asc) —
    vocabulary building. Per-block partial counts (combiner) → one
    token-bucketed merge shuffle → global top-k. The shuffle moves one
    row per (block, distinct token), never the corpus."""

    def _partial(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t.select(["doc_id", "text"]))
        ex = (
            df.select(
                pl.col("doc_id"),
                pl.col("text").str.extract_all(r"\S+").alias("token"),
            )
            .explode("token")
            .drop_nulls("token")
        )
        # n_docs sums exactly across blocks: a doc is one row, so all its
        # tokens land in one block's partial
        per = ex.group_by("token").agg(
            pl.len().alias("n_occurrences"),
            pl.col("doc_id").n_unique().alias("n_docs"),
        )
        return per.to_arrow().cast(_TOKEN_COUNT_SCHEMA)

    partials = docs.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t)
            .group_by("token")
            .agg(pl.col("n_occurrences").sum(), pl.col("n_docs").sum())
            .to_arrow()
            .cast(_TOKEN_COUNT_SCHEMA)
        )

    agg = bucket_group_apply(partials, "token", _merge, num_buckets=32)
    return agg.sort(
        ["n_occurrences", "token"], descending=[True, False]
    ).limit(k)


def ngram_counts(
    docs: ray.data.Dataset, *, n: int = 2, k: int = 100
) -> ray.data.Dataset:
    """Corpus word-n-gram frequencies, top-k by (count desc, gram asc) —
    the phrase-vocabulary / collocation-mining counterpart of
    ``token_counts``, same combiner → one-bucket-merge-shuffle shape:
    one row per (block, distinct gram) moves, never the corpus.

    Grams are built vectorized: explode whitespace tokens (order
    preserved), then ``shift(-i).over(doc_id)`` joins each token with its
    i-th successor — no Python loop over rows. A doc's grams all land in
    one block's partial, so per-gram ``n_docs`` partials sum exactly."""

    def _partial(t: pa.Table) -> pa.Table:
        import polars as pl

        toks = (
            pl.from_arrow(t.select(["doc_id", "text"]))
            .select(
                pl.col("doc_id"),
                pl.col("text").str.extract_all(r"\S+").alias("tok"),
            )
            .explode("tok")
            .drop_nulls("tok")
        )
        cols = [pl.col("tok")]
        for i in range(1, n):
            cols.append(pl.col("tok").shift(-i).over("doc_id"))
        grams = toks.with_columns(
            pl.concat_str(cols, separator=" ").alias("gram")
        ).drop_nulls("gram")
        per = grams.group_by("gram").agg(
            pl.len().alias("n_occurrences"),
            pl.col("doc_id").n_unique().alias("n_docs"),
        )
        return per.select(["gram", "n_occurrences", "n_docs"]).to_arrow()

    partials = docs.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t)
            .group_by("gram")
            .agg(pl.col("n_occurrences").sum(), pl.col("n_docs").sum())
            .to_arrow()
        )

    agg = bucket_group_apply(partials, "gram", _merge, num_buckets=32)
    return agg.sort(
        ["n_occurrences", "gram"], descending=[True, False]
    ).limit(k)


# GPT-2-family pretokenizer shape, minus the lookahead RE2/rust-regex lack:
# contraction suffixes | space-prefixed letter runs | space-prefixed digit
# runs | space-prefixed punctuation runs | whitespace runs. Verified to
# produce IDENTICAL token sequences in polars (rust regex) and DuckDB (RE2)
# across Unicode/empty/contraction corners — the oracle contract.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_counts_bpe(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc token counting under a BPE-ish pretokenizer regex
    (subword-tokenizer cost estimation: the unit a BPE merge table would
    consume) → (doc_id, n_bpe_tokens, n_bpe_distinct, n_ws_tokens).
    Stateless vectorized kernel; no shuffle."""

    def _c(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t.select(["doc_id", "text"]))
        bpe = pl.col("text").str.extract_all(BPE_PATTERN)
        out = df.select(
            pl.col("doc_id"),
            bpe.list.len().cast(pl.Int64).alias("n_bpe_tokens"),
            bpe.list.n_unique().cast(pl.Int64).alias("n_bpe_distinct"),
            pl.col("text")
            .str.extract_all(r"\S+")
            .list.len()
            .cast(pl.Int64)
            .alias("n_ws_tokens"),
        )
        return out.to_arrow()

    return docs.map_batches(_c, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def _gram_set_ref(bench: ray.data.Dataset, n: int) -> "ray.ObjectRef":
    """Distinct word-n-gram set of the benchmark side, built distributed
    (per-block distinct via the same shingle kernel the scan uses), then
    collected under MAX_BENCH_GRAMS and broadcast once via ``ray.put``."""

    def _grams(t: pa.Table) -> pa.Table:
        out: set[str] = set()
        for x in t["text"].to_pylist():
            out.update(textstats.word_shingles(x, n))
        return pa.table({"gram": pa.array(sorted(out), pa.string())})

    gram_rows = bench.map_batches(
        _grams, batch_format="pyarrow", zero_copy_batch=True
    )
    grams: set[str] = set()
    for b in gram_rows.iter_batches(batch_format="pyarrow"):
        grams.update(b["gram"].to_pylist())
        if len(grams) > MAX_BENCH_GRAMS:
            raise ValueError(
                f"benchmark gram set exceeds MAX_BENCH_GRAMS="
                f"{MAX_BENCH_GRAMS}; use a hash semi-join decontaminator "
                "(see stages/dedup.ngram_jaccard_pairs) for corpus-sized "
                "benchmark sides"
            )
    return ray.put(frozenset(grams))


class _ContaminationScan:
    """Actor-pool membership scan: the broadcast gram set is fetched from
    the object store ONCE per actor (zero-copy plasma read), then every
    batch is a C-speed set-membership sweep."""

    def __init__(self, gram_ref: "ray.ObjectRef", n: int):
        self._grams: frozenset[str] = ray.get(gram_ref)
        self._n = n

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out_id: list[int] = []
        out_hits: list[int] = []
        g = self._grams
        for i, x in zip(ids, texts):
            hits = sum(
                1 for s in textstats.word_shingles(x, self._n) if s in g
            )
            if hits:
                out_id.append(i)
                out_hits.append(hits)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_hit_grams": pa.array(out_hits, pa.int64()),
            }
        )


def decontaminate(
    docs: ray.data.Dataset,
    bench: ray.data.Dataset,
    *,
    n: int = 8,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Flag corpus docs sharing ≥1 distinct word-n-gram with any benchmark
    doc → (doc_id, n_hit_grams). ``n_hit_grams`` counts the doc's DISTINCT
    contaminated n-grams (per-doc grams are distinct by construction).

    Corpus side streams (no shuffle); benchmark gram set broadcasts once.
    """
    ref = _gram_set_ref(bench, n)
    return docs.map_batches(
        _ContaminationScan,
        fn_constructor_kwargs={"gram_ref": ref, "n": n},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or default_pool_size(),
    )


# ---------------------------------------------------------------------------
# regex redaction
# ---------------------------------------------------------------------------


def redact(
    docs: ray.data.Dataset, pattern: str, replacement: str
) -> ray.data.Dataset:
    """PII-style regex scrub: (doc_id, text) → (doc_id, clean,
    n_redactions). Vectorized polars kernel (compiled once per batch by
    the regex engine's cache); non-overlapping global replacement —
    identical semantics to DuckDB ``regexp_replace(..., 'g')`` /
    ``regexp_extract_all`` (both RE2-compatible syntax)."""

    def _r(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t.select(["doc_id", "text"]))
        out = df.select(
            pl.col("doc_id"),
            pl.col("text")
            .str.replace_all(pattern, replacement)
            .alias("clean"),
            pl.col("text")
            .str.count_matches(pattern)
            .cast(pl.Int64)
            .alias("n_redactions"),
        )
        return out.to_arrow()

    return docs.map_batches(
        _r, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# vocabulary encoding
# ---------------------------------------------------------------------------


class _VocabEncode:
    def __init__(self, vocab_ref: "ray.ObjectRef"):
        self._vocab: list[str] = ray.get(vocab_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t.select(["doc_id", "text"]))
        toks = pl.col("text").str.extract_all(r"\S+")
        out = df.select(
            pl.col("doc_id"),
            toks.list.len().cast(pl.Int64).alias("n_tokens"),
            toks.list.eval(pl.element().is_in(self._vocab))
            .list.sum()
            .cast(pl.Int64)
            .alias("n_in_vocab"),
        ).with_columns(
            (pl.col("n_tokens") - pl.col("n_in_vocab")).alias("n_unk")
        )
        return out.to_arrow()


def vocab_encode(
    docs: ray.data.Dataset,
    *,
    vocab_size: int = 100,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Two-stage tokenizer-vocabulary pipeline: build the top-``vocab_size``
    token vocabulary distributed (one partial-counts shuffle), broadcast
    it, then stream the corpus through a vectorized membership encode →
    (doc_id, n_tokens, n_in_vocab, n_unk).

    The vocab list (not a Dataset) is tiny by construction (top-k), so the
    collect is bounded at k rows; ties at the boundary break on
    (count desc, token asc) — deterministic across engines."""
    vocab_tbl = token_counts(docs, k=vocab_size).select_columns(["token"])
    vocab = [r["token"] for r in vocab_tbl.take_all()]
    ref = ray.put(vocab)
    return docs.map_batches(
        _VocabEncode,
        fn_constructor_kwargs={"vocab_ref": ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or default_pool_size(),
    )


# a 100-TB corpus's DISTINCT-term table is the bounded object here (vocab,
# not corpus, cardinality); above this the df map should stay a Dataset
# and the score join becomes a token-bucketed cobucket pass
MAX_TFIDF_VOCAB = 20_000_000


def tfidf_top_terms(
    docs: ray.data.Dataset,
    *,
    k: int = 5,
    max_vocab: int = MAX_TFIDF_VOCAB,
) -> ray.data.Dataset:
    """Per-document top-k terms by TF-IDF (the classic distinctive-term
    extraction): score = tf * ln(n_docs / df), ties → lexicographic.

    Document frequencies build distributed (the token_counts combiner:
    per-block (term, df) partials → one term-bucketed merge), collect
    under the vocab guard, and BROADCAST once; scoring streams per block
    — the corpus never shuffles, exactly the decontaminate shape. Float
    math happens only in the final per-block ranking; the driver query
    is rows-only by construction (ln has no exact SQL mirror)."""

    def _df_partial(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t.select(["doc_id", "text"]))
        ex = (
            df.select(
                pl.col("doc_id"),
                pl.col("text").str.extract_all(r"\S+").alias("term"),
            )
            .explode("term")
            .drop_nulls("term")
            .unique()
        )
        return (
            ex.group_by("term")
            .agg(pl.len().cast(pl.Int64).alias("df"))
            .to_arrow()
        )

    partials = docs.map_batches(
        _df_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def _df_merge(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t)
            .group_by("term")
            .agg(pl.col("df").sum())
            .to_arrow()
        )

    df_tbl = bucket_group_apply(partials, "term", _df_merge, num_buckets=32)
    df_tbl = df_tbl.materialize()
    n_terms = df_tbl.count()
    if n_terms > max_vocab:
        raise ValueError(
            f"tfidf_top_terms: {n_terms} distinct terms exceeds "
            f"max_vocab={max_vocab}; keep the df map distributed instead"
        )
    n_docs = docs.count()

    from ..functions.joins import dataset_to_table

    df_pa = dataset_to_table(df_tbl).combine_chunks()
    ref = ray.put(df_pa) if ray.is_initialized() else df_pa

    class _Scorer:
        """df map loaded once per actor; per-batch scoring is vectorized
        polars (explode → tf counts → join df → score → top-k)."""

        def __init__(self):
            import polars as pl

            tbl = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.df = pl.from_arrow(tbl)
            self.n_docs = n_docs

        def __call__(self, t: pa.Table) -> pa.Table:
            import numpy as np
            import polars as pl

            d = pl.from_arrow(t.select(["doc_id", "text"]))
            tf = (
                d.select(
                    pl.col("doc_id"),
                    pl.col("text").str.extract_all(r"\S+").alias("term"),
                )
                .explode("term")
                .drop_nulls("term")
                .group_by(["doc_id", "term"])
                .agg(pl.len().cast(pl.Int64).alias("tf"))
                .join(self.df, on="term")
            )
            scored = tf.with_columns(
                (
                    pl.col("tf")
                    * (float(self.n_docs) / pl.col("df")).log()
                ).alias("score")
            )
            out = (
                scored.sort(
                    ["doc_id", "score", "term"],
                    descending=[False, True, False],
                )
                .group_by("doc_id", maintain_order=True)
                .head(k)
                .with_columns(
                    pl.int_range(1, pl.len() + 1)
                    .over("doc_id")
                    .cast(pl.Int64)
                    .alias("rank")
                )
            )
            return out.select(
                ["doc_id", "rank", "term", "tf", "df", "score"]
            ).to_arrow()

    return docs.map_batches(
        _Scorer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, default_pool_size()),
    )


def token_topk_approx(
    docs: ray.data.Dataset,
    *,
    k: int = 50,
    d: int = 4,
    w: int = 1 << 15,
    candidates_per_block: int | None = None,
    merge_batch: int = 256,
) -> ray.data.Dataset:
    """Heavy hitters WITHOUT shuffling token counts: the count-min path
    (`functions/cmsketch.py`) for corpora where even `token_counts`'
    one-row-per-(block, distinct-token) merge is too much (10⁹-token
    vocabularies). Rows (token, est_count) — ``est_count ≥ true`` always
    (CMS one-sided guarantee) and is block-layout-INDEPENDENT (counter
    adds commute); only the candidate set is heuristic (per-block local
    top — a global heavy hitter is a local heavy hitter in blocks where
    it appears, so well-separated heads are always found).

    One corpus pass emits per block a d·w sketch + its local candidate
    top; sketches fan-in by element-wise add, candidates dedup through
    the distinct shuffle; the driver folds the handful of survivors and
    scores the candidates."""
    import numpy as np
    import polars as pl

    from ..functions.cmsketch import (
        cms_add,
        cms_deserialize,
        cms_empty,
        cms_estimate,
        cms_merge,
        cms_serialize,
    )
    from .relational import distinct_keys

    cand_k = candidates_per_block or 4 * k

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["text"]))
        per = (
            df.select(pl.col("text").str.extract_all(r"\S+").alias("tok"))
            .explode("tok")
            .drop_nulls("tok")
            .group_by("tok")
            .agg(pl.len().cast(pl.Int64).alias("n"))
        )
        cms = cms_empty(d, w)
        cms_add(cms, per["tok"].to_numpy(), per["n"].to_numpy())
        top = per.sort(["n", "tok"], descending=[True, False]).head(cand_k)
        toks = top["tok"].to_list()
        return pa.table(
            {
                "token": pa.array(toks + [None], pa.string()),
                "sk": pa.array(
                    [None] * len(toks) + [cms_serialize(cms)], pa.binary()
                ),
            }
        )

    both = docs.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def _merge_sk(t: pa.Table) -> pa.Table:
        acc = cms_empty(d, w)
        for blob in t["sk"].drop_null().to_pylist():
            cms_merge(acc, cms_deserialize(blob))
        return pa.table({"sk": pa.array([cms_serialize(acc)], pa.binary())})

    def _sk_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return t.filter(pc_.is_null(t["token"])).select(["sk"])

    def _cand_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return t.filter(pc_.is_valid(t["token"])).select(["token"])

    fanin = both.map_batches(
        _sk_rows, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        _merge_sk,
        batch_format="pyarrow",
        batch_size=merge_batch,
        zero_copy_batch=True,
    )
    final = cms_empty(d, w)
    for row in fanin.take_all():  # ≤ blocks/merge_batch rows
        cms_merge(final, cms_deserialize(row["sk"]))

    cands = distinct_keys(
        both.map_batches(
            _cand_rows, batch_format="pyarrow", zero_copy_batch=True
        ),
        "token",
    ).take_all()  # ≤ blocks × cand_k rows, post-distinct
    toks = np.array([r["token"] for r in cands])
    if toks.size == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "est_count": pa.array([], pa.int64()),
                }
            )
        )
    est = cms_estimate(final, toks)
    order = np.lexsort((toks, -est))[:k]
    return ray.data.from_arrow(
        pa.table(
            {
                "token": pa.array(toks[order], pa.string()),
                "est_count": pa.array(est[order], pa.int64()),
            }
        )
    )


def term_postings(
    docs: ray.data.Dataset,
    terms: list[str],
    *,
    num_buckets: int = 8,
) -> ray.data.Dataset:
    """Inverted-index posting lists for a query vocabulary — rows
    ``(token, postings)`` where postings is the comma-joined ascending
    doc_id list of documents CONTAINING the term (distinct per doc).
    The IR building block behind the decontaminate/search family.

    The query vocabulary broadcasts into the tokenize map (tiny set —
    the corpus filters to matching (token, doc_id) pairs per block, so
    only hits shuffle); one token-bucketed merge sorts and joins each
    posting list (a term's list fits in a reducer — the inverted-index
    assumption; shard by (term, doc-range) beyond that)."""
    import polars as pl

    tset = set(terms)

    def _hits(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "text"]))
        ex = (
            df.select(
                pl.col("doc_id"),
                pl.col("text").str.extract_all(r"\S+").alias("token"),
            )
            .explode("token")
            .filter(pl.col("token").is_in(list(tset)))
            .unique()
        )
        return ex.to_arrow()

    hits = docs.map_batches(
        _hits, batch_format="pyarrow", zero_copy_batch=True
    )

    def _merge(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).unique()
        return (
            df.sort(["token", "doc_id"])
            .group_by("token", maintain_order=True)
            .agg(
                pl.col("doc_id").cast(pl.String).str.join(",")
                .alias("postings")
            )
            .to_arrow()
        )

    return bucket_group_apply(hits, "token", _merge, num_buckets=num_buckets)


def bigram_coverage(
    docs: ray.data.Dataset,
    *,
    min_df: int = 2,
    num_buckets: int = 32,
    doc_buckets: int = 32,
) -> ray.data.Dataset:
    """LM-free perplexity-style quality score: per document, how many of
    its DISTINCT word bigrams are *corpus-supported* (appear in ≥
    ``min_df`` distinct documents). Garbled text — OCR noise, binary
    spills, mojibake, boilerplate soup — is exactly text whose token
    transitions occur nowhere else, so a low ``coverage`` flags it the
    same way a KenLM perplexity gate would, but with pure integer counts
    (no trained model, bit-exact SQL mirror). Output
    ``(doc_id, n_bigrams, n_supported, coverage)`` where ``coverage`` is
    the single IEEE division n_supported/n_bigrams; docs with < 2 tokens
    have no bigrams and emit no row (matching the SQL join).

    Dataflow (text never shuffles): per block, distinct (bigram, doc_id)
    pairs are built vectorized (polars list slice + explode) and the
    bigram string is replaced by its ``stable_hash64`` — only two int64s
    per pair move. One gram-bucketed shuffle computes each bigram's
    document frequency AND folds it back into per-doc partial counts in
    the same reduce (pairs for one gram are all in its bucket, so no
    second join); one tiny doc-bucketed merge sums partials. Collision
    odds follow the stable_hash64 contract (n²/2⁶⁵; a 10¹²-gram
    deployment widens to 128 bits behind the same helper)."""
    import polars as pl

    from ..schema import stable_hash64

    pair_schema = pa.schema([("gram_h", pa.int64()), ("doc_id", pa.int64())])
    part_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_bigrams", pa.int64()),
            ("n_supported", pa.int64()),
        ]
    )

    def _pairs(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pair_schema.empty_table()
        toks = (
            pl.from_arrow(t.select(["doc_id", "text"]))
            .with_columns(pl.col("text").str.extract_all(r"\S+").alias("t"))
            .filter(pl.col("t").list.len() >= 2)
        )
        if not len(toks):
            return pair_schema.empty_table()
        grams = (
            toks.select(
                pl.col("doc_id"),
                pl.col("t")
                .list.slice(0, pl.col("t").list.len() - 1)
                .alias("a"),
                pl.col("t").list.slice(1).alias("b"),
            )
            .explode(["a", "b"])
            .select(
                pl.col("doc_id").cast(pl.Int64),
                (pl.col("a") + pl.lit(" ") + pl.col("b")).alias("gram"),
            )
            .unique()
        )
        h = stable_hash64(grams["gram"].to_numpy())
        return pa.table(
            {
                "gram_h": pa.array(h, pa.int64()),
                "doc_id": grams["doc_id"].to_arrow().cast(pa.int64()),
            }
        )

    def _df_fold(t: pa.Table) -> pa.Table:
        # one gram's pairs never span buckets: df = distinct docs per
        # gram is exact here, and the per-doc partial counts fold in the
        # same pass — no join-back shuffle
        if not t.num_rows:
            return part_schema.empty_table()
        df = pl.from_arrow(t).unique()  # cross-block (gram, doc) dups
        return (
            df.with_columns(
                pl.col("doc_id").count().over("gram_h").alias("df")
            )
            .group_by("doc_id")
            .agg(
                pl.len().cast(pl.Int64).alias("n_bigrams"),
                (pl.col("df") >= min_df)
                .sum()
                .cast(pl.Int64)
                .alias("n_supported"),
            )
            .to_arrow()
            .cast(part_schema)
        )

    def _doc_merge(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.schema(
                list(part_schema) + [("coverage", pa.float64())]
            ).empty_table()
        merged = (
            pl.from_arrow(t)
            .group_by("doc_id")
            .agg(
                pl.col("n_bigrams").sum(),
                pl.col("n_supported").sum(),
            )
        )
        return (
            merged.with_columns(
                (
                    pl.col("n_supported").cast(pl.Float64)
                    / pl.col("n_bigrams").cast(pl.Float64)
                ).alias("coverage")
            )
            .to_arrow()
            .cast(
                pa.schema(list(part_schema) + [("coverage", pa.float64())])
            )
        )

    pairs = docs.map_batches(
        _pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = bucket_group_apply(
        pairs, "gram_h", _df_fold, num_buckets=num_buckets
    )
    return bucket_group_apply(
        partials, "doc_id", _doc_merge, num_buckets=doc_buckets
    )


def mixture_weights(
    docs: ray.data.Dataset,
    *,
    group_cols: tuple[str, str] = ("lang", "source"),
    num_buckets: int = 4,
) -> ray.data.Dataset:
    """Training-mixture profile: per (lang, source) bucket — doc count,
    EXACT total whitespace-token count, the bucket's share of all corpus
    tokens, and the uniform-target resampling weight ``(1/G) / share``
    (the factor a sampler multiplies each bucket's draw probability by
    to flatten the mixture across the G observed buckets). Output
    ``(lang, source, n_docs, total_tokens, token_share, weight)`` — the
    "what is my corpus made of and how do I rebalance it" step that
    precedes any data-mixing run.

    All float arithmetic is two IEEE double divisions in a fixed order
    (share = tokens/total, weight = (1/G)/share), so the DuckDB oracle
    reproduces it bit-for-bit — no tolerance needed.

    Dataflow: per-block combiner counts ``\\S+`` tokens vectorized and
    collapses to G rows per block; one tiny shuffle merges partials; the
    G-row result is a single block where shares/weights are computed.
    The corpus text never moves — only G-row partials shuffle."""
    import polars as pl
    import pyarrow.compute as pc

    from ..functions.shuffle import bucket_group_apply

    c0, c1 = group_cols
    part_schema = pa.schema(
        [
            (c0, pa.string()),
            (c1, pa.string()),
            ("n_docs", pa.int64()),
            ("total_tokens", pa.int64()),
        ]
    )

    def _partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return part_schema.empty_table()
        return (
            pl.from_arrow(t.select([c0, c1, "text"]))
            .with_columns(
                pl.col("text")
                .str.count_matches(textstats._TOKEN_RE)
                .cast(pl.Int64)
                .alias("n_tok")
            )
            .group_by([c0, c1])
            .agg(
                pl.len().cast(pl.Int64).alias("n_docs"),
                pl.col("n_tok").sum().alias("total_tokens"),
            )
            .to_arrow()
            .cast(part_schema)
        )

    def _merge(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return part_schema.empty_table()
        return (
            pl.from_arrow(t)
            .group_by([c0, c1])
            .agg(
                pl.col("n_docs").sum(),
                pl.col("total_tokens").sum(),
            )
            .to_arrow()
            .cast(part_schema)
        )

    def _weights(t: pa.Table) -> pa.Table:
        # single tiny block: G rows after the merge
        import numpy as np

        if not t.num_rows:
            return pa.schema(
                list(part_schema)
                + [("token_share", pa.float64()), ("weight", pa.float64())]
            ).empty_table()
        tok = t["total_tokens"].to_numpy(zero_copy_only=False)
        grand = np.int64(tok.sum())
        g = np.float64(t.num_rows)
        share = tok.astype(np.float64) / np.float64(grand)
        weight = (np.float64(1.0) / g) / share
        return t.append_column(
            "token_share", pa.array(share, pa.float64())
        ).append_column("weight", pa.array(weight, pa.float64()))

    partials = docs.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = bucket_group_apply(partials, c0, _merge, num_buckets=num_buckets)
    return merged.repartition(1).map_batches(
        _weights, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# boilerplate-segment removal (CCNet-style paragraph dedup, word-window form)
# ---------------------------------------------------------------------------


def boilerplate_segments(
    docs: ray.data.Dataset,
    *,
    width: int = 3,
    min_docs: int = 2,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Corpus-wide boilerplate-segment table: split every doc into
    consecutive ``width``-word windows (the line/paragraph unit of
    CCNet-style dedup, adapted to single-line corpora) and return
    ``(seg, n_docs)`` for every segment that occurs in ≥ ``min_docs``
    DISTINCT documents.

    Shuffle discipline: the counting path ships ``(h:int64, doc_id)``
    only — per-block distinct pairs first (a doc repeating a segment
    contributes once before the exchange), then ONE hash-bucketed
    shuffle counts distinct docs per segment. Segment TEXT travels with
    the count reduce so the output is human-readable, but only for
    per-block-distinct (h, seg, doc_id) triples — the corpus body never
    moves."""
    import polars as pl

    def _pairs(t: pa.Table) -> pa.Table:
        df = _explode_segments(pl.from_arrow(t.select(["doc_id", "text"])), width)
        out = df.select(["seg", "h", "doc_id"]).unique()
        return out.to_arrow().cast(_SEG_PAIR_SCHEMA)

    def _count(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).unique()
        out = (
            df.group_by("h")
            .agg(
                pl.col("seg").first().alias("seg"),
                pl.col("doc_id").n_unique().alias("n_docs"),
            )
            .filter(pl.col("n_docs") >= min_docs)
            .select(["seg", "n_docs"])
        )
        return out.to_arrow().cast(_SEG_COUNT_SCHEMA)

    pairs = docs.map_batches(
        _pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucket_group_apply(pairs, "h", _count, num_buckets=num_buckets)


def _boilerplate_hashes(
    docs: ray.data.Dataset,
    *,
    width: int = 3,
    min_docs: int = 2,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Hash-only sibling of :func:`boilerplate_segments` for consumers
    that never need the segment TEXT (``segment_dedup``'s rewrite
    matches on the polars hash anyway): the exchange carries 16-byte
    (h:int64, doc_id:int64) per-block-distinct pairs instead of the
    ~3×-corpus window strings — at 100 TB that is the difference
    between shuffling tens of TB of text and a few hundred GB of ints.
    Returns ``(h, n_docs)`` for hashes in ≥ ``min_docs`` distinct docs."""
    import polars as pl

    def _pairs(t: pa.Table) -> pa.Table:
        df = _explode_segments(
            pl.from_arrow(t.select(["doc_id", "text"])), width
        )
        return (
            df.select(["h", "doc_id"]).unique().to_arrow().cast(
                _SEG_HPAIR_SCHEMA
            )
        )

    def _count(t: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(t)
            .unique()
            .group_by("h")
            .agg(pl.col("doc_id").n_unique().cast(pl.Int64).alias("n_docs"))
            .filter(pl.col("n_docs") >= min_docs)
        )
        return out.to_arrow().cast(_SEG_HCOUNT_SCHEMA)

    pairs = docs.map_batches(
        _pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucket_group_apply(pairs, "h", _count, num_buckets=num_buckets)


_SEG_PAIR_SCHEMA = pa.schema(
    [("seg", pa.string()), ("h", pa.int64()), ("doc_id", pa.int64())]
)
_SEG_COUNT_SCHEMA = pa.schema([("seg", pa.string()), ("n_docs", pa.int64())])
_SEG_HPAIR_SCHEMA = pa.schema([("h", pa.int64()), ("doc_id", pa.int64())])
_SEG_HCOUNT_SCHEMA = pa.schema([("h", pa.int64()), ("n_docs", pa.int64())])

# a boilerplate set is small by nature (it is the REPEATED tail of the
# corpus); 50M 64-bit hashes = 400 MB is the most a sane broadcast should
# carry — beyond that, fail loudly: the co-bucketed alternative is an
# anti-semi-join of exploded (h, doc_id, seg_idx) against the boilerplate
# table followed by a doc_id-bucketed ordered reassembly (one extra
# shuffle of the segment hashes, never the text)
MAX_BOILERPLATE_SEGMENTS = 50_000_000


def _explode_segments(df, width: int):
    """(doc_id, text) polars frame → one row per ``width``-word window:
    (doc_id, i, seg, h). Fully vectorized (split → int_ranges explode →
    list.slice → join → hash); ``h`` is polars' native 64-bit hash cast
    to int64 — an INTERNAL shuffle/broadcast key only (the oracle
    compares reassembled strings), stable within one cluster's pinned
    polars version."""
    import polars as pl

    return (
        df.with_columns(ws=pl.col("text").str.split(" "))
        .with_columns(
            n=((pl.col("ws").list.len() + (width - 1)) // width).cast(
                pl.Int64
            )
        )
        .with_columns(i=pl.int_ranges(0, pl.col("n")))
        .explode("i")
        .with_columns(
            seg=pl.col("ws")
            .list.slice(pl.col("i") * width, width)
            .list.join(" ")
        )
        .with_columns(h=pl.col("seg").hash(seed=0).cast(pl.Int64, wrap_numerical=True))
        .drop(["ws", "n"])
    )


class _SegmentRewrite:
    """Actor-pool rewrite: the broadcast boilerplate-hash array is
    fetched from plasma ONCE per actor and kept as a SORTED int64 numpy
    array; each batch explodes to segments, marks drops with one
    searchsorted membership sweep, and reassembles docs IN ORDER with a
    maintain-order group-by — the doc row never leaves its block, so
    reconstruction needs no shuffle."""

    def __init__(self, bp_ref, width: int):
        # the broadcast array is pre-SORTED driver-side: the plasma read
        # is then zero-copy (searchsorted works on the read-only view),
        # so every worker on a node shares ONE copy instead of each
        # actor materializing its own sorted duplicate
        self._bp = ray.get(bp_ref)
        self._width = width

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np
        import polars as pl

        df = _explode_segments(
            pl.from_arrow(t.select(["doc_id", "text"])), self._width
        )
        h = df["h"].to_numpy()
        if self._bp.size:
            pos = np.searchsorted(self._bp, h)
            pos[pos == self._bp.size] = 0
            drop = self._bp[pos] == h
        else:
            drop = np.zeros(len(h), dtype=bool)
        out = (
            df.with_columns(drop=pl.Series(drop))
            .group_by("doc_id", maintain_order=True)
            .agg(
                pl.col("seg")
                .filter(~pl.col("drop"))
                .str.join(" ")
                .alias("clean_text"),
                pl.len().cast(pl.Int64).alias("n_segs"),
                pl.col("drop").sum().cast(pl.Int64).alias("n_dropped"),
            )
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("clean_text", pa.string()),
                    ("n_segs", pa.int64()),
                    ("n_dropped", pa.int64()),
                ]
            )
        )


def segment_dedup(
    docs: ray.data.Dataset,
    *,
    width: int = 3,
    min_docs: int = 2,
    num_buckets: int = 64,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """CCNet-style boilerplate removal over single-line corpora:
    (doc_id, text) → (doc_id, clean_text, n_segs, n_dropped), where
    ``clean_text`` is the doc with every corpus-boilerplate
    ``width``-word window (a segment occurring in ≥ ``min_docs``
    distinct docs) removed, remaining segments re-joined in original
    order.

    Two phases, one shuffle total:
    1. count — per-block-distinct (h, doc_id) pairs through one
       hash-bucketed exchange → distinct-doc counts → the boilerplate
       hash set, collected under ``MAX_BOILERPLATE_SEGMENTS`` and
       broadcast via ``ray.put`` (the repeated tail of a corpus is
       small even at 100 TB; the guard fails loudly otherwise).
    2. rewrite — the corpus STREAMS through an actor pool; each doc is
       exploded, filtered by one sorted-array searchsorted membership
       sweep, and reassembled locally (order preserved, no shuffle —
       the doc row never leaves its block)."""
    import numpy as np

    # hash-only count phase: the exchange ships (h, doc_id) int pairs,
    # never window text — the rewrite matches on the same polars hash
    bp = _boilerplate_hashes(
        docs, width=width, min_docs=min_docs, num_buckets=num_buckets
    )

    hashes: list[np.ndarray] = []
    total = 0
    for b in bp.iter_batches(batch_format="pyarrow"):
        arr = b["h"].combine_chunks().to_numpy(zero_copy_only=False)
        total += arr.size
        if total > MAX_BOILERPLATE_SEGMENTS:
            raise ValueError(
                "boilerplate set exceeds MAX_BOILERPLATE_SEGMENTS="
                f"{MAX_BOILERPLATE_SEGMENTS}; switch to the co-bucketed "
                "anti-join + ordered-reassembly path (see docstring)"
            )
        hashes.append(arr)
    bp_ref = ray.put(
        np.sort(np.concatenate(hashes)) if hashes else np.empty(0, np.int64)
    )

    return docs.map_batches(
        _SegmentRewrite,
        fn_constructor_kwargs={"bp_ref": bp_ref, "width": width},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or default_pool_size(),
    )


# ---------------------------------------------------------------------------
# regex pattern mining (PII / URL / shape extraction)
# ---------------------------------------------------------------------------


def extract_patterns(
    docs: ray.data.Dataset, patterns: dict[str, str]
) -> ray.data.Dataset:
    """Structured regex mining: for each named pattern, every
    non-overlapping leftmost match per doc → ``(doc_id, kind, hit, n)``
    with per-doc occurrence counts. The generic PII/URL/email miner —
    ``redact`` destroys matches, this one REPORTS them.

    Entirely doc-local (extract → explode → per-doc count inside the
    batch): no shuffle, the corpus streams. Vectorized polars
    ``str.extract_all`` per named pattern (a loop over the handful of
    PATTERNS, never over rows); Rust-regex and DuckDB RE2 agree on
    leftmost non-overlapping semantics, so oracles mirror 1:1 with
    ``regexp_extract_all`` + ``unnest``."""

    def _mine(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t.select(["doc_id", "text"]))
        parts = []
        for kind, pat in sorted(patterns.items()):
            parts.append(
                df.select(
                    pl.col("doc_id"),
                    pl.lit(kind).alias("kind"),
                    pl.col("text").str.extract_all(pat).alias("hit"),
                )
                .explode("hit")
                .drop_nulls("hit")
                .group_by(["doc_id", "kind", "hit"])
                .len()
                .with_columns(pl.col("len").cast(pl.Int64).alias("n"))
                .drop("len")
            )
        out = pl.concat(parts) if parts else pl.DataFrame()
        return out.to_arrow().cast(_PATTERN_SCHEMA)

    return docs.map_batches(
        _mine, batch_format="pyarrow", zero_copy_batch=True
    )


_PATTERN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("kind", pa.string()),
        ("hit", pa.string()),
        ("n", pa.int64()),
    ]
)


def pattern_stats(
    docs: ray.data.Dataset,
    patterns: dict[str, str],
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Corpus rollup of ``extract_patterns``: per (kind, hit) the total
    occurrence count and the number of distinct docs it appears in —
    the "which PII values leak, and how widely" report.

    Per-block partials from the doc-local miner (already one row per
    (doc, kind, hit)) collapse through ONE (kind·hit)-bucketed shuffle;
    only the distinct-per-block (kind, hit, n, 1-doc) partials travel,
    never the text."""
    import polars as pl

    mined = extract_patterns(docs, patterns)

    def _partial(t: pa.Table) -> pa.Table:
        # mined rows are GLOBALLY distinct per (doc_id, kind, hit) — each
        # doc is mined in exactly one place — so distinct-doc count is a
        # plain row count: correct under any downstream re-batching
        # (a per-block n_unique would double-count a doc whose rows Ray
        # split across two partial batches)
        df = pl.from_arrow(t)
        out = df.group_by(["kind", "hit"]).agg(
            pl.col("n").sum().alias("n_matches"),
            pl.len().cast(pl.Int64).alias("n_docs"),
        )
        return out.to_arrow().cast(_PATTERN_STATS_SCHEMA)

    def _merge(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        out = df.group_by(["kind", "hit"]).agg(
            pl.col("n_matches").sum(), pl.col("n_docs").sum()
        )
        return out.to_arrow().cast(_PATTERN_STATS_SCHEMA)

    partials = mined.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def _key(t: pa.Table) -> pa.Array:
        import pyarrow.compute as pc

        return pc.binary_join_element_wise(
            t["kind"].combine_chunks().cast(pa.string()),
            t["hit"].combine_chunks().cast(pa.string()),
            "\x1f",
        )

    keyed = partials.map_batches(
        lambda t: t.append_column("_kh", _key(t)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return bucket_group_apply(
        keyed,
        "_kh",
        lambda t: _merge(t.drop_columns(["_kh"])),
        num_buckets=num_buckets,
    )


_PATTERN_STATS_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("hit", pa.string()),
        ("n_matches", pa.int64()),
        ("n_docs", pa.int64()),
    ]
)


# ---------------------------------------------------------------------------
# BPE tokenizer fitting (learn the merge table from the corpus)
# ---------------------------------------------------------------------------

# BPE fits on the COLLAPSED word-frequency table, not the corpus: even a
# 100 TB corpus has O(10^7..10^8) distinct whitespace words, so phase 2
# is driver-local by design (exactly how production BPE trainers work —
# the corpus pass is the distributed part). Guard the collapse anyway.
MAX_BPE_VOCAB_WORDS = 20_000_000


def _word_freqs(
    docs: ray.data.Dataset, *, num_buckets: int = 64
) -> ray.data.Dataset:
    """Exact corpus word-frequency table (word, n) — per-block combiner
    partials, one word-bucketed merge shuffle; one row per (block,
    distinct word) moves, never the corpus."""
    import polars as pl

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["text"]))
        out = (
            df.select(pl.col("text").str.extract_all(r"\S+").alias("word"))
            .explode("word")
            .drop_nulls("word")
            .group_by("word")
            .agg(pl.len().cast(pl.Int64).alias("n"))
        )
        return out.to_arrow().cast(_WORD_FREQ_SCHEMA)

    def _merge(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return (
            df.group_by("word")
            .agg(pl.col("n").sum())
            .to_arrow()
            .cast(_WORD_FREQ_SCHEMA)
        )

    partials = docs.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucket_group_apply(partials, "word", _merge, num_buckets=num_buckets)


_WORD_FREQ_SCHEMA = pa.schema([("word", pa.string()), ("n", pa.int64())])

_EOW = "</w>"


def _bpe_learn(
    freqs: "list[tuple[str, int]]", num_merges: int
) -> "list[tuple[int, str, str, int]]":
    """Classic Sennrich-style BPE on a word-frequency table: symbols
    start as characters + an end-of-word marker; each round merges the
    most frequent adjacent pair (count desc, pair lex asc tie-break —
    fully deterministic). Returns (rank, left, right, pair_count)."""
    from collections import Counter

    words: list[tuple[list[str], int]] = [
        (list(w) + [_EOW], n) for w, n in freqs if w
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for sym, n in words:
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((rank, a, b, cnt))
        ab = a + b
        for sym, _ in words:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def bpe_fit(
    docs: ray.data.Dataset,
    *,
    num_merges: int = 20,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Learn a BPE merge table from the corpus → (rank, left, right,
    pair_count). The corpus pass (exact word frequencies) is the
    distributed phase; merge learning runs on the collapsed vocabulary
    — small by nature, guarded by ``MAX_BPE_VOCAB_WORDS`` (this is how
    production BPE trainers are structured; the corpus is never
    re-scanned per merge round)."""
    freq_rows: list[tuple[str, int]] = []
    for b in _word_freqs(docs, num_buckets=num_buckets).iter_batches(
        batch_format="pyarrow"
    ):
        freq_rows.extend(
            zip(b["word"].to_pylist(), b["n"].to_pylist())
        )
        if len(freq_rows) > MAX_BPE_VOCAB_WORDS:
            raise ValueError(
                "distinct-word vocabulary exceeds MAX_BPE_VOCAB_WORDS="
                f"{MAX_BPE_VOCAB_WORDS}; fit on a hash-sampled corpus "
                "slice instead (sample_hash) — merge ranks converge long "
                "before the full tail is seen"
            )
    freq_rows.sort()  # deterministic regardless of shuffle arrival order
    merges = _bpe_learn(freq_rows, num_merges)
    return ray.data.from_arrow(
        pa.table(
            {
                "rank": pa.array([m[0] for m in merges], pa.int64()),
                "left": pa.array([m[1] for m in merges], pa.string()),
                "right": pa.array([m[2] for m in merges], pa.string()),
                "pair_count": pa.array([m[3] for m in merges], pa.int64()),
            }
        )
    )


class _BpeEncode:
    """Actor-pool BPE applier: the broadcast merge table is fetched once
    per actor; per-word tokenizations are memoized in a persistent
    per-actor dict (a corpus has few distinct words relative to tokens,
    so the amortized cost per token is a dict hit)."""

    def __init__(self, merges_ref):
        self._ranks: dict = {
            (a, b): r for r, a, b in ray.get(merges_ref)
        }
        self._cache: dict = {}

    def _encode_word(self, w: str) -> int:
        got = self._cache.get(w)
        if got is not None:
            return got
        sym = list(w) + [_EOW]
        ranks = self._ranks
        while len(sym) > 1:
            best_i, best_r = -1, None
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        n = len(sym)
        self._cache[w] = n
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t.select(["doc_id", "text"]))
        words = df.select(
            pl.col("doc_id"),
            pl.col("text").str.extract_all(r"\S+").alias("w"),
        )
        enc = self._encode_word
        counts = [
            sum(enc(w) for w in ws) if ws is not None else 0
            for ws in words["w"].to_list()
        ]
        return pa.table(
            {
                "doc_id": words["doc_id"].to_arrow().cast(pa.int64()),
                "n_subwords": pa.array(counts, pa.int64()),
            }
        )


def bpe_encode(
    docs: ray.data.Dataset,
    merges: ray.data.Dataset,
    *,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Apply a learned BPE merge table → per-doc subword counts
    (doc_id, n_subwords). Merge table broadcasts once via ``ray.put``;
    the corpus streams through a memoizing actor pool."""
    rows = sorted(
        (r["rank"], r["left"], r["right"]) for r in merges.take_all()
    )
    merges_ref = ray.put(rows)
    return docs.map_batches(
        _BpeEncode,
        fn_constructor_kwargs={"merges_ref": merges_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or default_pool_size(),
    )


# ---------------------------------------------------------------------------
# bloom-filter decontamination (the no-guard scale path)
# ---------------------------------------------------------------------------


def _bloom_positions_md5(values, m: int, k: int):
    """k bit positions per value via md5 double hashing — the
    SQL-mirrorable sibling of zonemap's pandas-hash `_bloom_positions`:
    h1 = md5 hex[0:15], h2 = md5 hex[15:30] | 1 (both 60-bit int64),
    position_i = ((h1 % m) + i·(h2 % m)) % m. DuckDB computes the same
    positions from the same md5 call, so the oracle replays every bloom
    decision (false positives included). h1 is schema.md5_60's slice;
    the second 60-bit slice needs the full digest, hence the one local
    md5 call instead of two md5_60 passes. Returns an (n, k) int64
    array."""
    import hashlib

    import numpy as np

    hexes = [hashlib.md5(str(v).encode()).hexdigest() for v in values]
    h1 = np.array([int(h[:15], 16) for h in hexes], np.int64) % np.int64(m)
    h2 = np.array(
        [int(h[15:30], 16) | 1 for h in hexes], np.int64
    ) % np.int64(m)
    i = np.arange(int(k), dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.int64(m)


def _bloom_bits_ref(
    bench: ray.data.Dataset,
    n: int,
    *,
    bits_per_gram: int = 16,
    k: int | None = None,
):
    """Bloom filter of the benchmark's word-n-gram set, built
    distributed: each block folds its grams into an m-bit partial
    (m sized from a cheap distinct-count pre-pass), partials OR-merge
    on the driver (m/8 bytes each), one `ray.put` broadcasts the final
    bits. Unlike `_gram_set_ref` there is NO size guard: at 16
    bits/gram a 10⁹-gram benchmark side is a 2 GB filter where the
    string set would be ~50 GB of Python objects — and the filter never
    leaves plasma."""
    import numpy as np

    from ..functions.sketch import hll_add, hll_count, hll_empty

    # distinct-gram estimate via the md5-60 HLL: LAYOUT-INDEPENDENT
    # (registers are order/block-split invariant, unlike the old
    # per-block distinct-count upper bound), so m — and with it every
    # downstream bloom decision incl. false positives — is a pure
    # function of the data. That is what lets the driver's DuckDB
    # oracle replay this operator exactly.
    sk_rows = bench.map_batches(
        lambda t: pa.table(
            {
                "sk": pa.array(
                    [
                        hll_add(
                            hll_empty(),
                            np.asarray(
                                sorted(
                                    {
                                        s
                                        for x in t["text"].to_pylist()
                                        for s in textstats.word_shingles(
                                            x, n
                                        )
                                    }
                                ),
                                dtype=object,
                            ),
                        ).tobytes()
                    ],
                    pa.binary(),
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()  # one 4 KB sketch per block — tiny by construction
    merged_sk = hll_empty()
    for r in sk_rows:
        merged_sk = np.maximum(
            merged_sk, np.frombuffer(r["sk"], np.uint8)
        )
    n_est = max(1, hll_count(merged_sk))
    m = max(64, ((n_est * bits_per_gram + 63) // 64) * 64)

    if k is None:
        k = max(1, int(round(bits_per_gram * float(np.log(2)))))

    def _fold(t: pa.Table, k=k) -> pa.Table:
        grams = sorted(
            {s for x in t["text"].to_pylist() for s in textstats.word_shingles(x, n)}
        )
        bits = np.zeros(m // 8, dtype=np.uint8)
        if grams:
            pos = _bloom_positions_md5(grams, m, k).ravel()
            np.bitwise_or.at(bits, pos >> 3, 1 << (pos & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    merged = np.zeros(m // 8, dtype=np.uint8)
    for b in bench.map_batches(
        _fold, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for chunk in b["bits"].to_pylist():
            merged |= np.frombuffer(chunk, dtype=np.uint8)
    return ray.put((merged, m, k))


class _BloomContaminationScan:
    """Actor-pool Bloom membership scan: bits fetched once per actor;
    each doc's grams probe the filter vectorized. False positives can
    only OVER-flag (safe for decontamination — a flagged-clean doc is
    dropped needlessly at ~2⁻ᵏ rate); misses are impossible."""

    def __init__(self, bloom_ref, n: int):
        import numpy as np  # noqa: F401 (actor env)

        self._bits, self._m, self._k = ray.get(bloom_ref)
        self._n = n

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np


        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out_id: list[int] = []
        out_hits: list[int] = []
        bits, m = self._bits, self._m
        for i, x in zip(ids, texts):
            grams = sorted(set(textstats.word_shingles(x, self._n)))
            if not grams:
                continue
            pos = _bloom_positions_md5(grams, m, self._k)  # (g, k)
            hit = np.all(
                bits[pos >> 3] & (1 << (pos & 7).astype(np.uint8)) != 0,
                axis=1,
            )
            hits = int(hit.sum())
            if hits:
                out_id.append(i)
                out_hits.append(hits)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_hit_grams": pa.array(out_hits, pa.int64()),
            }
        )


def decontaminate_bloom(
    docs: ray.data.Dataset,
    bench: ray.data.Dataset,
    *,
    n: int = 8,
    bits_per_gram: int = 16,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """`decontaminate`'s unguarded scale path: the benchmark gram set
    becomes a Bloom filter (built distributed, OR-merged, broadcast
    once), so benchmark sides far beyond MAX_BENCH_GRAMS fit in plasma.
    Output is a SUPERSET of the exact scan's (never under-flags; false
    positives over-flag at ~(1−e^(−k·n/m))^k per gram, ≈0.046% at the
    default 16 bits/gram with the derived FP-optimal
    k = round(bits_per_gram·ln 2) = 11) — and since r4 it is ALSO
    oracle-exact: m comes from the layout-independent md5-60 HLL gram
    estimate and positions from md5 double hashing, so the DuckDB
    oracle replays every decision, FPs included; the superset + FP-rate
    contract stays pinned in pytest against the exact operator."""
    ref = _bloom_bits_ref(bench, n, bits_per_gram=bits_per_gram)
    return docs.map_batches(
        _BloomContaminationScan,
        fn_constructor_kwargs={"bloom_ref": ref, "n": n},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency or default_pool_size(),
    )


def token_dispersion(
    docs: ray.data.Dataset, *, min_occ: int = 10, num_buckets: int = 32
) -> ray.data.Dataset:
    """Per-term BURSTINESS sufficient statistics — rows ``(token,
    n_occurrences, n_docs, sum_c2)`` with ``sum_c2 = Σ_docs c_doc²``,
    for terms with ``n_occurrences ≥ min_occ``. Variance-to-mean (Fano
    factor) and DP-style dispersion are consumer arithmetic over these
    EXACT integers: a term that appears 100× in one doc and a term that
    appears once in 100 docs have the same n_occurrences but wildly
    different sum_c2 — the classic topical-vs-function-word signal a
    curation pipeline uses alongside tf-idf.

    Same combiner → one-bucket-merge shape as ``token_counts``: a doc is
    one row, so per-(doc, term) counts are block-local and the three
    per-term partial sums (Σc, #docs, Σc²) merge exactly; one row per
    (block, distinct term) moves, never the corpus."""
    import polars as pl

    sch = pa.schema(
        [
            ("token", pa.string()),
            ("n_occurrences", pa.int64()),
            ("n_docs", pa.int64()),
            ("sum_c2", pa.int64()),
        ]
    )

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "text"]))
        tf = (
            df.select(
                pl.col("doc_id"),
                pl.col("text").str.extract_all(r"\S+").alias("token"),
            )
            .explode("token")
            .drop_nulls("token")
            .group_by(["doc_id", "token"])
            .agg(pl.len().cast(pl.Int64).alias("c"))
        )
        return (
            tf.group_by("token")
            .agg(
                pl.col("c").sum().alias("n_occurrences"),
                pl.len().cast(pl.Int64).alias("n_docs"),
                (pl.col("c") * pl.col("c")).sum().alias("sum_c2"),
            )
            .to_arrow()
            .cast(sch)
        )

    partials = docs.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def _merge(t: pa.Table, mo=min_occ) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by("token")
            .agg(
                pl.col("n_occurrences").sum(),
                pl.col("n_docs").sum(),
                pl.col("sum_c2").sum(),
            )
            .filter(pl.col("n_occurrences") >= mo)
            .to_arrow()
            .cast(sch)
        )

    return bucket_group_apply(partials, "token", _merge, num_buckets=num_buckets)
