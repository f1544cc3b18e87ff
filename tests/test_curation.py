"""Tests for corpus-curation ops: benchmark decontamination, regex
redaction, vocabulary encoding (stages/curation.py)."""

import pyarrow as pa
import ray.data

from joint_entity_and_relation_extraction_ray.stages import curation


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    )


def test_decontaminate_flags_overlapping_docs(ray_session):
    bench = _docs(["a b c d e f g h i j"], ids=[100])
    corpus = _docs(
        [
            # shares the 8-gram "b c d e f g h i" (and one more)
            "z b c d e f g h i j",
            # 8 tokens, no shared 8-gram
            "q w e r t y u i",
            # shorter than 8 tokens: no grams at all
            "a b c",
        ],
        ids=[1, 2, 3],
    )
    out = curation.decontaminate(corpus, bench, n=8, concurrency=2)
    rows = {r["doc_id"]: r["n_hit_grams"] for r in out.take_all()}
    # doc 1 grams: "z b..i", "b..i j" (2 distinct); bench has "b..i", "c..j"
    # → shared distinct grams = {"b c d e f g h i", "c d e f g h i j"}
    assert rows == {1: 2}


def test_decontaminate_counts_distinct_grams_once(ray_session):
    # repeated contaminated gram in one doc counts once (distinct shingles)
    bench = _docs(["a a a a a a a a"], ids=[0])
    corpus = _docs(["a a a a a a a a a a"], ids=[1])
    out = curation.decontaminate(corpus, bench, n=8, concurrency=2)
    assert {r["doc_id"]: r["n_hit_grams"] for r in out.take_all()} == {1: 1}


def test_redact_replaces_and_counts(ray_session):
    docs = _docs(
        ["customer paid order now", "no match here", "order order"],
    )
    out = curation.redact(
        docs, r"\b(customer|order)\b", "<PII>"
    ).to_pandas().set_index("doc_id")
    assert out.loc[0, "clean"] == "<PII> paid <PII> now"
    assert out.loc[0, "n_redactions"] == 2
    assert out.loc[1, "clean"] == "no match here"
    assert out.loc[1, "n_redactions"] == 0
    assert out.loc[2, "clean"] == "<PII> <PII>"
    assert out.loc[2, "n_redactions"] == 2


def test_redact_word_boundary(ray_session):
    # 'orders' must NOT match \border\b
    docs = _docs(["orders customers order"])
    out = curation.redact(docs, r"\b(customer|order)\b", "<PII>").take_all()
    assert out[0]["clean"] == "orders customers <PII>"
    assert out[0]["n_redactions"] == 1


def test_token_counts_topk_ordering(ray_session):
    docs = _docs(["b b b a a c", "a c", ""])
    out = curation.token_counts(docs, k=2).take_all()
    # a:3 (2 docs), b:3 (1 doc), c:2 — tie a/b broken alphabetically
    assert [(r["token"], r["n_occurrences"], r["n_docs"]) for r in out] == [
        ("a", 3, 2),
        ("b", 3, 1),
    ]


def test_token_bpe_counts(ray_session):
    docs = _docs(["I'll pay the customer's order #42 now!", "", "a a b"])
    out = (
        curation.token_counts_bpe(docs)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # I | 'll | " pay" | " the" | " customer" | 's | " order" | " #" |
    # 42 | " now" | ! — 11 tokens (identical in polars and DuckDB)
    assert out.loc[0, "n_bpe_tokens"] == 11
    assert out.loc[0, "n_ws_tokens"] == 7
    assert out.loc[1, "n_bpe_tokens"] == 0
    assert out.loc[1, "n_ws_tokens"] == 0
    # "a" + " a" + " b" = 3 bpe tokens, 3 distinct ("a" != " a")
    assert out.loc[2, "n_bpe_tokens"] == 3
    assert out.loc[2, "n_bpe_distinct"] == 3


def test_vocab_encode_counts(ray_session):
    docs = _docs(["b b b a a c", "a c x", "x y z"])
    out = (
        curation.vocab_encode(docs, vocab_size=2, concurrency=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # vocab = top-2 = {a (4), b (3)}; x:2, c:2 are out
    assert out.loc[0, "n_tokens"] == 6
    assert out.loc[0, "n_in_vocab"] == 5
    assert out.loc[0, "n_unk"] == 1
    assert out.loc[1, "n_in_vocab"] == 1
    assert out.loc[1, "n_unk"] == 2
    assert out.loc[2, "n_in_vocab"] == 0
    assert out.loc[2, "n_unk"] == 3


def test_tfidf_top_terms_vs_numpy_reference(ray_session):
    import math

    import ray.data

    from joint_entity_and_relation_extraction_ray.stages.curation import (
        tfidf_top_terms,
    )

    docs = {
        1: "apple banana apple cherry",
        2: "banana banana date",
        3: "apple egg egg egg fig",
        4: "",  # empty doc: no terms, no rows
    }
    ds = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in docs.items()]
    )
    got = tfidf_top_terms(ds, k=2).take_all()

    # independent reference: plain python dicts
    n_docs = len(docs)
    df = {}
    for t in docs.values():
        for term in set(t.split()):
            df[term] = df.get(term, 0) + 1
    expect = {}
    for d, t in docs.items():
        tf = {}
        for term in t.split():
            tf[term] = tf.get(term, 0) + 1
        scored = sorted(
            ((-c * math.log(n_docs / df[w]), w, c) for w, c in tf.items()),
        )[:2]
        expect[d] = [
            (i + 1, w, c, df[w], -s) for i, (s, w, c) in enumerate(scored)
        ]
    got_by_doc = {}
    for r in got:
        got_by_doc.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tf"], r["df"], r["score"])
        )
    for d in got_by_doc:
        got_by_doc[d].sort()
    assert set(got_by_doc) == {1, 2, 3}
    for d in (1, 2, 3):
        assert len(got_by_doc[d]) == len(expect[d])
        for (gr, gt, gtf, gdf, gs), (er, et, etf, edf, es) in zip(
            got_by_doc[d], expect[d]
        ):
            assert (gr, gt, gtf, gdf) == (er, et, etf, edf)
            assert abs(gs - es) < 1e-12


def test_token_topk_approx_vs_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.stages.curation import (
        token_counts,
        token_topk_approx,
    )

    # zipfian-ish corpus with a clearly separated head
    rng = np.random.default_rng(53)
    vocab = [f"w{i:03d}" for i in range(300)]
    weights = 1.0 / np.arange(1, 301) ** 1.3
    weights /= weights.sum()
    docs = []
    for i in range(200):
        toks = rng.choice(vocab, size=40, p=weights)
        docs.append(" ".join(toks))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(200), pa.int64()),
                "text": pa.array(docs),
            }
        )
    ).repartition(8)
    exact = {
        r["token"]: r["n_occurrences"]
        for r in token_counts(ds, k=300).take_all()
    }
    approx = token_topk_approx(ds, k=10).take_all()
    assert len(approx) == 10
    for r in approx:
        # one-sided guarantee: CMS never undercounts
        assert r["est_count"] >= exact.get(r["token"], 0)
    # the separated head is found exactly (w=2^15 >> 300 distinct: no
    # collisions expected, so estimates equal true counts here)
    top_exact = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["token"], r["est_count"]) for r in approx] == top_exact
    # layout independence of the estimates
    approx2 = token_topk_approx(ds.repartition(3), k=10).take_all()
    assert [(r["token"], r["est_count"]) for r in approx2] == top_exact


def test_mixture_weights_closed_form(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "lang": ["en", "en", "en", "de"],
                "source": ["web", "web", "chat", "web"],
                "text": [
                    "one two three four",  # 4 tokens
                    "five six",            # 2 tokens
                    "a b c d e f g h",     # 8 tokens (en/chat)
                    "ein zwei",            # 2 tokens (de/web)
                    ],
            }
        )
    )
    out = (
        curation.mixture_weights(ds, num_buckets=2)
        .to_pandas()
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    # groups: de/web 2 toks, en/chat 8 toks, en/web 6 toks; total 16, G=3
    assert list(out["lang"]) == ["de", "en", "en"]
    assert list(out["source"]) == ["web", "chat", "web"]
    assert list(out["n_docs"]) == [1, 1, 2]
    assert list(out["total_tokens"]) == [2, 8, 6]
    assert list(out["token_share"]) == [2 / 16, 8 / 16, 6 / 16]
    assert list(out["weight"]) == [
        (1.0 / 3) / (2 / 16),
        (1.0 / 3) / (8 / 16),
        (1.0 / 3) / (6 / 16),
    ]


def test_mixture_weights_empty_text_counts_zero(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "lang": ["en", "en"],
                "source": ["web", "web"],
                "text": ["   ", "x y"],
            }
        )
    )
    out = curation.mixture_weights(ds, num_buckets=2).to_pandas()
    assert list(out["n_docs"]) == [2]
    assert list(out["total_tokens"]) == [2]
    assert list(out["token_share"]) == [1.0]


def test_lexical_topk_boundary_ties_across_blocks(ray_session):
    from joint_entity_and_relation_extraction_ray.stages.similarity import (
        lexical_topk,
    )

    a = _docs(["q q q", "q w", "nothing here"], ids=[5, 1, 9])
    b = _docs(["q q", "w q", "zz"], ids=[2, 3, 7])
    out = lexical_topk(
        a.union(b), ("q", "w"), k=3
    ).to_pandas().reset_index(drop=True)
    # scores: 5->(3,1) 1->(2,2) 2->(2,1) 3->(2,2); top-3 by
    # (score desc, n_terms desc, doc_id asc) = 5, then 1, 3 (tie on
    # score+n_terms broken by doc_id) — doc 2 loses the boundary tie
    assert list(map(tuple, out.itertuples(index=False))) == [
        (5, 3, 1),
        (1, 2, 2),
        (3, 2, 2),
    ]


def test_lexical_topk_no_matches(ray_session):
    from joint_entity_and_relation_extraction_ray.stages.similarity import (
        lexical_topk,
    )

    import ray as _ray

    out = lexical_topk(_docs(["a b", "c"]), ("zzz",), k=5)
    assert out.count() == 0
    # schema survives an all-empty result at the BLOCK level (Ray's
    # to_pandas drops columns on 0-row datasets; the driver hash and
    # Arrow consumers read blocks)
    schemas = {tuple(_ray.get(r).schema.names) for r in out.to_arrow_refs()}
    assert schemas == {("doc_id", "score", "n_terms")}

def test_bigram_coverage_closed_form(ray_session):
    # doc 1: bigrams {a b, b c, c a, a b(dup->distinct)} = {a b, b c, c a}
    # doc 2: {a b, b x}    doc 3: {q r}    doc 4: single token, no row
    a = _docs(["a b c a b", "a b x"], ids=[1, 2])
    b = _docs(["q r", "solo"], ids=[3, 4])
    out = (
        curation.bigram_coverage(a.union(b), num_buckets=4, doc_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # df: "a b"=2 (docs 1,2); every other bigram df=1
    assert list(out["doc_id"]) == [1, 2, 3]  # doc 4 emits no row
    assert list(out["n_bigrams"]) == [3, 2, 1]
    assert list(out["n_supported"]) == [1, 1, 0]
    assert list(out["coverage"]) == [1 / 3, 1 / 2, 0.0]


def test_bigram_coverage_block_layout_invariant(ray_session):
    # duplicate (gram, doc) pairs split across blocks must not double
    # count: the same doc's repeated bigram lands in two input blocks
    one = curation.bigram_coverage(
        _docs(["u v u v u v"], ids=[7]), num_buckets=2, doc_buckets=2
    ).to_pandas()
    # bigrams of "u v u v u v": {u v, v u} — both df=1 (single doc)
    assert list(one["n_bigrams"]) == [2]
    assert list(one["n_supported"]) == [0]


def test_segment_dedup_closed_form(ray_session):
    """width=2 windows: 'x y' at aligned positions in docs 0 and 1 is
    boilerplate (2 distinct docs); doc 2's unaligned 'x y' (offset 1)
    is NOT the same segment; tail partial segments count; a doc that is
    100% boilerplate comes back as empty string, not a missing row."""
    docs = _docs(
        [
            "x y a b c",      # segs: "x y", "a b", "c"
            "x y q",          # segs: "x y", "q"
            "k x y",          # segs: "k x", "y"  (misaligned → distinct)
            "x y",            # segs: "x y"  → all boilerplate
        ]
    )
    out = (
        curation.segment_dedup(docs, width=2, min_docs=2, num_buckets=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "clean_text"] == "a b c"
    assert (out.loc[0, "n_segs"], out.loc[0, "n_dropped"]) == (3, 1)
    assert out.loc[1, "clean_text"] == "q"
    assert out.loc[2, "clean_text"] == "k x y"
    assert out.loc[2, "n_dropped"] == 0
    assert out.loc[3, "clean_text"] == ""
    assert (out.loc[3, "n_segs"], out.loc[3, "n_dropped"]) == (1, 1)


def test_segment_dedup_within_doc_repeat_not_boilerplate(ray_session):
    """A segment repeated many times INSIDE one doc but present in only
    that doc never reaches min_docs=2 (distinct-doc counting), so it
    survives; boilerplate_segments agrees."""
    docs = _docs(["p q p q p q", "r s t"])
    bp = curation.boilerplate_segments(
        docs, width=2, min_docs=2, num_buckets=4
    ).take_all()
    assert bp == []
    out = (
        curation.segment_dedup(docs, width=2, min_docs=2, num_buckets=4)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "clean_text"] == "p q p q p q"
    assert out.loc[0, "n_dropped"] == 0


def test_segment_dedup_vs_duckdb_random(ray_session):
    """Random small-vocab corpus vs the full SQL oracle (strings, not
    hashes) across widths 2 and 3 — order-preserving reassembly, tail
    segments, drop-everything docs all covered."""
    import duckdb
    import numpy as np

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(6)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 12)))
        for _ in range(120)
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(120), pa.int64()), "text": texts}
    )
    for width in (2, 3):
        got = (
            curation.segment_dedup(
                ray.data.from_arrow(tbl).repartition(7),
                width=width,
                min_docs=2,
                num_buckets=8,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = (
            duckdb.sql(
                f"""
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM tbl),
            seg AS (SELECT doc_id,
                           unnest(generate_series(1,
                               CAST((len(ws) + {width - 1}) // {width} AS BIGINT))) AS i,
                           ws FROM w),
            segs AS (SELECT doc_id, i,
                            array_to_string(ws[(i-1)*{width}+1 : i*{width}], ' ') AS seg
                     FROM seg),
            bp AS (SELECT seg FROM segs
                   GROUP BY seg HAVING count(DISTINCT doc_id) >= 2)
            SELECT s.doc_id,
                   coalesce(string_agg(s.seg, ' ' ORDER BY s.i)
                            FILTER (WHERE b.seg IS NULL), '') AS clean_text,
                   count(*) AS n_segs, count(b.seg) AS n_dropped
            FROM segs s LEFT JOIN bp b USING (seg)
            GROUP BY s.doc_id ORDER BY s.doc_id
            """
            )
            .fetchdf()
            .reset_index(drop=True)
        )
        assert got.equals(want.astype(got.dtypes.to_dict())), f"width={width}"


def test_extract_patterns_pii_closed_form(ray_session):
    """The real PII-miner use: emails + phone shapes, per-doc counts,
    docs with no hits absent, repeated hits counted."""
    docs = _docs(
        [
            "mail a@b.com then a@b.com and c@d.org end",
            "call 555-1234 now",
            "nothing here",
        ]
    )
    pats = {
        "email": r"[a-z]+@[a-z]+\.[a-z]+",
        "phone": r"\b\d{3}-\d{4}\b",
    }
    out = curation.extract_patterns(docs, pats).take_all()
    rows = {(r["doc_id"], r["kind"], r["hit"]): r["n"] for r in out}
    assert rows == {
        (0, "email", "a@b.com"): 2,
        (0, "email", "c@d.org"): 1,
        (1, "phone", "555-1234"): 1,
    }


def test_pattern_stats_rollup(ray_session):
    """Corpus rollup: n_matches sums occurrences, n_docs counts distinct
    docs — stable across block layouts (repartition shakes the combiner)."""
    docs = _docs(
        ["a@b.com a@b.com", "a@b.com x", "c@d.org", "plain"],
    ).repartition(3)
    out = curation.pattern_stats(
        docs, {"email": r"[a-z]+@[a-z]+\.[a-z]+"}, num_buckets=4
    ).take_all()
    rows = {r["hit"]: (r["n_matches"], r["n_docs"]) for r in out}
    assert rows == {"a@b.com": (3, 2), "c@d.org": (1, 1)}


def test_bpe_fit_sennrich_example(ray_session):
    """The canonical low/lower/newest/widest BPE example: merge order is
    (e,s) → (es,t) → (est,</w>) → (l,o) → (lo,w), counts exact; merge
    learning is deterministic regardless of block layout."""
    texts = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = _docs([" ".join(texts)]).union(_docs([""], ids=[99]))
    out = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in curation.bpe_fit(
            docs, num_merges=5, num_buckets=4
        ).take_all()
    ]
    assert sorted(out) == [
        (0, "e", "s", 9),
        (1, "es", "t", 9),
        (2, "est", "</w>", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
    ]


def test_bpe_fit_layout_invariant(ray_session):
    """Same corpus split across many docs/blocks → identical merge table
    (word counts are a monoid; learning sorts the collapsed vocab)."""
    words = ["scan"] * 4 + ["scans"] * 3 + ["span"] * 2
    one = _docs([" ".join(words)])
    many = _docs(words).repartition(5)
    a = sorted(
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in curation.bpe_fit(one, num_merges=6, num_buckets=4).take_all()
    )
    b = sorted(
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in curation.bpe_fit(many, num_merges=6, num_buckets=4).take_all()
    )
    assert a == b


def test_bpe_encode_counts(ray_session):
    """Applying the learned merges: fully-merged words collapse to one
    symbol chain; unknown words fall back to char+eow length; counts are
    per-doc."""
    train = _docs(["ab ab ab ab"])
    merges = curation.bpe_fit(train, num_merges=3, num_buckets=2)
    # merges learned: (a,b)→ab, (ab,</w>)  → "ab" encodes to 1 symbol
    test = _docs(["ab ab", "ab xy", "zz"], ids=[0, 1, 2])
    out = {
        r["doc_id"]: r["n_subwords"]
        for r in curation.bpe_encode(test, merges, concurrency=2).take_all()
    }
    # "ab" → ["ab</w>"] = 1; "xy" → x,y,</w> = 3; "zz" → z,z,</w> = 3
    assert out == {0: 2, 1: 4, 2: 3}


def test_decontaminate_bloom_superset_of_exact(ray_session, tmp_path):
    """Bloom decontamination: every doc the exact scan flags is flagged
    by the bloom scan with AT LEAST the same hit count (no false
    negatives by construction); on a small corpus the outputs are
    identical (FP ~0.05% per gram)."""
    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.stages.curation import (
        decontaminate,
        decontaminate_bloom,
    )

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [
                    bench_text + " extra tail words here",  # contaminated
                    "totally unrelated clean document text with many words",
                    "alpha beta gamma delta epsilon zeta eta theta done",
                ],
            }
        )
    )
    bench = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([100], pa.int64()), "text": [bench_text]})
    )
    exact = {
        r["doc_id"]: r["n_hit_grams"]
        for r in decontaminate(docs, bench, n=8, concurrency=2).take_all()
    }
    bloom = {
        r["doc_id"]: r["n_hit_grams"]
        for r in decontaminate_bloom(
            docs, bench, n=8, concurrency=2
        ).take_all()
    }
    assert set(exact) <= set(bloom)
    for k, v in exact.items():
        assert bloom[k] >= v
    assert exact == bloom  # no FP expected at this scale
    assert 1 in exact and 2 not in exact


def test_token_dispersion_exact_and_bursty_signal(ray_session):
    """token_dispersion: exact integer sufficient statistics, and the
    burstiness signal behaves (one-doc spam term has higher sum_c2 than
    an evenly-spread term with the same total count)."""
    import pyarrow as pa
    import ray.data

    from joint_entity_and_relation_extraction_ray.stages.curation import (
        token_dispersion,
    )

    docs = pa.table(
        {
            "doc_id": pa.array(range(10), pa.int64()),
            "text": ["spread " + ("spam " * (10 if i == 0 else 0))
                     for i in range(10)],
        }
    )
    out = {
        r["token"]: (r["n_occurrences"], r["n_docs"], r["sum_c2"])
        for r in token_dispersion(
            ray.data.from_arrow(docs).repartition(3), min_occ=10
        ).take_all()
    }
    assert out["spread"] == (10, 10, 10)   # 1 per doc: sum_c2 = 10
    assert out["spam"] == (10, 1, 100)     # all in one doc: sum_c2 = 100
    assert out["spam"][2] > out["spread"][2]
