"""Dialog-structure analytics over the T0 transcript stream.

Operators on the *conversation* axis that read only the light columns
(`conv_id`, `turn_idx`, `role`, `tool`) — never the text payload — so
the shuffles they run move a few bytes per turn even when the corpus
carries multi-KB turns. Each op is one conv-bucketed shuffle (all rows
of a conversation land in one bucket; `functions/shuffle.py
bucket_group_apply`) with a vectorized polars kernel per bucket, then a
tiny second merge shuffle on the result key — the same decomposable
partial→merge shape as the token/role-pattern counters.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.shuffle import bucket_group_apply


def tool_transitions(
    ds: ray.data.Dataset, *, num_buckets: int = 32
) -> ray.data.Dataset:
    """Tool-call bigram counts: for every conversation, the sequence of
    NON-NULL `tool` values ordered by `turn_idx`; each consecutive pair
    (intervening non-tool turns are skipped) contributes one count.
    Rows ``(tool_a, tool_b, n:int64)`` — the agent-trajectory transition
    matrix used to mine common tool-chaining patterns from assistant
    transcripts. SQL mirror: ``LAG(tool) OVER (PARTITION BY conv_id
    ORDER BY turn_idx)`` on the tool-bearing turns.

    Dataflow: project to (conv_id, turn_idx, tool) and drop null tools
    BEFORE the shuffle (tool turns are a minority of the stream), then
    one conv-bucketed shuffle; per bucket a vectorized sort + per-conv
    shift emits bigram partial counts, and a second tiny shuffle on
    `tool_a` merges partials. At 100 TB only (conv_id, turn_idx, tool)
    triples of tool turns move, and the merge input is bounded by
    |tools|² per bucket."""
    import pyarrow.compute as pc

    slim = ds.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "tool"]).filter(
            pc.is_valid(t["tool"])
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    out_schema = pa.schema(
        [("tool_a", pa.string()), ("tool_b", pa.string()), ("n", pa.int64())]
    )

    def _bigrams(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return out_schema.empty_table()
        df = (
            pl.from_arrow(t)
            .sort(["conv_id", "turn_idx"])
            .with_columns(prev=pl.col("tool").shift(1).over("conv_id"))
            .drop_nulls("prev")
        )
        return (
            df.group_by(["prev", "tool"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .rename({"prev": "tool_a", "tool": "tool_b"})
            .to_arrow()
            .cast(out_schema)
        )

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return out_schema.empty_table()
        return (
            pl.from_arrow(t)
            .group_by(["tool_a", "tool_b"])
            .agg(pl.col("n").sum())
            .to_arrow()
            .cast(out_schema)
        )

    partial = bucket_group_apply(
        slim, "conv_id", _bigrams, num_buckets=num_buckets
    )
    return bucket_group_apply(partial, "tool_a", _merge, num_buckets=4)


def tool_stats(
    ds: ray.data.Dataset, *, num_buckets: int = 8
) -> ray.data.Dataset:
    """Per-tool usage profile: invocation count, distinct conversations,
    and the min/max turn position at which the tool fires — rows
    ``(tool, n_calls, n_convs, min_turn, max_turn)``. The "which tools
    matter and where in the dialog do they appear" audit.

    n_calls/min/max are plainly decomposable; the DISTINCT conv count
    uses disjoint conv partials: per block we reduce to distinct
    (tool, conv_id) pairs, the shuffle buckets by conv_id so every
    bucket's pairs are conversation-disjoint, and per-bucket distinct
    counts merge by plain sum — the same exact-distinct decomposition as
    the sliding-active-users op (`stages/events.py`)."""
    import pyarrow.compute as pc

    slim = ds.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "tool"]).filter(
            pc.is_valid(t["tool"])
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    part_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("tool", pa.string()),
            ("n_calls", pa.int64()),
            ("n_convs", pa.int64()),
            ("min_turn", pa.int64()),
            ("max_turn", pa.int64()),
        ]
    )
    out_schema = pa.schema(
        [
            ("tool", pa.string()),
            ("n_calls", pa.int64()),
            ("n_convs", pa.int64()),
            ("min_turn", pa.int64()),
            ("max_turn", pa.int64()),
        ]
    )

    def _partial(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return part_schema.empty_table()
        return (
            pl.from_arrow(t)
            .group_by(["conv_id", "tool"])
            .agg(
                pl.len().cast(pl.Int64).alias("n_calls"),
                pl.lit(1, dtype=pl.Int64).alias("n_convs"),
                pl.col("turn_idx").min().cast(pl.Int64).alias("min_turn"),
                pl.col("turn_idx").max().cast(pl.Int64).alias("max_turn"),
            )
            .to_arrow()
            .cast(part_schema)
        )

    def _bucket_merge(t: pa.Table) -> pa.Table:
        # within a conv bucket, collapse duplicate (conv, tool) partials
        # from different blocks, then roll up to per-tool counts
        import polars as pl

        if not t.num_rows:
            return out_schema.empty_table()
        per_conv = (
            pl.from_arrow(t)
            .group_by(["conv_id", "tool"])
            .agg(
                pl.col("n_calls").sum(),
                pl.col("min_turn").min(),
                pl.col("max_turn").max(),
            )
        )
        return (
            per_conv.group_by("tool")
            .agg(
                pl.col("n_calls").sum(),
                pl.len().cast(pl.Int64).alias("n_convs"),
                pl.col("min_turn").min(),
                pl.col("max_turn").max(),
            )
            .select(["tool", "n_calls", "n_convs", "min_turn", "max_turn"])
            .to_arrow()
            .cast(out_schema)
        )

    def _final(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return out_schema.empty_table()
        return (
            pl.from_arrow(t)
            .group_by("tool")
            .agg(
                pl.col("n_calls").sum(),
                pl.col("n_convs").sum(),  # conv-disjoint buckets: plain sum
                pl.col("min_turn").min(),
                pl.col("max_turn").max(),
            )
            .select(["tool", "n_calls", "n_convs", "min_turn", "max_turn"])
            .to_arrow()
            .cast(out_schema)
        )

    partials = slim.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    per_bucket = bucket_group_apply(
        partials, "conv_id", _bucket_merge, num_buckets=num_buckets
    )
    return bucket_group_apply(per_bucket, "tool", _final, num_buckets=2)


def conv_dedup(
    ds: ray.data.Dataset, *, num_buckets: int = 32
) -> ray.data.Dataset:
    """Conversation-level exact dedup: two transcripts are duplicates when
    their (role, text) sequences ordered by turn position are identical,
    regardless of conv_id / timestamps / tool annotations. Keep-first
    (min conv_id) per signature → ``(conv_id, n_dups:int64,
    n_turns:int64)`` — the corpus-hygiene pass that collapses re-ingested
    or mirrored conversations before any extraction work is spent on
    them. SQL mirror: ``GROUP BY string_agg(role || chr(30) || text,
    chr(31) ORDER BY turn_idx, text, role)`` per conv.

    Dataflow: one conv-bucketed shuffle moves the raw turns (the only
    pass that touches text), each bucket collapses its conversations to a
    16-byte md5 signature row, and the second shuffle — keyed on the
    digest — moves ONE short row per conversation, never the text. The
    per-conv md5 is a Python call per CONVERSATION (same idiom as
    `functions/textstats.fingerprint`), not per turn."""
    import hashlib

    slim = ds.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "role", "text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    sig_schema = pa.schema(
        [
            ("digest", pa.string()),
            ("conv_id", pa.string()),
            ("n_turns", pa.int64()),
        ]
    )
    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_dups", pa.int64()),
            ("n_turns", pa.int64()),
        ]
    )

    def _sign(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return sig_schema.empty_table()
        sigs = (
            pl.from_arrow(t)
            # deterministic under duplicate turn_idx: same tie-break as
            # the SQL ORDER BY (turn_idx, text, role)
            .sort(["conv_id", "turn_idx", "text", "role"])
            .group_by("conv_id", maintain_order=True)
            .agg(
                (pl.col("role") + "\x1e" + pl.col("text"))
                .str.join("\x1f")
                .alias("sig"),
                pl.len().cast(pl.Int64).alias("n_turns"),
            )
        )
        digests = [
            hashlib.md5(s.encode("utf-8")).hexdigest()
            for s in sigs["sig"].to_list()
        ]
        return pa.table(
            {
                "digest": pa.array(digests, pa.string()),
                "conv_id": sigs["conv_id"].to_arrow().cast(pa.string()),
                "n_turns": sigs["n_turns"].to_arrow(),
            }
        ).cast(sig_schema)

    def _keep_first(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return out_schema.empty_table()
        return (
            pl.from_arrow(t)
            .group_by("digest")
            .agg(
                pl.col("conv_id").min(),
                pl.len().cast(pl.Int64).alias("n_dups"),
                # identical signature => identical turn count
                pl.col("n_turns").min(),
            )
            .select(["conv_id", "n_dups", "n_turns"])
            .to_arrow()
            .cast(out_schema)
        )

    sigs = bucket_group_apply(slim, "conv_id", _sign, num_buckets=num_buckets)
    return bucket_group_apply(sigs, "digest", _keep_first, num_buckets=8)


def boilerplate_turns(
    ds: ray.data.Dataset, *, min_convs: int = 2, num_buckets: int = 32
) -> ray.data.Dataset:
    """Template/boilerplate detection: turn texts that recur across
    ``min_convs`` or more DISTINCT conversations → ``(text,
    n_turns:int64, n_convs:int64)``. System prompts, canned greetings
    and injected instructions surface here; the output is the strip-list
    a curation pass subtracts before near-dup or quality scoring.

    Dataflow: a per-block combiner first collapses to distinct
    (text, conv_id) pairs with a local count — boilerplate is by
    definition high-repeat, so this is a large reduction — then ONE
    text-bucketed shuffle makes the per-text conversation sets disjoint
    by bucket, so ``n_unique(conv_id)`` per bucket is the EXACT global
    distinct count (same decomposition as `tool_stats`)."""

    out_schema = pa.schema(
        [
            ("text", pa.string()),
            ("n_turns", pa.int64()),
            ("n_convs", pa.int64()),
        ]
    )

    def _partial(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return pa.schema(
                [
                    ("text", pa.string()),
                    ("conv_id", pa.string()),
                    ("n", pa.int64()),
                ]
            ).empty_table()
        return (
            pl.from_arrow(t.select(["conv_id", "text"]))
            .group_by(["text", "conv_id"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    def _merge(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return out_schema.empty_table()
        return (
            pl.from_arrow(t)
            .group_by("text")
            .agg(
                pl.col("n").sum().alias("n_turns"),
                pl.col("conv_id").n_unique().cast(pl.Int64).alias("n_convs"),
            )
            .filter(pl.col("n_convs") >= min_convs)
            .select(["text", "n_turns", "n_convs"])
            .to_arrow()
            .cast(out_schema)
        )

    partials = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucket_group_apply(partials, "text", _merge, num_buckets=num_buckets)


def turn_runs(
    ds: ray.data.Dataset, *, num_buckets: int = 32
) -> ray.data.Dataset:
    """Turn-taking structure per conversation (gaps-and-islands): the
    number of maximal same-role runs, the longest run length, and the
    per-role turn totals — rows ``(conv_id, n_turns, n_runs, max_run,
    n_user, n_assistant)``. Long single-role runs flag degenerate
    transcripts (stuck agent loops, concatenation artifacts) before they
    enter a training mix; n_runs/n_turns is the turn-taking ratio
    dialogue-quality filters threshold on. SQL mirror: LAG-based run
    breaks summed into run ids, two GROUP BYs.

    Dataflow: one conv-bucketed shuffle of (conv_id, turn_idx, role)
    triples — a few bytes per turn, text never moves — then a vectorized
    polars run-length kernel per bucket. Output is one row per
    conversation produced in the same pass."""

    slim = ds.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "role"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_turns", pa.int64()),
            ("n_runs", pa.int64()),
            ("max_run", pa.int64()),
            ("n_user", pa.int64()),
            ("n_assistant", pa.int64()),
        ]
    )

    def _runs(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return out_schema.empty_table()
        df = (
            pl.from_arrow(t)
            .sort(["conv_id", "turn_idx"])
            .with_columns(
                (pl.col("role") != pl.col("role").shift(1))
                .fill_null(True)
                .over("conv_id")
                .alias("brk")
            )
            .with_columns(
                pl.col("brk").cum_sum().over("conv_id").alias("run_id")
            )
        )
        runs = df.group_by(["conv_id", "run_id"]).agg(
            pl.len().cast(pl.Int64).alias("run_len")
        )
        per_run = runs.group_by("conv_id").agg(
            pl.len().cast(pl.Int64).alias("n_runs"),
            pl.col("run_len").max().alias("max_run"),
            pl.col("run_len").sum().alias("n_turns"),
        )
        per_role = df.group_by("conv_id").agg(
            (pl.col("role") == "user")
            .sum()
            .cast(pl.Int64)
            .alias("n_user"),
            (pl.col("role") == "assistant")
            .sum()
            .cast(pl.Int64)
            .alias("n_assistant"),
        )
        return (
            per_run.join(per_role, on="conv_id")
            .select(
                ["conv_id", "n_turns", "n_runs", "max_run",
                 "n_user", "n_assistant"]
            )
            .to_arrow()
            .cast(out_schema)
        )

    return bucket_group_apply(slim, "conv_id", _runs, num_buckets=num_buckets)


def conv_near_dup(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.25,
    k: int = 3,
    max_posting: int | None = None,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Conversation-level near-duplicate pairs: each conversation's turn
    texts (ordered by turn position) join into one document, and the
    EXACT word-k-gram Jaccard similarity join
    (`stages/dedup.ngram_jaccard_pairs` — inverted-index decomposition,
    never all-pairs) returns ``(conv_a, conv_b)`` with J ≥ ``threshold``.
    Multi-turn chat corpora are full of re-ingested sessions that differ
    only in ids/timestamps or a trailing turn — turn-level exact dedup
    (`conv_dedup`) misses those; this catches them.

    ``threshold`` should be exactly representable in binary (0.25, 0.5)
    so the engine's float comparisons and a decimal SQL oracle agree at
    boundary pairs. Conversation keys ride the pair shuffles as int64
    (the digits of ``conv-%d`` ids; arbitrary id schemes would use
    `schema.stable_hash64` instead) — the joined text is shingled once
    and only (hash, id) postings move.

    Dataflow: one conv-bucketed shuffle builds the conv-docs (the only
    pass over text), then the exact-join machinery: postings explode →
    shingle-hash bucket pair-gen → per-pair count merge → true-set
    verification.

    LOW-ENTROPY CORPORA: when conversations draw from a small shared
    vocabulary (templated agents, the synthetic grammar at sf0.1), a
    stop-shingle's posting list can approach the conversation count and
    the TRUE pair set itself goes quadratic (measured on the sf0.1
    fixture: one 3-gram shared by 44,860 of ~60k convs, 3.7×10¹⁰
    candidate pairs — no shingle size fixes an answer that is itself
    O(n²)). Production settings there: bound ``max_posting`` (LOGGED
    truncation, same convention as dedup's ``max_bucket``), raise ``k``
    or ``threshold``, and consume the CLUSTERS via
    `curate_transcripts` / `dedup_apply` rather than the raw pair list.
    Exact by default: ``max_posting=None``."""
    import polars as pl

    from .dedup import ngram_jaccard_pairs

    slim = ds.map_batches(
        lambda t: t.select(["conv_id", "turn_idx", "text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    cdoc_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])

    def _cdoc(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return cdoc_schema.empty_table()
        return (
            pl.from_arrow(t)
            .sort(["conv_id", "turn_idx", "text"])
            .group_by("conv_id", maintain_order=True)
            .agg(pl.col("text").str.join(" "))
            .with_columns(
                pl.col("conv_id")
                .str.extract(r"(\d+)")
                .cast(pl.Int64)
                .alias("doc_id")
            )
            .select(["doc_id", "text"])
            .to_arrow()
            .cast(cdoc_schema)
        )

    docs = bucket_group_apply(slim, "conv_id", _cdoc, num_buckets=num_buckets)
    pairs = ngram_jaccard_pairs(
        docs, threshold=threshold, k=k, max_posting=max_posting
    )
    return pairs.map_batches(
        lambda t: t.rename_columns(["conv_a", "conv_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def curate_transcripts(
    ds: ray.data.Dataset,
    *,
    min_turns: int = 4,
    max_run_cap: int = 4,
    jaccard: float = 0.25,
    max_posting: int | None = None,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """The COMPOSITE chat-corpus curation pipeline — the transcript
    analogue of `pipelines/corpus_ops.q_curate_corpus`, every stage of
    which is individually driver-verified:

    1. structural quality gate (`turn_runs`): keep conversations with
       ≥ ``min_turns`` validated turns, at least one user AND one
       assistant turn, and no same-role run longer than ``max_run_cap``
       (stuck-loop artifacts);
    2. conversation-level EXACT dedup (`conv_dedup` semantics): drop any
       conversation whose (role, text) sequence duplicates a
       smaller-conv_id keeper;
    3. near-dup collapse (`conv_near_dup` → `stages/dedup.dedup_apply`):
       exact word-3-gram Jaccard ≥ ``jaccard`` pairs → connected
       components → min conv number survives per cluster;
    4. deterministic split assignment: md5(conv number) hex-prefix
       (< 'e6' train, < 'f3' val, else test — the split_assign rule).

    Output ``(conv_id, split)`` — one row per surviving conversation.

    Scale shape: the turn stream shuffles ONCE per conv-keyed stage and
    each filter between stages is a `membership_join` (broadcast id set
    under guard, co-bucketed hash semi-join above it) — the corpus text
    itself moves only into the conv buckets that build signatures and
    conv docs; CC runs on the pair graph only. On low-entropy corpora
    where the true near-dup graph goes quadratic, bound ``max_posting``
    (logged truncation; see `conv_near_dup`) — the CC survivor set is
    barely affected because giant clusters stay connected through the
    surviving pairs."""
    import hashlib

    from .dedup import dedup_apply
    from .relational import membership_join

    # 1 — structural gate
    stats = turn_runs(ds, num_buckets=num_buckets)

    def _gate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.and_(
                pc.greater_equal(t["n_turns"], min_turns),
                pc.less_equal(t["max_run"], max_run_cap),
            ),
            pc.and_(
                pc.greater_equal(t["n_user"], 1),
                pc.greater_equal(t["n_assistant"], 1),
            ),
        )
        return t.filter(keep).select(["conv_id"])

    out_schema = pa.schema([("conv_id", pa.string()), ("split", pa.string())])

    # per-conv stats rows (one per conversation — far smaller than the
    # turn stream) are consumed twice below; materialize once and guard
    # the everything-gated-out corpus, whose empty blocks would otherwise
    # reach the shuffle machinery schema-less
    ok = stats.map_batches(
        _gate, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if ok.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    gated = membership_join(ds, ok, on="conv_id")

    # 2 — exact dedup survivors (keep-first per signature)
    keep1 = conv_dedup(gated, num_buckets=num_buckets).map_batches(
        lambda t: t.select(["conv_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    t2 = membership_join(gated, keep1, on="conv_id")

    # 3 — near-dup CC survivor filter on conv numbers
    pairs = conv_near_dup(
        t2,
        threshold=jaccard,
        max_posting=max_posting,
        num_buckets=num_buckets,
    ).map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _ids(t: pa.Table) -> pa.Table:
        import polars as pl

        if not t.num_rows:
            return pa.schema(
                [("doc_id", pa.int64()), ("conv_id", pa.string())]
            ).empty_table()
        return (
            pl.from_arrow(t.select(["conv_id"]))
            .unique()
            .with_columns(
                pl.col("conv_id")
                .str.extract(r"(\d+)")
                .cast(pl.Int64)
                .alias("doc_id")
            )
            .select(["doc_id", "conv_id"])
            .to_arrow()
        )

    # distinct (conv number, conv_id) rows: keep1 already has one row
    # per surviving conversation
    ids = keep1.map_batches(_ids, batch_format="pyarrow", zero_copy_batch=True)
    survivors = dedup_apply(ids, pairs)

    # 4 — split assignment on the conv number (mirrors split_assign)
    def _assign(t: pa.Table) -> pa.Table:
        nums = t["doc_id"].to_pylist()
        h = [hashlib.md5(str(n).encode()).hexdigest()[:2] for n in nums]
        split = [
            "train" if x < "e6" else "val" if x < "f3" else "test" for x in h
        ]
        return pa.table(
            {"conv_id": t["conv_id"], "split": pa.array(split, pa.string())}
        )

    return survivors.map_batches(
        _assign, batch_format="pyarrow", zero_copy_batch=True
    )
