"""Dialog-structure ops: tool-call bigrams and per-tool usage profiles."""

import pyarrow as pa
import ray.data

from joint_entity_and_relation_extraction_ray.stages import dialog


def _turns(rows):
    """rows: (conv_id, turn_idx, tool-or-None)."""
    return ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array(["assistant"] * len(rows), pa.string()),
                "tool": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


def test_tool_transitions_skips_non_tool_turns(ray_session):
    rows = [
        ("c1", 0, "search"),
        ("c1", 1, None),       # intervening non-tool turn is skipped
        ("c1", 2, "fetch"),
        ("c1", 3, "fetch"),
        ("c2", 0, "fetch"),    # conversation boundary: no bigram across convs
        ("c2", 1, "search"),
        ("c3", 0, "search"),   # single tool turn: contributes nothing
    ]
    out = (
        dialog.tool_transitions(_turns(rows), num_buckets=4)
        .to_pandas()
        .sort_values(["tool_a", "tool_b"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("fetch", "fetch", 1),
        ("fetch", "search", 1),
        ("search", "fetch", 1),
    ]


def test_tool_transitions_unordered_input(ray_session):
    # bigrams follow turn_idx order even when rows arrive shuffled
    rows = [
        ("c1", 2, "c"),
        ("c1", 0, "a"),
        ("c1", 4, "b"),
    ]
    out = (
        dialog.tool_transitions(_turns(rows), num_buckets=2)
        .to_pandas()
        .sort_values(["tool_a", "tool_b"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("a", "c", 1),
        ("c", "b", 1),
    ]


def test_tool_stats_exact_distinct_convs(ray_session):
    rows = [
        ("c1", 0, "search"),
        ("c1", 5, "search"),   # same conv twice: n_convs counts once
        ("c1", 2, "fetch"),
        ("c2", 1, "search"),
        ("c2", 9, None),       # non-tool turn excluded entirely
    ]
    out = (
        dialog.tool_stats(_turns(rows), num_buckets=4)
        .to_pandas()
        .sort_values("tool")
        .reset_index(drop=True)
    )
    assert list(out["tool"]) == ["fetch", "search"]
    assert list(out["n_calls"]) == [1, 3]
    assert list(out["n_convs"]) == [1, 2]
    assert list(out["min_turn"]) == [2, 0]
    assert list(out["max_turn"]) == [2, 5]


def test_tool_stats_distinct_survives_block_splits(ray_session):
    # the same (conv, tool) pair appearing in different input blocks must
    # still count one conversation — the conv-bucketed merge collapses it
    a = _turns([("c1", 0, "x"), ("c1", 1, "x")])
    b = _turns([("c1", 7, "x"), ("c2", 0, "x")])
    out = (
        dialog.tool_stats(a.union(b), num_buckets=4)
        .to_pandas()
        .reset_index(drop=True)
    )
    assert list(out["tool"]) == ["x"]
    assert list(out["n_calls"]) == [4]
    assert list(out["n_convs"]) == [2]
    assert list(out["min_turn"]) == [0]
    assert list(out["max_turn"]) == [7]


def _conv(rows):
    """rows: (conv_id, turn_idx, role, text)."""
    return ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array([r[2] for r in rows], pa.string()),
                "text": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )


def test_conv_dedup_keep_first_by_signature(ray_session):
    rows = [
        # c1 and c3 are the same (role, text) sequence -> dups, keep c1
        ("c1", 0, "user", "hi"),
        ("c1", 1, "assistant", "hello"),
        ("c3", 0, "user", "hi"),
        ("c3", 1, "assistant", "hello"),
        # c2: same texts, different role on turn 1 -> distinct signature
        ("c2", 0, "user", "hi"),
        ("c2", 1, "user", "hello"),
        # c4: same content, different ORDER -> distinct signature
        ("c4", 0, "assistant", "hello"),
        ("c4", 1, "user", "hi"),
    ]
    out = (
        dialog.conv_dedup(_conv(rows), num_buckets=4)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("c1", 2, 2),
        ("c2", 1, 2),
        ("c4", 1, 2),
    ]


def test_conv_dedup_order_and_block_layout_invariant(ray_session):
    # shuffled rows + duplicate conv split across two input blocks give
    # the same signature as the contiguous ordered one
    a = _conv([("c9", 1, "assistant", "b"), ("c9", 0, "user", "a")])
    b = _conv([("c8", 0, "user", "a")])
    c = _conv([("c8", 1, "assistant", "b")])
    out = (
        dialog.conv_dedup(a.union(b).union(c), num_buckets=4)
        .to_pandas()
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.itertuples(index=False))) == [("c8", 2, 2)]


def test_boilerplate_turns_exact_distinct_and_threshold(ray_session):
    rows = [
        ("c1", 0, "system", "You are helpful."),
        ("c2", 0, "system", "You are helpful."),
        ("c2", 3, "system", "You are helpful."),  # repeat inside one conv
        ("c3", 0, "system", "You are helpful."),
        ("c1", 1, "user", "only once"),
        ("c1", 2, "user", "twice same conv"),
        ("c1", 3, "user", "twice same conv"),  # 2 turns but 1 conv -> out
    ]
    out = (
        dialog.boilerplate_turns(_conv(rows), min_convs=2, num_buckets=4)
        .to_pandas()
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("You are helpful.", 4, 3)
    ]


def test_turn_runs_closed_form(ray_session):
    rows = [
        # c1: user,user,assistant,user -> runs [2,1,1], max 2
        ("c1", 0, "user", "a"),
        ("c1", 1, "user", "b"),
        ("c1", 2, "assistant", "c"),
        ("c1", 3, "user", "d"),
        # c2: tool,tool,tool -> one run of 3, no user/assistant turns
        ("c2", 0, "tool", "x"),
        ("c2", 1, "tool", "y"),
        ("c2", 2, "tool", "z"),
    ]
    out = (
        dialog.turn_runs(_conv_roles(rows), num_buckets=4)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("c1", 4, 3, 2, 3, 1),
        ("c2", 3, 1, 3, 0, 0),
    ]


def test_turn_runs_block_split_and_order_invariant(ray_session):
    # one conversation split across blocks, rows arriving out of order
    a = _conv_roles([("c1", 2, "user", "c"), ("c1", 0, "user", "a")])
    b = _conv_roles([("c1", 1, "user", "b"), ("c1", 3, "assistant", "d")])
    out = dialog.turn_runs(a.union(b), num_buckets=4).to_pandas()
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("c1", 4, 2, 3, 3, 1)
    ]


def _conv_roles(rows):
    """rows: (conv_id, turn_idx, role, text) — alias of _conv for run tests."""
    return _conv(rows)


def test_conv_near_dup_exact_jaccard(ray_session):
    # conv-1 and conv-2: identical except one extra trailing turn;
    # conv-3 is unrelated. 3-gram shingles of the joined docs:
    # doc1 = "a b c d e"      -> {abc, bcd, cde}              (3)
    # doc2 = "a b c d e x y z" -> {abc, bcd, cde, dex, exy, xyz} (6)
    # J(1,2) = 3/6 = 0.5 >= 0.25 -> pair (1, 2)
    rows = [
        ("conv-1", 0, "user", "a b c"),
        ("conv-1", 1, "assistant", "d e"),
        ("conv-2", 0, "user", "a b c"),
        ("conv-2", 1, "assistant", "d e"),
        ("conv-2", 2, "user", "x y z"),
        ("conv-3", 0, "user", "p q r s t u"),
    ]
    out = (
        dialog.conv_near_dup(_conv(rows), threshold=0.25, num_buckets=4)
        .to_pandas()
        .sort_values(["conv_a", "conv_b"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.itertuples(index=False))) == [(1, 2)]


def test_conv_near_dup_threshold_boundary(ray_session):
    # J exactly at the threshold must KEEP the pair (>=, not >):
    # doc1 {abc,bcd,cde} (3), doc4 = "a b c q r s" -> {abc,bcq,cqr,qrs}
    # J = 1/6 ≈ 0.167 < 0.25 -> excluded; with threshold 1/6 exact?
    # use docs engineered for J = 0.25: |A|=3, |B|=2 sharing 1
    # doc5 = "a b c d" -> {abc, bcd}; J(1,5) = 2/3 no... build exact:
    # A = {abc,bcd,cde} B = {abc, zzz1, zzz2}? B from "a b c z1 z2":
    # {abc, bcz1, cz1z2} share {abc} -> J = 1/5 = 0.2 < 0.25 excluded.
    rows = [
        ("conv-1", 0, "user", "a b c d e"),
        ("conv-5", 0, "user", "a b c z1 z2"),
    ]
    out = dialog.conv_near_dup(
        _conv(rows), threshold=0.25, num_buckets=2
    ).to_pandas()
    assert len(out) == 0
    # at threshold 0.125 (exact binary) the J=0.2 pair survives
    out2 = dialog.conv_near_dup(
        _conv(rows), threshold=0.125, num_buckets=2
    ).to_pandas()
    assert list(map(tuple, out2.itertuples(index=False))) == [(1, 5)]


def test_curate_transcripts_all_stages(ray_session):
    long = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [
        # conv-1: clean 4-turn dialog -> survives; md5("1")=c4.. -> train
        ("conv-1", 0, "user", long),
        ("conv-1", 1, "assistant", "ok fine then"),
        ("conv-1", 2, "user", "more words here"),
        ("conv-1", 3, "assistant", "done now bye"),
        # conv-2: EXACT duplicate of conv-1 -> dropped at stage 2
        ("conv-2", 0, "user", long),
        ("conv-2", 1, "assistant", "ok fine then"),
        ("conv-2", 2, "user", "more words here"),
        ("conv-2", 3, "assistant", "done now bye"),
        # conv-3: near-dup of conv-1 (same long turn, one change) ->
        # J(1,3) well above 0.25 -> CC cluster {1,3}, 3 dropped
        ("conv-3", 0, "user", long),
        ("conv-3", 1, "assistant", "ok fine then"),
        ("conv-3", 2, "user", "more words here"),
        ("conv-3", 3, "assistant", "done now byee"),
        # conv-7: too short (2 turns) -> gated out at stage 1
        ("conv-7", 0, "user", "hi"),
        ("conv-7", 1, "assistant", "yo"),
        # conv-8: no assistant turn -> gated out
        ("conv-8", 0, "user", "a a a a"),
        ("conv-8", 1, "user", "b b b b"),
        ("conv-8", 2, "user", "c c c c"),
        ("conv-8", 3, "user", "d d d d"),
        # conv-9: distinct clean dialog -> survives; md5("9")=45.. -> train
        ("conv-9", 0, "user", "p q r s t u v"),
        ("conv-9", 1, "assistant", "x y z x y z"),
        ("conv-9", 2, "user", "q r s t"),
        ("conv-9", 3, "assistant", "final words go here"),
    ]
    out = (
        dialog.curate_transcripts(_conv(rows), num_buckets=4)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("conv-1", "train"),
        ("conv-9", "train"),
    ]


def test_curate_transcripts_max_run_gate(ray_session):
    # 5 consecutive assistant turns (> max_run_cap=4) -> gated out even
    # though long enough and both roles present
    rows = [("conv-4", 0, "user", "start here")] + [
        ("conv-4", i, "assistant", f"spam {i} spam") for i in range(1, 6)
    ]
    out = dialog.curate_transcripts(_conv(rows), num_buckets=2).to_pandas()
    assert len(out) == 0
