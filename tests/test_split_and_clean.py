"""M4 turn splitting (length-capped model units, offset math) and
dirty-input repair (keep-first duplicate turns, dense-index assertion) —
SURVEY.md §2.2 M4 + "streaming semantics"."""

import datetime as dt

import pyarrow as pa
import pytest
import ray.data

from joint_entity_and_relation_extraction_ray.functions.text import split_units
from joint_entity_and_relation_extraction_ray.sources.transcripts import (
    clean_turns,
)
from joint_entity_and_relation_extraction_ray.stages.scorer import TripleScorer

GAZ = [("alice", "Peop"), ("acme corp", "Org"), ("berlin", "Loc")]


# --- split_units offset math (pure, no Ray) --------------------------------


def test_split_units_identity_when_short():
    assert split_units("hello world", 100) == [(0, "hello world")]


def test_split_units_reassembles_exactly():
    text = " ".join(f"tok{i}" for i in range(500))
    units = split_units(text, 64)
    assert len(units) > 1
    # offsets are exact slices of the original text
    for base, sub in units:
        assert text[base : base + len(sub)] == sub
    assert "".join(sub for _, sub in units) == text
    # every unit obeys the cap
    assert all(len(sub) <= 64 for _, sub in units)


def test_split_units_never_cuts_tokens():
    text = " ".join(f"tok{i}" for i in range(200))
    for _, sub in split_units(text, 50):
        # boundaries are whitespace: no token fragments at unit edges
        assert not sub.startswith("ok") and not sub.endswith("to")


def test_split_units_giant_token_hard_cut():
    text = "x" * 1000  # one giant token: progress requires a hard cut
    units = split_units(text, 128)
    assert "".join(sub for _, sub in units) == text
    assert all(len(sub) <= 128 for _, sub in units)


# --- scorer under splitting ------------------------------------------------


def _batch(texts):
    n = len(texts)
    return pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(n)], pa.string()),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array([0] * n, pa.timestamp("us")),
        }
    )


def test_scorer_split_equals_unsplit_at_sentence_boundaries():
    """When cuts fall between sentences, split output == unsplit output
    (absolute offsets, same mention ids)."""
    text = "Alice works for Acme Corp . " * 30  # ~840 chars
    unsplit = TripleScorer(GAZ, max_unit_chars=10_000)(_batch([text]))
    split = TripleScorer(GAZ, max_unit_chars=100)(_batch([text]))
    assert unsplit.num_rows > 0
    us = unsplit.to_pandas().sort_values(["kind", "start", "mention_id"],
                                         na_position="first")
    sp = split.to_pandas().sort_values(["kind", "start", "mention_id"],
                                       na_position="first")
    assert us.reset_index(drop=True).equals(sp.reset_index(drop=True))


def test_scorer_mega_turn_offsets_are_absolute():
    filler = "pad " * 60  # pushes the entity past the first unit
    text = filler + "Alice lives in Berlin ."
    out = TripleScorer(GAZ, max_unit_chars=80)(_batch([text]))
    df = out.to_pandas()
    mentions = df[df["kind"] == "mention"]
    assert len(mentions) == 2
    for _, m in mentions.iterrows():
        assert text[int(m["start"]) : int(m["end"])] == m["surface"]
    triples = df[df["kind"] == "triple"]
    assert list(triples["pred"]) == ["Live_In"]


# --- dirty-input repair ----------------------------------------------------


def _ts(sec):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def _dirty(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array(["user"] * len(rows), pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
                "tool": pa.array([None] * len(rows), pa.string()),
                # content-derived ts (not row order) so determinism checks
                # compare like-for-like under shuffled input
                "ts": pa.array([_ts(r[1]) for r in rows], pa.timestamp("us")),
            }
        )
    )


def test_clean_turns_keep_first_deterministic(ray_session):
    rows = [
        ("c1", 0, "hello"),
        ("c1", 1, "zzz duplicate B"),
        ("c1", 1, "aaa duplicate A"),  # duplicate turn: keep min-sorted text
        ("c1", 2, "bye"),
        ("c2", 0, "solo"),
    ]
    out = (
        clean_turns(_dirty(rows), num_buckets=4)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert list(out["turn_idx"]) == [0, 1, 2, 0]
    assert out.loc[1, "text"] == "aaa duplicate A"  # deterministic survivor
    # rerun: identical (determinism does not depend on block order)
    out2 = (
        clean_turns(_dirty(rows[::-1]), num_buckets=4)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert out.equals(out2)


def test_clean_turns_assert_dense_raises(ray_session):
    rows = [("c1", 0, "a"), ("c1", 2, "gap!")]
    with pytest.raises(Exception, match="non-dense"):
        clean_turns(_dirty(rows), num_buckets=2, assert_dense=True).count()


def test_clean_turns_dense_input_passes(ray_session):
    rows = [("c1", 0, "a"), ("c1", 1, "b"), ("c2", 0, "c")]
    assert (
        clean_turns(_dirty(rows), num_buckets=2, assert_dense=True).count()
        == 3
    )


def test_ordered_turns_global_order(ray_session):
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        ordered_turns,
    )

    rows = [("c2", 1, "d"), ("c1", 1, "b"), ("c2", 0, "c"), ("c1", 0, "a")]
    out = ordered_turns(_dirty(rows)).to_pandas()
    assert list(zip(out["conv_id"], out["turn_idx"])) == [
        ("c1", 0), ("c1", 1), ("c2", 0), ("c2", 1)
    ]


def test_dedup_rows_keep_first_deterministic(ray_session):
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.stages.dedup import dedup_rows

    def _ds(order):
        rows = [("m1", "x"), ("m1", "a"), ("m2", "z")]
        rows = [rows[i] for i in order]
        return ray.data.from_arrow(
            pa.table(
                {
                    "mention_id": [r[0] for r in rows],
                    "payload": [r[1] for r in rows],
                }
            )
        )

    a = (
        dedup_rows(_ds([0, 1, 2]), "mention_id", num_buckets=4)
        .to_pandas().sort_values("mention_id").reset_index(drop=True)
    )
    b = (
        dedup_rows(_ds([2, 1, 0]), "mention_id", num_buckets=4)
        .to_pandas().sort_values("mention_id").reset_index(drop=True)
    )
    assert a.equals(b)
    assert list(a["mention_id"]) == ["m1", "m2"]
    assert list(a["payload"]) == ["a", "z"]  # deterministic survivor


def test_read_transcripts_jsonl(ray_session, tmp_path):
    import json

    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts_jsonl,
    )

    p = tmp_path / "shard.jsonl"
    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": "hello", "tool": None, "ts": "2024-01-02T03:04:05"},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
         "text": "  ", "tool": None, "ts": "2024-01-02T03:04:06"},  # dropped
        {"conv_id": "c2", "turn_idx": 0, "role": "tool",
         "text": "ok", "tool": "search", "ts": "2024-01-02T03:04:07"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    ds = read_transcripts_jsonl(str(p))
    out = sorted(ds.take_all(), key=lambda r: (r["conv_id"], r["turn_idx"]))
    assert [r["conv_id"] for r in out] == ["c1", "c2"]  # blank text dropped
    assert out[0]["ts"].year == 2024 and out[1]["tool"] == "search"
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.schema import TRANSCRIPTS

    assert ds.schema().names == list(TRANSCRIPTS.names)


def test_read_transcripts_jsonl_fractional_seconds(ray_session, tmp_path):
    import json

    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts_jsonl,
    )

    p = tmp_path / "frac.jsonl"
    p.write_text(
        json.dumps(
            {"conv_id": "c", "turn_idx": 0, "role": "user", "text": "hi",
             "tool": None, "ts": "2024-01-02T03:04:05.123456"}
        )
    )
    (row,) = read_transcripts_jsonl(str(p)).take_all()
    assert row["ts"].microsecond == 123456


def test_read_transcripts_csv(ray_session, tmp_path):
    from joint_entity_and_relation_extraction_ray.schema import TRANSCRIPTS
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts_csv,
    )

    p = tmp_path / "shard.csv"
    p.write_text(
        "conv_id,turn_idx,role,text,tool,ts\n"
        'c1,0,user,hello,,2024-01-02T03:04:05\n'
        'c1,1,assistant,"  ",,2024-01-02T03:04:06\n'  # blank text dropped
        'c2,0,tool,ok,search,2024-01-02T03:04:07.123456\n'
    )
    ds = read_transcripts_csv(str(p))
    out = sorted(ds.take_all(), key=lambda r: (r["conv_id"], r["turn_idx"]))
    assert [r["conv_id"] for r in out] == ["c1", "c2"]
    assert out[0]["tool"] is None  # empty string -> true null
    assert out[1]["tool"] == "search"
    assert out[1]["ts"].microsecond == 123456
    assert ds.schema().names == list(TRANSCRIPTS.names)


def test_transcripts_jsonl_roundtrip(ray_session, tmp_path):
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts_jsonl,
        write_transcripts_jsonl,
    )

    src = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": ["c1", "c1", "c2"],
                "turn_idx": pa.array([0, 1, 0], pa.int32()),
                "role": ["user", "assistant", "tool"],
                "text": ["hello", "world", "ok"],
                "tool": pa.array([None, None, "search"], pa.string()),
                "ts": pa.array(
                    [1_700_000_000_000_000 + i for i in range(3)],
                    pa.timestamp("us"),
                ),
            }
        )
    )
    out = tmp_path / "shards"
    write_transcripts_jsonl(src, str(out))
    back = read_transcripts_jsonl(
        [str(p) for p in sorted(out.glob("*.json"))]
    )
    a = sorted(src.take_all(), key=lambda r: (r["conv_id"], r["turn_idx"]))
    b = sorted(back.take_all(), key=lambda r: (r["conv_id"], r["turn_idx"]))
    assert a == b


def test_transcripts_csv_roundtrip(ray_session, tmp_path):
    """CSV sink ∘ CSV source == identity on T0 (incl. the null `tool`
    column surviving the empty-string repair and µs timestamps)."""
    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts_csv,
        write_transcripts_csv,
    )

    src = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": ["c1", "c1", "c2"],
                "turn_idx": pa.array([0, 1, 0], pa.int32()),
                "role": ["user", "assistant", "tool"],
                "text": ["hello", "world", "ok"],
                "tool": pa.array([None, None, "search"], pa.string()),
                "ts": pa.array(
                    [1_700_000_000_000_000 + i for i in range(3)],
                    pa.timestamp("us"),
                ),
            }
        )
    )
    out = tmp_path / "shards"
    write_transcripts_csv(src, str(out))
    back = read_transcripts_csv([str(p) for p in sorted(out.glob("*.csv"))])
    a = sorted(src.take_all(), key=lambda r: (r["conv_id"], r["turn_idx"]))
    b = sorted(back.take_all(), key=lambda r: (r["conv_id"], r["turn_idx"]))
    assert a == b


def test_mention_contexts_window_clipping(ray_session):
    """Context windows clip at both text boundaries and keep exact
    [start-20, end+20) otherwise."""
    from joint_entity_and_relation_extraction_ray.stages.linker import (
        mention_contexts,
    )

    text = "0123456789" * 6  # 60 chars
    turns = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": ["c"],
                "turn_idx": pa.array([0], pa.int32()),
                "text": [text],
            }
        )
    )
    mentions = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": ["c", "c", "c"],
                "turn_idx": pa.array([0, 0, 0], pa.int32()),
                "mention_id": ["m0", "m1", "m2"],
                "start": pa.array([0, 30, 55], pa.int32()),
                "end": pa.array([5, 35, 60], pa.int32()),
            }
        )
    )
    got = {
        r["mention_id"]: r["ctx"]
        for r in mention_contexts(mentions, turns, ctx_chars=20).take_all()
    }
    assert got["m0"] == text[0:25]    # left-clipped
    assert got["m1"] == text[10:55]   # full window
    assert got["m2"] == text[35:60]   # right-clipped


def test_read_transcripts_jsonl_gzip(ray_session, tmp_path):
    """Gzipped JSONL shards (the web-corpus wire format) stream through
    the same coerce/validate stage as plain shards — identical output."""
    import gzip
    import json

    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts_jsonl,
    )

    rows = [
        {"conv_id": "g1", "turn_idx": 0, "role": "user",
         "text": "compressed hello", "tool": None,
         "ts": "2024-05-06T07:08:09"},
        {"conv_id": "g1", "turn_idx": 1, "role": "assistant",
         "text": "compressed reply", "tool": "search",
         "ts": "2024-05-06T07:08:10"},
    ]
    p = tmp_path / "shard.jsonl.gz"
    with gzip.open(p, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = sorted(
        read_transcripts_jsonl(str(p)).take_all(),
        key=lambda r: r["turn_idx"],
    )
    assert [r["text"] for r in out] == ["compressed hello", "compressed reply"]
    assert out[1]["tool"] == "search" and out[0]["ts"].year == 2024


def test_read_transcripts_schema_evolution(ray_session, tmp_path):
    """Legacy shards missing the nullable `tool` column read as nulls
    under evolve_schema=True; missing a REQUIRED column fails loudly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        read_transcripts,
    )

    full = pa.table(
        {
            "conv_id": ["a"],
            "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"],
            "text": ["hi"],
            "tool": ["t"],
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    pq.write_table(full, tmp_path / "new.parquet")
    pq.write_table(full.drop_columns(["tool"]), tmp_path / "old.parquet")

    out = read_transcripts(str(tmp_path), evolve_schema=True).take_all()
    assert len(out) == 2
    assert sorted(str(r["tool"]) for r in out) == ["None", "t"]

    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    pq.write_table(full.drop_columns(["text"]), bad_dir / "b.parquet")
    import pytest as _pytest

    with _pytest.raises(Exception, match="required columns"):
        read_transcripts(str(bad_dir), evolve_schema=True).take_all()


def test_split_valid_quarantines_bad_rows(ray_session):
    """Dead-letter routing: the valid side equals M1's output; the
    quarantine side keeps every rejected row with its reason."""
    import pyarrow as pa

    from joint_entity_and_relation_extraction_ray.sources.transcripts import (
        split_valid,
    )

    t = pa.table(
        {
            "conv_id": ["a", None, "c", "d", "e"],
            "turn_idx": pa.array([0, 1, None, 3, 4], pa.int32()),
            "role": ["user"] * 5,
            "text": ["ok", "also ok", "ok too", "", "   "],
            "tool": pa.array([None] * 5, pa.string()),
            "ts": pa.array([0] * 5, pa.timestamp("us")),
        }
    )
    valid, quar = split_valid(ray.data.from_arrow(t).repartition(2))
    v = valid.take_all()
    assert sorted(r["conv_id"] for r in v) == ["a"]
    q = sorted(
        (str(r["conv_id"]), r["_m1_reason"]) for r in quar.take_all()
    )
    assert q == [
        ("None", "null_key"),
        ("c", "null_key"),
        ("d", "empty_text"),
        ("e", "empty_text"),
    ]
