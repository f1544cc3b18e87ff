"""Generator determinism + golden offset exactness (FIXTURES.md F1/F6)."""

import pyarrow.parquet as pq

from joint_entity_and_relation_extraction_ray.sources.synth import (
    build_gazetteer,
    generate_shard,
)


def test_gazetteer_deterministic_and_sized():
    g1 = build_gazetteer()
    g2 = build_gazetteer()
    assert g1 == g2
    by_type = {}
    for e in g1:
        by_type[e.ent_type] = by_type.get(e.ent_type, 0) + 1
    assert by_type == {"Peop": 200, "Org": 100, "Loc": 100}


def test_shard_generation_deterministic():
    a = generate_shard(20, 0, 4)
    b = generate_shard(20, 0, 4)
    assert a["transcripts"].equals(b["transcripts"])
    assert a["golden_triples"].equals(b["golden_triples"])


def test_golden_offsets_exact(sf0001_corpus):
    t = pq.read_table(sf0001_corpus / "transcripts").to_pandas()
    m = pq.read_table(sf0001_corpus / "golden_mentions").to_pandas()
    text = t.set_index(["conv_id", "turn_idx"])["text"]
    for r in m.sample(n=min(500, len(m)), random_state=0).itertuples():
        assert text.loc[(r.conv_id, r.turn_idx)][r.start : r.end] == r.surface


def test_tool_column_nullable_iff_tool_role(sf0001_corpus):
    t = pq.read_table(sf0001_corpus / "transcripts").to_pandas()
    assert (t["tool"].notna() == (t["role"] == "tool")).all()
