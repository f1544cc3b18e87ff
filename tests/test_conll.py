"""CoNLL corpus reader (reference R1 parity): parse, offsets, goldens."""

import pyarrow as pa

from joint_entity_and_relation_extraction_ray.sources.conll import (
    parse_conll,
    read_conll,
    read_conll_golden_mentions,
    read_conll_golden_triples,
)

SAMPLE = """#doc 0
0\tJohn\tB-Peop\t['N']\t[0]
1\tSmith\tI-Peop\t['Live_In']\t[3]
2\tin\tO\t['N']\t[2]
3\tBoston\tB-Loc\t['N']\t[3]

#doc 0
0\tAcme\tB-Org\t['N']\t[0]
1\tCorp\tI-Org\t['OrgBased_In']\t[2]
2\tBoston\tB-Loc\t['N']\t[2]
#doc 7
0\tMary\tB-Peop\t['Work_For', 'Live_In']\t[2, 4]
1\tjoined\tO\t['N']\t[1]
2\tAcme\tB-Org\t['N']\t[2]
3\tin\tO\t['N']\t[3]
4\tParis\tB-Loc\t['N']\t[4]
"""


def test_parse_offsets_and_spans():
    turns, mentions, triples = parse_conll("f", SAMPLE)
    assert [t["turn_idx"] for t in turns] == [0, 1, 0]
    assert [t["conv_id"] for t in turns] == ["f:0", "f:0", "f:7"]
    t0 = turns[0]
    assert t0["text"] == "John Smith in Boston"
    m0 = [m for m in mentions if m["conv_id"] == "f:0" and m["turn_idx"] == 0]
    assert {(m["surface"], m["ent_type"]) for m in m0} == {
        ("John Smith", "Peop"),
        ("Boston", "Loc"),
    }
    # char offsets reconstruct the surface from the text
    for m in mentions:
        turn = next(
            t
            for t in turns
            if t["conv_id"] == m["conv_id"] and t["turn_idx"] == m["turn_idx"]
        )
        assert turn["text"][m["start"] : m["end"]] == m["surface"]


def test_parse_relations_last_token_anchoring():
    _, _, triples = parse_conll("f", SAMPLE)
    got = {(r["conv_id"], r["subj_surface"], r["pred"], r["obj_surface"]) for r in triples}
    assert got == {
        # relation sits on 'Smith' (last token of "John Smith") → head 3
        ("f:0", "John Smith", "Live_In", "Boston"),
        ("f:0", "Acme Corp", "OrgBased_In", "Boston"),
        # one token selects multiple heads ([MHS] multi-head)
        ("f:7", "Mary", "Work_For", "Acme"),
        ("f:7", "Mary", "Live_In", "Paris"),
    }


def test_parse_space_separated_and_headerless():
    text = (
        "0 Bonn B-Loc ['N'] [0]\n"
        "1 is O ['N'] [1]\n"
        "2 nice O ['N'] [2]\n"
    )
    turns, mentions, triples = parse_conll("g", text)
    assert len(turns) == 1 and turns[0]["conv_id"] == "g"
    assert mentions[0]["surface"] == "Bonn"
    assert triples == []


def test_read_conll_datasets(ray_session, tmp_path):
    p = tmp_path / "sample.conll"
    p.write_text(SAMPLE)
    ds = read_conll(str(p))
    t = ds.take_all()
    assert len(t) == 3
    assert ds.schema().names == [
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    ]
    assert read_conll_golden_mentions(str(p)).count() == 7
    trip = read_conll_golden_triples(str(p)).take_all()
    assert len(trip) == 4
    # mention ids of triple endpoints exist in the mention table
    mids = {m["mention_id"] for m in read_conll_golden_mentions(str(p)).take_all()}
    for r in trip:
        assert r["subj_mention_id"] in mids and r["obj_mention_id"] in mids


def test_conll_feeds_extraction_pipeline(ray_session, tmp_path, sf0001_corpus):
    # the parsed T0 shape drops straight into the scorer stage
    import pyarrow.parquet as pq

    from joint_entity_and_relation_extraction_ray.pipelines import kg

    p = tmp_path / "sample.conll"
    p.write_text(SAMPLE)
    ds = read_conll(str(p))
    aliases = pq.read_table(str(sf0001_corpus / "aliases.parquet"))
    tagged = kg.extract_combined(ds, aliases)
    # schema contract holds; the surrogate scorer is seeded for the synth
    # grammar so emitted spans here are arbitrary — but well-formed
    for m in kg.mentions_of(tagged).take_all():
        assert 0 <= m["start"] < m["end"]


def test_parse_reappearing_doc_id_and_tab_header():
    text = (
        "#doc\tA\n"
        "0\tBonn\tB-Loc\t['N']\t[0]\n"
        "\n"
        "#doc B\n"
        "0\tRome\tB-Loc\t['N']\t[0]\n"
        "\n"
        "#doc A\n"
        "0\tOslo\tB-Loc\t['N']\t[0]\n"
    )
    turns, mentions, _ = parse_conll("f", text)
    keys = [(t["conv_id"], t["turn_idx"]) for t in turns]
    # reappearing doc A continues numbering — keys stay unique
    assert keys == [("f:A", 0), ("f:B", 0), ("f:A", 1)]
    assert len(set(keys)) == 3
    assert {m["surface"] for m in mentions} == {"Bonn", "Rome", "Oslo"}
