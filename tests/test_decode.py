"""Unit tests for the reference decode semantics (SURVEY.md §5.2.1).

Table-driven, no Ray: BIO decode incl. malformed continuations, multi-head
threshold decode, triple assembly anchored on entity last tokens.
"""

from joint_entity_and_relation_extraction_ray.functions.decode import (
    assemble_triples,
    bio_decode,
    threshold_heads,
)


def test_bio_basic():
    assert bio_decode(["O", "B-Peop", "I-Peop", "O"]) == [(1, 3, "Peop")]


def test_bio_adjacent_entities():
    assert bio_decode(["B-Peop", "B-Org"]) == [(0, 1, "Peop"), (1, 2, "Org")]


def test_bio_runs_to_end():
    assert bio_decode(["B-Loc", "I-Loc"]) == [(0, 2, "Loc")]


def test_bio_malformed_dangling_I_repaired_to_B():
    # I- with no preceding B- opens a new span (standard BIO repair)
    assert bio_decode(["O", "I-Org", "I-Org"]) == [(1, 3, "Org")]


def test_bio_malformed_type_switch_splits():
    assert bio_decode(["B-Peop", "I-Org"]) == [(0, 1, "Peop"), (1, 2, "Org")]


def test_bio_empty_and_all_O():
    assert bio_decode([]) == []
    assert bio_decode(["O", "O"]) == []


def test_threshold_heads_multi_head():
    # one token may select multiple heads ([MHS] §3.2)
    scores = {
        (2, 5, "Work_For"): 0.9,
        (2, 7, "Live_In"): 0.8,
        (2, 5, "Kill"): 0.4,
        (1, 5, "Work_For"): 0.5,  # strictly-greater threshold
    }
    assert threshold_heads(scores) == [(2, 5, "Work_For"), (2, 7, "Live_In")]


def test_assemble_drops_non_entity_anchors():
    spans = [(0, 2, "Peop"), (4, 5, "Org")]
    heads = [(1, 4, "Work_For"), (3, 4, "Work_For"), (1, 6, "Kill")]
    # only (1,4) has both anchors on span last tokens (1 ends Peop, 4 ends Org)
    assert assemble_triples(spans, heads) == [
        ((0, 2, "Peop"), "Work_For", (4, 5, "Org"))
    ]


def test_assemble_multiple_relations_same_subject():
    spans = [(0, 1, "Peop"), (2, 3, "Org"), (4, 5, "Loc")]
    heads = [(0, 2, "Work_For"), (0, 4, "Live_In")]
    out = assemble_triples(spans, heads)
    assert [(r, o[2]) for (_, r, o) in out] == [("Work_For", "Org"), ("Live_In", "Loc")]
