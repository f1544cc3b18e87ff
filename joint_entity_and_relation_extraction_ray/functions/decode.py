"""Decode semantics of the reference model, as pure functions.

Reproduces (SURVEY.md §2.1 R6–R8; reference checkout empty — semantics per
the published multi-head-selection papers, SURVEY.md §0.1 [MHS]/[MHS-AT]):

- R6  BIO decode: per-token tag sequence → entity spans, with standard
  repair of malformed ``I-`` continuations (an ``I-X`` not preceded by
  ``B-X``/``I-X`` opens a new span, i.e. is treated as ``B-X``).
- R7  multi-head threshold decode: per-token-pair relation scores are
  sigmoid-thresholded at 0.5; heads are anchored on entity LAST tokens and
  one token may select multiple heads.
- R8  triple assembly: a relation edge survives only when both endpoints
  are last tokens of decoded entity spans; output is
  (subject_span, predicate, object_span).

These are deterministic and exhaustively unit-tested (SURVEY.md §5.2.1);
the encoder that produces tags/scores is pluggable (surrogate in-sandbox,
a real BERT replica on a GPU cluster — SURVEY.md §7.6).
"""

from __future__ import annotations

from ..schema import REL_THRESHOLD

Span = tuple[int, int, str]  # [start_tok, end_tok) and entity type


def bio_decode(tags: list[str]) -> list[Span]:
    """Tag sequence → spans ``(start_tok, end_tok, ent_type)`` (token
    indices, end-exclusive), with malformed-``I-`` repair."""
    spans: list[Span] = []
    cur_start, cur_type = -1, ""
    for i, tag in enumerate(tags):
        if tag == "O":
            if cur_start >= 0:
                spans.append((cur_start, i, cur_type))
                cur_start = -1
            continue
        prefix, _, etype = tag.partition("-")
        if prefix == "B" or cur_start < 0 or etype != cur_type:
            # B- always opens; a dangling/mistyped I- is repaired to B-
            if cur_start >= 0:
                spans.append((cur_start, i, cur_type))
            cur_start, cur_type = i, etype
    if cur_start >= 0:
        spans.append((cur_start, len(tags), cur_type))
    return spans


def threshold_heads(
    pair_scores: dict[tuple[int, int, str], float],
    threshold: float = REL_THRESHOLD,
) -> list[tuple[int, int, str]]:
    """Multi-head selection decode: keep every (head_i, tail_j, rel) whose
    sigmoid score exceeds `threshold`. One token may select multiple heads
    ([MHS] §3.2). Deterministic order: sorted by (i, j, rel)."""
    return sorted(k for k, v in pair_scores.items() if v > threshold)


def assemble_triples(
    spans: list[Span],
    heads: list[tuple[int, int, str]],
) -> list[tuple[Span, str, Span]]:
    """R8: keep edges whose BOTH anchors are last tokens of decoded spans;
    emit (subject_span, predicate, object_span). Edges with endpoints that
    are not decoded entity last-tokens are dropped ([MHS] §3.3 eval)."""
    by_last = {end - 1: (start, end, etype) for (start, end, etype) in spans}
    out: list[tuple[Span, str, Span]] = []
    for i, j, rel in heads:
        s = by_last.get(i)
        o = by_last.get(j)
        if s is not None and o is not None:
            out.append((s, rel, o))
    return out
