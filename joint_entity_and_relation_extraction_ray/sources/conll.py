"""CoNLL corpus reader — the reference's native input format (SURVEY.md
§2.1 R1; reference checkout empty, format per the published multi-head
selection release, SURVEY.md §0.1 [MHS]/[MHS-AT]).

Parses the CoNLL04/ADE-style token-per-line layout into the engine's
tables: the T0 transcript shape (one row per sentence) plus golden
mention/triple tables decoded from the annotations, so a corpus that ran
through the reference drops straight into this pipeline (extraction →
eval against the parsed goldens via ``functions/eval.prf_counts``).

Format accepted (tab- or space-separated)::

    #doc 5
    0   Michael     B-Peop  ['Live_In']  [4]
    1   lives       O       ['N']        [1]
    2   in          O       ['N']        [2]
    3   California  B-Loc   ['N']        [3]

- ``#doc N`` headers and/or blank lines delimit sentences; files without
  ``#doc`` headers are one document per file.
- Token line: index, token, BIO tag, relation-label list, head-index
  list (parallel). ``'N'`` with a self-head means "no relation".
- Relation anchoring follows [MHS] last-token convention: an entry
  ``(rel, j)`` on line ``i`` is an edge from the entity whose last token
  is ``i`` (subject) to the entity whose last token is ``j`` (object);
  edges whose endpoints are not decoded entity last-tokens are dropped —
  identical to the model-side R8 assembly (``functions/decode.py``).

Scale shape: one read task per corpus file (``read_binary_files``), the
parse is a stateless flat-map batch transform — sharded corpora
parallelize by file, and nothing is materialized on the driver.
"""

from __future__ import annotations

import ast
import datetime as dt

import pyarrow as pa
import ray.data

from ..functions.decode import assemble_triples, bio_decode
from ..schema import MENTIONS, TRANSCRIPTS, TRIPLES, mention_id

_EPOCH = dt.datetime(2020, 1, 1)


def _sentence_rows(conv_id: str, sent_idx: int, lines: list[list[str]]):
    """One parsed sentence → (turn_row, mention_rows, triple_rows)."""
    tokens = [f[1] for f in lines]
    tags = [f[2] for f in lines]
    text = " ".join(tokens)

    # char offset of each token in the joined text
    starts, pos = [], 0
    for tok in tokens:
        starts.append(pos)
        pos += len(tok) + 1
    tok_span = [(s, s + len(t)) for s, t in zip(starts, tokens)]

    # deterministic synthetic timestamp (T0 requires one; CoNLL has none)
    ts = _EPOCH + dt.timedelta(seconds=sent_idx)
    turn = {
        "conv_id": conv_id,
        "turn_idx": sent_idx,
        "role": "doc",
        "text": text,
        "tool": None,
        "ts": ts,
    }

    spans = bio_decode(tags)
    mentions = []
    char_of = {}
    for st, en, etype in spans:
        cs, ce = tok_span[st][0], tok_span[en - 1][1]
        char_of[(st, en)] = (cs, ce)
        mentions.append(
            {
                "conv_id": conv_id,
                "turn_idx": sent_idx,
                "mention_id": mention_id(conv_id, sent_idx, cs, ce),
                "start": cs,
                "end": ce,
                "surface": text[cs:ce],
                "ent_type": etype,
                "score": 1.0,
            }
        )

    heads = []
    for f in lines:
        i = int(f[0])
        rels = ast.literal_eval(f[3])
        hs = ast.literal_eval(f[4])
        for rel, j in zip(rels, hs):
            if rel != "N":
                heads.append((i, int(j), rel))
    triples = []
    for subj, rel, obj in assemble_triples(spans, sorted(heads)):
        scs, sce = char_of[(subj[0], subj[1])]
        ocs, oce = char_of[(obj[0], obj[1])]
        triples.append(
            {
                "conv_id": conv_id,
                "turn_idx": sent_idx,
                "subj_mention_id": mention_id(conv_id, sent_idx, scs, sce),
                "obj_mention_id": mention_id(conv_id, sent_idx, ocs, oce),
                "subj_surface": text[scs:sce],
                "pred": rel,
                "obj_surface": text[ocs:oce],
                "score": 1.0,
                "ts": ts,
            }
        )
    return turn, mentions, triples


def parse_conll(name: str, content: str):
    """Pure parser: one file → (turn_rows, mention_rows, triple_rows).

    ``conv_id`` is ``{name}`` for headerless files, ``{name}:{doc}`` when
    ``#doc`` headers are present; ``turn_idx`` counts sentences within a
    conv. Unit-tested without Ray.
    """
    turns, mentions, triples = [], [], []
    doc_id: str | None = None
    # per-conv sentence counters: a #doc id that reappears later in the
    # file CONTINUES its numbering, so (conv_id, turn_idx) stays unique
    sent_of: dict[str | None, int] = {}
    cur: list[list[str]] = []

    def _flush():
        nonlocal cur
        if cur:
            conv = name if doc_id is None else f"{name}:{doc_id}"
            sent_idx = sent_of.get(doc_id, 0)
            t, m, r = _sentence_rows(conv, sent_idx, cur)
            turns.append(t)
            mentions.extend(m)
            triples.extend(r)
            sent_of[doc_id] = sent_idx + 1
            cur = []

    for raw in content.splitlines():
        line = raw.rstrip()
        if line.startswith("#doc"):
            _flush()
            parts = line.split(None, 1)  # any whitespace: '#doc 5', '#doc\t5'
            doc_id = parts[1].strip() if len(parts) > 1 else line
            continue
        if not line.strip():
            _flush()
            continue
        fields = line.split("\t") if "\t" in line else line.split()
        if len(fields) < 5:
            raise ValueError(f"{name}: malformed CoNLL line {line!r}")
        # rel/head lists may contain spaces when space-separated — rejoin
        if "\t" not in line and len(fields) > 5:
            joined = " ".join(fields[3:])
            split_at = joined.index("]") + 1
            fields = fields[:3] + [joined[:split_at], joined[split_at:].strip()]
        cur.append(fields[:5])
    _flush()
    return turns, mentions, triples


def _reader(paths, build: str):
    paths = [paths] if isinstance(paths, str) else list(paths)
    files = ray.data.read_binary_files(paths, include_paths=True)
    schema = {"transcripts": TRANSCRIPTS, "mentions": MENTIONS, "triples": TRIPLES}[
        build
    ]
    idx = {"transcripts": 0, "mentions": 1, "triples": 2}[build]

    def _parse(batch: pa.Table) -> pa.Table:
        rows = []
        for path, data in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            name = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
            rows.extend(parse_conll(name, data.decode("utf-8"))[idx])
        if not rows:
            return schema.empty_table()
        return pa.Table.from_pylist(rows, schema=schema)

    return files.map_batches(_parse, batch_format="pyarrow")


def read_conll(paths) -> ray.data.Dataset:
    """CoNLL file(s) → T0 transcript rows (one per sentence)."""
    return _reader(paths, "transcripts")


def read_conll_golden_mentions(paths) -> ray.data.Dataset:
    """CoNLL file(s) → golden mention rows (BIO decode, char offsets)."""
    return _reader(paths, "mentions")


def read_conll_golden_triples(paths) -> ray.data.Dataset:
    """CoNLL file(s) → golden triple rows (last-token-anchored R8
    assembly of the annotated relation heads)."""
    return _reader(paths, "triples")
