"""TripleScorer — the batched-inference stage (SURVEY.md §2.2 A1).

The reference runs a BERT/BiLSTM encoder with a multi-head
tagging/selection head per sentence (SURVEY.md §2.1 R5–R8). torch is not
installed in this sandbox (SURVEY.md §0.2), so the encoder is a
deterministic surrogate (gazetteer longest-match tagger + connective
-pattern relation scorer) behind the same interface; the DECODE path (BIO
decode, sigmoid-threshold multi-head selection anchored on entity last
tokens, triple assembly) is the reference's exact semantics and lives in
``functions.decode``. A real warm-model replica drops in by replacing
``SurrogateEncoder`` without touching pipeline code (SURVEY.md §7.6).

Ray mapping: a callable CLASS → actor pool via
``ds.map_batches(TripleScorer, concurrency=N, batch_size=B,
batch_format="pyarrow", zero_copy_batch=True, fn_constructor_kwargs=...)``.
Model state (the alias gazetteer here; BERT weights in production) is
broadcast once with ``ray.put`` and fetched in ``__init__`` — once per
actor, never per batch (BASELINE.json:6 "GPU actor pool holding warm model
replicas"; ``num_gpus`` is a config knob on the stage, unused on CPU).

The scorer runs ONCE per turn, emitting a combined Arrow table with a
``kind`` column ("mention" | "triple"); cheap filters split it into T1/T2
(SURVEY.md §3.2) so the expensive model never runs twice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.decode import assemble_triples, bio_decode, threshold_heads
from ..functions.text import normalize_surface, split_units, tokenize_with_offsets
from ..schema import MENTIONS, TRIPLES, mention_id

# M4 length cap: one mega-turn must not blow up a whole scorer batch
# (SURVEY §4.3); far above normal turn lengths so clean corpora never split
MAX_UNIT_CHARS = 8192

# Combined scorer output (split into T1 MENTIONS / T2 TRIPLES by `kind`).
COMBINED = pa.schema(
    [
        ("kind", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("mention_id", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("surface", pa.string()),
        ("ent_type", pa.string()),
        ("subj_mention_id", pa.string()),
        ("obj_mention_id", pa.string()),
        ("subj_surface", pa.string()),
        ("pred", pa.string()),
        ("obj_surface", pa.string()),
        ("score", pa.float32()),
        ("ts", pa.timestamp("us")),
    ]
)

# Connective patterns the surrogate relation head recognizes, with the type
# signature the multi-head selection layer would have learned ([MHS] §3.2).
REL_PATTERNS: dict[str, tuple[str, tuple[str, str]]] = {
    " works for ": ("Work_For", ("Peop", "Org")),
    " lives in ": ("Live_In", ("Peop", "Loc")),
    " is based in ": ("OrgBased_In", ("Org", "Loc")),
    " is located in ": ("Located_In", ("Loc", "Loc")),
    " killed ": ("Kill", ("Peop", "Peop")),
}
_POS_SCORE, _NEG_SCORE = 0.9, 0.1


class SurrogateEncoder:
    """Deterministic stand-in for the BERT/BiLSTM + heads forward pass.

    Produces exactly what the real model's forward produces: per-token BIO
    tag sequence and per-token-pair relation scores anchored on span last
    tokens. Tagging = greedy longest match against the (casefolded)
    gazetteer; relation score = connective-pattern + type-signature match.
    """

    def __init__(self, gazetteer: list[tuple[str, str]]):
        """gazetteer: [(casefolded surface, ent_type)] — from the alias
        dictionary (FIXTURES.md F2)."""
        self._by_first: dict[str, list[tuple[tuple[str, ...], str]]] = {}
        self.max_len = 1
        for surface, etype in gazetteer:
            toks = tuple(surface.split())
            self.max_len = max(self.max_len, len(toks))
            # first token → candidates, longest first (greedy longest match)
            self._by_first.setdefault(toks[0], []).append((toks, etype))
        for cands in self._by_first.values():
            cands.sort(key=lambda c: -len(c[0]))

    def forward(self, text: str):
        """→ (tokens_with_offsets, bio_tags, pair_scores)."""
        toks = tokenize_with_offsets(text)
        norm = [normalize_surface(t) for t, _, _ in toks]
        tags = ["O"] * len(toks)
        i = 0
        while i < len(toks):
            matched = 0
            for cand, etype in self._by_first.get(norm[i], ()):  # longest first
                n = len(cand)
                if tuple(norm[i : i + n]) == cand:
                    tags[i] = f"B-{etype}"
                    for k in range(i + 1, i + n):
                        tags[k] = f"I-{etype}"
                    matched = n
                    break
            i += matched if matched else 1

        spans = bio_decode(tags)
        pair_scores: dict[tuple[int, int, str], float] = {}
        for a in range(len(spans)):
            for b in range(len(spans)):
                if a == b:
                    continue
                s_a, s_b = spans[a], spans[b]
                if s_a[1] > s_b[0]:  # subject must precede object in text
                    continue
                gap = text[toks[s_a[1] - 1][2] : toks[s_b[0]][1]]
                hit = REL_PATTERNS.get(gap)
                anchor = (s_a[1] - 1, s_b[1] - 1)
                if hit is not None:
                    rel, (ta, tb) = hit
                    ok = s_a[2] == ta and s_b[2] == tb
                    pair_scores[(*anchor, rel)] = _POS_SCORE if ok else _NEG_SCORE
        return toks, tags, pair_scores


class TripleScorer:
    """Actor-pool batch scorer: T0 pyarrow batch → COMBINED pyarrow batch.

    State (the gazetteer / model weights) loads ONCE per actor in
    ``__init__``; ``__call__`` only does per-batch work. Pass the gazetteer
    either as an ``ray.ObjectRef`` (broadcast: ``ray.put`` once on the
    driver) or as a plain list (tests without Ray).
    """

    def __init__(self, gazetteer_ref, max_unit_chars: int = MAX_UNIT_CHARS):
        try:
            import ray

            if isinstance(gazetteer_ref, ray.ObjectRef):
                gazetteer_ref = ray.get(gazetteer_ref)
        except ImportError:  # pure unit tests
            pass
        self.encoder = SurrogateEncoder(gazetteer_ref)
        self.max_unit_chars = max_unit_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch["conv_id"].to_pylist()
        turn_idxs = batch["turn_idx"].to_pylist()
        texts = batch["text"].to_pylist()
        ts = batch["ts"].cast(pa.int64()).to_pylist()

        cols: dict[str, list] = {name: [] for name in COMBINED.names}

        def emit(kind, conv, turn, t_us, **kw):
            cols["kind"].append(kind)
            cols["conv_id"].append(conv)
            cols["turn_idx"].append(turn)
            cols["ts"].append(t_us)
            for name in (
                "mention_id", "start", "end", "surface", "ent_type",
                "subj_mention_id", "obj_mention_id", "subj_surface", "pred",
                "obj_surface", "score",
            ):
                cols[name].append(kw.get(name))

        for conv, turn, text, t_us in zip(conv_ids, turn_idxs, texts, ts):
            # M4: bounded model units; offsets stay relative to the
            # ORIGINAL text via the unit's base offset (split_units splits
            # only at whitespace, so token offsets shift exactly)
            for base, sub in split_units(text, self.max_unit_chars):
                toks, tags, pair_scores = self.encoder.forward(sub)
                spans = bio_decode(tags)
                heads = threshold_heads(pair_scores)
                triples = assemble_triples(spans, heads)

                span_char = {}
                for (s, e, etype) in spans:
                    c0, c1 = toks[s][1] + base, toks[e - 1][2] + base
                    span_char[(s, e)] = (c0, c1)
                    emit(
                        "mention", conv, turn, t_us,
                        mention_id=mention_id(conv, turn, c0, c1),
                        start=c0, end=c1, surface=text[c0:c1], ent_type=etype,
                        score=_POS_SCORE,
                    )
                for (subj, rel, obj) in triples:
                    sc = span_char[(subj[0], subj[1])]
                    oc = span_char[(obj[0], obj[1])]
                    emit(
                        "triple", conv, turn, t_us,
                        subj_mention_id=mention_id(conv, turn, *sc),
                        obj_mention_id=mention_id(conv, turn, *oc),
                        subj_surface=text[sc[0]:sc[1]], pred=rel,
                        obj_surface=text[oc[0]:oc[1]],
                        score=np.float32(
                            pair_scores[(subj[1] - 1, obj[1] - 1, rel)]
                        ),
                    )

        arrays = []
        for field in COMBINED:
            if field.name == "ts":
                arrays.append(pa.array(cols["ts"], pa.int64()).cast(field.type))
            else:
                arrays.append(pa.array(cols[field.name], field.type))
        return pa.Table.from_arrays(arrays, schema=COMBINED)


def split_mentions(combined: pa.Table) -> pa.Table:
    t = combined.filter(pc.equal(combined["kind"], "mention"))
    return t.select(MENTIONS.names).cast(MENTIONS)


def split_triples(combined: pa.Table) -> pa.Table:
    t = combined.filter(pc.equal(combined["kind"], "triple"))
    return t.select(TRIPLES.names).cast(TRIPLES)


def gazetteer_from_alias_table(aliases: pa.Table) -> list[tuple[str, str]]:
    """Alias dictionary (ALIASES schema) → the (surface, type) list the
    encoder matches against. Deduplicated, deterministic order."""
    seen: dict[str, str] = {}
    for alias, etype in zip(
        aliases["alias"].to_pylist(), aliases["ent_type"].to_pylist()
    ):
        seen.setdefault(alias, etype)
    return sorted(seen.items())
