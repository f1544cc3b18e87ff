"""Deterministic synthetic transcript corpus with closed-form ground truth.

FIXTURES.md F1/F2: a seeded template grammar over a fixed entity gazetteer
generates multi-turn transcripts (exactly the T0 ``input_hint`` shape,
BASELINE.json:15) alongside golden mention and triple tables with exact char
offsets. This stands in for the reference's CoNLL04/ADE evaluation splits
(the reference checkout was empty at survey time, SURVEY.md §0): the frozen
goldens operationalize the "triple P/R >= 0.95 vs reference" contract
(SURVEY.md §5.2.2).

Everything is seeded; per-conversation RNG streams (``seed, conv_index``)
make generation order-independent and shardable. No wall-clock, no
process-salted ``hash()``.
"""

from __future__ import annotations

import json
import os
import unicodedata
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import (
    ALIASES,
    MENTIONS,
    TRANSCRIPTS,
    TRIPLES,
    mention_id,
)

SEED = 42
EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

# ---------------------------------------------------------------------------
# Gazetteer: invented, collision-free names (FIXTURES.md F1.1)
# ---------------------------------------------------------------------------

_SYL_A = ["bar", "den", "fal", "gor", "hal", "jin", "kel", "lor", "mar", "nev",
          "pol", "quil", "ras", "sel", "tor", "ulm", "vek", "wynn", "yar", "zeb"]
_SYL_B = ["an", "el", "ia", "on", "us", "or", "in", "ar", "eth", "ova"]


def _words(rng: np.random.Generator, n: int, used: set[str]) -> list[str]:
    """n unique invented capitalized words, disjoint from `used`."""
    out: list[str] = []
    while len(out) < n:
        w = (rng.choice(_SYL_A) + rng.choice(_SYL_B) + rng.choice(_SYL_A)).capitalize()
        if w not in used:
            used.add(w)
            out.append(w)
    return out


ORG_SUFFIXES = ["Corp", "Labs", "Group", "Systems", "Institute"]


@dataclass(frozen=True)
class Entity:
    entity_id: str
    canonical_name: str
    ent_type: str
    surfaces: tuple[str, ...]  # surface variants that may appear in text


def build_gazetteer(seed: int = SEED) -> list[Entity]:
    """200 persons / 100 orgs / 100 locations with alias variants.

    Persons share last names on purpose so the abbreviated variants
    ("B. Last", "Dr. Last") are ambiguous across entities — exercising
    candidate scoring in the linker (FIXTURES.md F2).
    """
    rng = np.random.default_rng([seed, 0])
    used: set[str] = set()
    firsts = _words(rng, 40, used)
    lasts = _words(rng, 60, used)  # 200 persons over 60 last names → sharing
    org_words = _words(rng, 100, used)
    loc_words = _words(rng, 100, used)

    ents: list[Entity] = []
    pairs = [(f, l) for f in firsts for l in lasts]
    idx = rng.permutation(len(pairs))[:200]
    for k, i in enumerate(sorted(idx.tolist())):
        f, l = pairs[i]
        full = f"{f} {l}"
        ents.append(
            Entity(f"P{k:04d}", full, "Peop", (full, f"{f[0]}. {l}", f"Dr. {l}"))
        )
    for k, w in enumerate(org_words):
        suffix = ORG_SUFFIXES[k % len(ORG_SUFFIXES)]
        full = f"{w} {suffix}"
        ents.append(Entity(f"O{k:04d}", full, "Org", (full, w)))
    for k, w in enumerate(loc_words):
        ents.append(Entity(f"L{k:04d}", w, "Loc", (w,)))
    return ents


def alias_table(gaz: list[Entity]) -> pa.Table:
    """FIXTURES.md F2: casefolded alias → entity_id, with a deterministic
    disambiguation prior (earlier / hotter entities get higher prior)."""
    rows: dict[str, list] = {"alias": [], "entity_id": [], "ent_type": [], "prior": []}
    counts: dict[str, int] = {}
    for i, e in enumerate(gaz):
        for s in e.surfaces:
            a = unicodedata.normalize("NFC", s).casefold()
            counts[a] = counts.get(a, 0) + 1
            rows["alias"].append(a)
            rows["entity_id"].append(e.entity_id)
            rows["ent_type"].append(e.ent_type)
            # Zipf-ish prior by in-type rank — matches the generator's draw
            # distribution so the linker's argmax is a sensible MAP choice.
            rank = int(e.entity_id[1:]) + 1
            rows["prior"].append(1.0 / rank**1.2)
    return pa.table(rows, schema=ALIASES)


# ---------------------------------------------------------------------------
# Template grammar (FIXTURES.md F1.1) — closed-form golden triples
# ---------------------------------------------------------------------------

# (template-with-{A}/{B}, type_A, type_B, relation-or-None)
REL_TEMPLATES: list[tuple[str, str, str, str | None]] = [
    ("{A} works for {B} .", "Peop", "Org", "Work_For"),
    ("{A} lives in {B} .", "Peop", "Loc", "Live_In"),
    ("{A} is based in {B} .", "Org", "Loc", "OrgBased_In"),
    ("{A} is located in {B} .", "Loc", "Loc", "Located_In"),
    ("{A} killed {B} .", "Peop", "Peop", "Kill"),
    # distractors: entities present, no relation
    ("{A} met {B} recently .", "Peop", "Peop", None),
    ("{A} praised {B} .", "Peop", "Org", None),
]
FILLERS = [
    "please summarize the previous discussion .",
    "the quarterly report is attached below .",
    "let me run that query now .",
    "understood , proceeding with the plan .",
    "can you check the latest deployment logs ?",
]
ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "code"]


def _zipf_p(n: int, s: float = 1.2) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


class _Grammar:
    """Precomputed draw tables; one instance reused across conversations."""

    def __init__(self, gaz: list[Entity]):
        self.by_type: dict[str, list[Entity]] = {}
        for e in gaz:
            self.by_type.setdefault(e.ent_type, []).append(e)
        # Zipf over in-type rank → hot entities (skew for CC salting path).
        self.zipf = {t: _zipf_p(len(v)) for t, v in self.by_type.items()}
        # surface-variant pick probabilities (first variant dominant)
        self.var_p = {1: [1.0], 2: [0.8, 0.2], 3: [0.7, 0.2, 0.1]}

    def draw_entity(self, rng: np.random.Generator, ent_type: str) -> Entity:
        pool = self.by_type[ent_type]
        return pool[rng.choice(len(pool), p=self.zipf[ent_type])]

    def draw_surface(self, rng: np.random.Generator, e: Entity) -> str:
        v = e.surfaces
        return v[rng.choice(len(v), p=self.var_p[len(v)])]


def _gen_conversation(grammar: _Grammar, seed: int, conv_index: int):
    """Generate one conversation; returns (turn_rows, mention_rows, triple_rows).

    Each turn is 1-3 clauses; ~30% of turns are entity-free filler
    (FIXTURES.md F1.1). Golden offsets are exact char offsets into `text`.
    """
    rng = np.random.default_rng([seed, 1, conv_index])
    conv_id = f"conv-{conv_index:08d}"
    n_turns = int(rng.integers(2, 21))
    turns, mentions, triples = [], [], []
    for turn_idx in range(n_turns):
        parts: list[str] = []
        offset = 0
        turn_mentions: list[tuple] = []  # (start, end, surface, ent_type)
        turn_triples: list[tuple] = []   # (s_start,s_end,s_surf,pred,o_start,o_end,o_surf)
        n_clauses = int(rng.integers(1, 4))
        for _ in range(n_clauses):
            if rng.random() < 0.30:
                clause = FILLERS[int(rng.integers(0, len(FILLERS)))]
                parts.append(clause)
                offset += len(clause) + 1
                continue
            ti = int(rng.integers(0, len(REL_TEMPLATES)))
            tmpl, ta, tb, rel = REL_TEMPLATES[ti]
            ea = grammar.draw_entity(rng, ta)
            eb = grammar.draw_entity(rng, tb)
            if ea.entity_id == eb.entity_id:  # Located_In/Kill self-loop guard
                continue
            sa = grammar.draw_surface(rng, ea)
            sb = grammar.draw_surface(rng, eb)
            head, mid, tail = tmpl.split("{A}")[0], *tmpl.split("{A}")[1].split("{B}")
            a_start = offset + len(head)
            a_end = a_start + len(sa)
            b_start = a_end + len(mid)
            b_end = b_start + len(sb)
            clause = head + sa + mid + sb + tail
            parts.append(clause)
            offset += len(clause) + 1  # +1 for the joining space
            turn_mentions.append((a_start, a_end, sa, ea.ent_type))
            turn_mentions.append((b_start, b_end, sb, eb.ent_type))
            if rel is not None:
                turn_triples.append((a_start, a_end, sa, rel, b_start, b_end, sb))
        text = " ".join(parts) if parts else FILLERS[0]
        role = ROLES[turn_idx % 3]
        tool = TOOLS[turn_idx % 2] if role == "tool" else None
        turns.append((conv_id, turn_idx, role, text, tool))
        for (s, e, surf, et) in turn_mentions:
            mentions.append((conv_id, turn_idx, mention_id(conv_id, turn_idx, s, e),
                             s, e, surf, et))
        for (ss, se, s_surf, pred, os_, oe, o_surf) in turn_triples:
            triples.append(
                (conv_id, turn_idx,
                 mention_id(conv_id, turn_idx, ss, se),
                 mention_id(conv_id, turn_idx, os_, oe),
                 s_surf, pred, o_surf)
            )
    return turns, mentions, triples


def generate_shard(
    n_convs: int, shard: int, num_shards: int, seed: int = SEED
) -> dict[str, pa.Table]:
    """Generate the conversations of one shard (conv_index % num_shards ==
    shard). Shardable → the generator itself can run as a Ray map over shard
    ids (SURVEY.md §2.2 S2) without driver-side materialization."""
    grammar = _Grammar(build_gazetteer(seed))
    t_rows, m_rows, tr_rows = [], [], []
    for ci in range(shard, n_convs, num_shards):
        t, m, tr = _gen_conversation(grammar, seed, ci)
        t_rows.extend(t)
        m_rows.extend(m)
        tr_rows.extend(tr)

    # timestamps: dense global turn counter * 60 s, offset by conv_index so
    # sharded generation stays deterministic: ts = EPOCH + (ci*32 + turn)*60s
    ts_turn = np.array(
        [EPOCH_US + (int(c.split("-")[1]) * 32 + t) * 60_000_000
         for (c, t, *_rest) in t_rows],
        dtype="int64",
    )
    transcripts = pa.table(
        {
            "conv_id": [r[0] for r in t_rows],
            "turn_idx": pa.array([r[1] for r in t_rows], pa.int32()),
            "role": [r[2] for r in t_rows],
            "text": [r[3] for r in t_rows],
            "tool": [r[4] for r in t_rows],
            "ts": pa.array(ts_turn, pa.timestamp("us")),
        },
        schema=TRANSCRIPTS,
    )
    ts_by_key = {(r[0], r[1]): ts_turn[i] for i, r in enumerate(t_rows)}
    mentions = pa.table(
        {
            "conv_id": [r[0] for r in m_rows],
            "turn_idx": pa.array([r[1] for r in m_rows], pa.int32()),
            "mention_id": [r[2] for r in m_rows],
            "start": pa.array([r[3] for r in m_rows], pa.int32()),
            "end": pa.array([r[4] for r in m_rows], pa.int32()),
            "surface": [r[5] for r in m_rows],
            "ent_type": [r[6] for r in m_rows],
            "score": pa.array([1.0] * len(m_rows), pa.float32()),
        },
        schema=MENTIONS,
    )
    triples = pa.table(
        {
            "conv_id": [r[0] for r in tr_rows],
            "turn_idx": pa.array([r[1] for r in tr_rows], pa.int32()),
            "subj_mention_id": [r[2] for r in tr_rows],
            "obj_mention_id": [r[3] for r in tr_rows],
            "subj_surface": [r[4] for r in tr_rows],
            "pred": [r[5] for r in tr_rows],
            "obj_surface": [r[6] for r in tr_rows],
            "score": pa.array([1.0] * len(tr_rows), pa.float32()),
            "ts": pa.array(
                np.array([ts_by_key[(r[0], r[1])] for r in tr_rows], dtype="int64"),
                pa.timestamp("us"),
            ),
        },
        schema=TRIPLES,
    )
    return {"transcripts": transcripts, "golden_mentions": mentions,
            "golden_triples": triples}


# ---------------------------------------------------------------------------
# Corpus writer — atomic, fingerprinted, shard-parallel layout
# ---------------------------------------------------------------------------

FIXTURE_ROOT = Path(os.environ.get("KGRAY_FIXTURE_ROOT", "/tmp/kgray_fixtures"))

# conversations per scale factor (mean ~11 turns/conv → FIXTURES.md sizes).
# sf1 (~6M turns) exists for the scaling-efficiency evidence: big enough
# that compute dominates fixed session/pool overheads at 32 CPUs.
SF_CONVS = {
    "sf0.001": 100,
    "sf0.01": 1000,
    "sf0.1": 55000,
    "sf1": 550000,
    "sf3": 1650000,
    "sf10": 5500000,
}
_PARALLEL_GEN_MIN_CONVS = 100_000  # above this, shard-generate via Ray tasks
_GEN_VERSION = 3  # bump to invalidate cached fixtures


def corpus_dir(sf_name: str, seed: int = SEED) -> Path:
    return FIXTURE_ROOT / f"{sf_name}-seed{seed}-v{_GEN_VERSION}"


def ensure_corpus(
    sf_name: str, seed: int = SEED, num_shards: int | None = None
) -> Path:
    """Generate (once, atomically) the corpus for a scale factor.

    Layout: ``<dir>/transcripts/part-SS.parquet`` (+ golden_mentions/,
    golden_triples/, aliases.parquet, entities.parquet, _manifest.json).
    Atomic tmp-dir + rename so concurrent callers / killed runs never see a
    half-written corpus (SURVEY.md §4.4).
    """
    n_convs = SF_CONVS.get(sf_name)
    if n_convs is None:
        raise ValueError(f"unknown scale factor {sf_name!r}; known: {list(SF_CONVS)}")
    if num_shards is None:
        num_shards = 128 if n_convs >= _PARALLEL_GEN_MIN_CONVS else 16
    final = corpus_dir(sf_name, seed)
    if (final / "_manifest.json").exists():
        return final
    final.parent.mkdir(parents=True, exist_ok=True)
    tmp = final.with_suffix(f".tmp-{os.getpid()}")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)
    for sub in ("transcripts", "golden_mentions", "golden_triples"):
        (tmp / sub).mkdir(parents=True)
    n_rows = {"transcripts": 0, "golden_mentions": 0, "golden_triples": 0}

    def _write_shard(shard: int) -> dict[str, int]:
        tables = generate_shard(n_convs, shard, num_shards, seed)
        counts = {}
        for name in ("transcripts", "golden_mentions", "golden_triples"):
            tbl = tables[name]
            pq.write_table(tbl, tmp / name / f"part-{shard:02d}.parquet")
            counts[name] = tbl.num_rows
        return counts

    use_ray = False
    if n_convs >= _PARALLEL_GEN_MIN_CONVS:
        try:  # parallel shard generation — only when the CALLER owns a
            # Ray session (library code never ray.init()s, SURVEY.md §3.3)
            import ray

            use_ray = ray.is_initialized()
        except ImportError:
            use_ray = False
    if use_ray:
        import ray

        task = ray.remote(_write_shard)
        shard_counts = ray.get([task.remote(s) for s in range(num_shards)])
    else:
        shard_counts = [_write_shard(s) for s in range(num_shards)]
    for counts in shard_counts:
        for name, n in counts.items():
            n_rows[name] += n
    gaz = build_gazetteer(seed)
    pq.write_table(alias_table(gaz), tmp / "aliases.parquet")
    pq.write_table(
        pa.table(
            {
                "entity_id": [e.entity_id for e in gaz],
                "canonical_name": [e.canonical_name for e in gaz],
                "ent_type": [e.ent_type for e in gaz],
            }
        ),
        tmp / "entities.parquet",
    )
    (tmp / "_manifest.json").write_text(
        json.dumps({"sf": sf_name, "seed": seed, "n_convs": n_convs,
                    "num_shards": num_shards, "rows": n_rows,
                    "gen_version": _GEN_VERSION})
    )
    try:
        tmp.rename(final)
    except OSError:
        # concurrent generator won the race; ours is identical — drop it
        import shutil

        if (final / "_manifest.json").exists():
            shutil.rmtree(tmp)
        else:
            raise
    return final


def corpus_for_sf_dir(sf_dir: str, seed: int = SEED) -> Path:
    """Map a driver testdata dir (…/sf0.01) to its synthetic corpus."""
    return ensure_corpus(Path(sf_dir).name, seed)


def ensure_doc_corpus(
    n_docs: int, seed: int = SEED, num_shards: int = 32
) -> Path:
    """Deterministic synthetic DOCUMENT corpus for the corpus-op scaling
    bench: ``(doc_id:int64, text:string)`` parquet shards, distinct
    40-word texts over a 30k-word vocabulary with a controlled ~10%
    near-duplicate rate (copy of the previous doc with one word
    mutated) — the web-corpus shape dedup ops see in production.

    Why not conversation-level docs from the transcript corpus: the
    transcript templates make conversations massively self-similar, so
    MinHash LSH buckets degenerate (every doc collides with thousands)
    and the bench measures the pathological-skew cap instead of the
    op's scaling. Same atomic tmp-dir + rename protocol as
    :func:`ensure_corpus`; Ray-parallel when the caller owns a session."""
    # num_shards is part of the cache key: the per-shard RNG streams
    # make the CONTENT a function of the sharding (review r5)
    final = (
        FIXTURE_ROOT
        / f"docs-{n_docs}x{num_shards}-seed{seed}-v{_GEN_VERSION}"
    )
    if (final / "_manifest.json").exists():
        return final
    # prune pre-r5 fixture dirs (old key format docs-<n>-seed…, no
    # shard count): orphaned by the key change, never matched again —
    # without this they sit in FIXTURE_ROOT forever (review r5)
    import re as _re
    import shutil as _shutil

    for old in FIXTURE_ROOT.glob("docs-*-seed*"):
        if _re.fullmatch(r"docs-\d+-seed\d+-v\d+", old.name):
            _shutil.rmtree(old, ignore_errors=True)
    final.parent.mkdir(parents=True, exist_ok=True)
    tmp = final.with_suffix(f".tmp-{os.getpid()}")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    per_shard = (n_docs + num_shards - 1) // num_shards

    def _write_shard(shard: int) -> int:
        import numpy as np

        rng = np.random.default_rng(seed * 1_000_003 + shard)
        lo = shard * per_shard
        hi = min(lo + per_shard, n_docs)
        if hi <= lo:
            return 0
        words = rng.integers(0, 30_000, size=(hi - lo, 40))
        texts = [" ".join(f"w{w}" for w in row) for row in words]
        # ~10% near-dups: doc i copies doc i-1 with one word changed
        for i in range(1, hi - lo):
            if rng.random() < 0.10:
                prev = texts[i - 1].split()
                prev[int(rng.integers(0, 40))] = f"w{rng.integers(0, 30000)}"
                texts[i] = " ".join(prev)
        tbl = pa.table(
            {
                "doc_id": pa.array(range(lo, hi), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        pq.write_table(tbl, tmp / f"part-{shard:03d}.parquet")
        return hi - lo

    use_ray = False
    if n_docs >= 50_000:
        try:
            import ray

            use_ray = ray.is_initialized()
        except ImportError:
            use_ray = False
    if use_ray:
        import ray

        task = ray.remote(_write_shard)
        rows = sum(ray.get([task.remote(s) for s in range(num_shards)]))
    else:
        rows = sum(_write_shard(s) for s in range(num_shards))
    (tmp / "_manifest.json").write_text(
        json.dumps({"n_docs": rows, "seed": seed,
                    "num_shards": num_shards, "gen_version": _GEN_VERSION})
    )
    try:
        tmp.rename(final)
    except OSError:
        import shutil

        if (final / "_manifest.json").exists():
            shutil.rmtree(tmp)
        else:
            raise
    return final
