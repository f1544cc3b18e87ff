"""Table schemas, label inventories and deterministic id minting.

All stage boundaries are Parquet tables with these exact ``pyarrow.Schema``s
(SURVEY.md §1.2). The input schema T0 is dictated by BASELINE.json:15
(``input_hint``). Label inventories follow the CoNLL04 set used by the
reference family (Bekoulis et al. 2018, ESWA — SURVEY.md §0.1 [MHS]; the
reference checkout itself was empty, SURVEY.md §0).

Ids are minted deterministically from stable string composition — never from
Python's process-salted ``hash()`` — so two runs (or two nodes) mint
identical ids (SURVEY.md §2.2 "Scalar functions").
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Label inventories (reference family: CoNLL04 — SURVEY.md §1.1)
# ---------------------------------------------------------------------------

ENT_TYPES: tuple[str, ...] = ("Peop", "Org", "Loc", "Other")
REL_TYPES: tuple[str, ...] = ("Work_For", "Kill", "OrgBased_In", "Live_In", "Located_In")

# BIO tag scheme over ENT_TYPES; index 0 is the outside tag.
BIO_TAGS: tuple[str, ...] = ("O",) + tuple(
    f"{p}-{t}" for t in ENT_TYPES for p in ("B", "I")
)
TAG2IDX: dict[str, int] = {t: i for i, t in enumerate(BIO_TAGS)}
REL2IDX: dict[str, int] = {r: i for i, r in enumerate(REL_TYPES)}

# Multi-head relation decode threshold ([MHS] §3.2: sigmoid > 0.5).
REL_THRESHOLD: float = 0.5

# ---------------------------------------------------------------------------
# Stage-boundary schemas (SURVEY.md §1.2, T0..T6; per-stage metrics
# live in the checkpointer's metrics.jsonl, state/checkpoint.py)
# ---------------------------------------------------------------------------

# T0 — input transcripts, exactly the input_hint shape (BASELINE.json:15).
TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),  # nullable
        ("ts", pa.timestamp("us")),
    ]
)

# T1 — one row per entity mention, flattened per turn.
MENTIONS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("mention_id", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),  # char offsets into `text`, [start, end)
        ("surface", pa.string()),
        ("ent_type", pa.string()),
        ("score", pa.float32()),
    ]
)

# T2 — one row per candidate triple, flattened per turn. Carries `ts`
# forward from T0 so edge materialize (first_ts/last_ts) needs no join
# back to the input (deviation from SURVEY §1.2 noted there in G1).
TRIPLES = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("subj_mention_id", pa.string()),
        ("obj_mention_id", pa.string()),
        ("subj_surface", pa.string()),
        ("pred", pa.string()),
        ("obj_surface", pa.string()),
        ("score", pa.float32()),
        ("ts", pa.timestamp("us")),
    ]
)

# T3 — mentions after alias-dictionary entity linking.
LINKED = MENTIONS.append(pa.field("cand_entity_id", pa.string())).append(
    pa.field("link_score", pa.float32())
)

# T4 — canonicalization output: member -> canonical representative.
CANON = pa.schema([("member_id", pa.string()), ("canonical_id", pa.string())])

# T5/T6 — graph materialize output, partitioned by entity-id hash
# (BASELINE.json:6 "node/edge Parquet tables partitioned by entity-id hash").
NODES = pa.schema(
    [
        ("entity_id", pa.string()),
        ("canonical_name", pa.string()),
        ("ent_type", pa.string()),
        ("mention_count", pa.int64()),
        ("aliases", pa.list_(pa.string())),
        ("part", pa.int32()),
    ]
)
EDGES = pa.schema(
    [
        ("subj_id", pa.string()),
        ("pred", pa.string()),
        ("obj_id", pa.string()),
        ("weight", pa.int64()),
        ("first_ts", pa.timestamp("us")),
        ("last_ts", pa.timestamp("us")),
        ("part", pa.int32()),
    ]
)

# Alias dictionary (broadcast fixture, FIXTURES.md F2).
ALIASES = pa.schema(
    [
        ("alias", pa.string()),  # NFC, casefolded surface
        ("entity_id", pa.string()),
        ("ent_type", pa.string()),
        ("prior", pa.float32()),  # disambiguation prior, deterministic
    ]
)


# ---------------------------------------------------------------------------
# Deterministic id minting
# ---------------------------------------------------------------------------

def mention_id(conv_id: str, turn_idx: int, start: int, end: int) -> str:
    """Deterministic mention id: stable composition, no hashing needed.

    Readable + collision-free by construction (offsets are unique within a
    turn). Identical across runs, processes and nodes.
    """
    return f"{conv_id}:{turn_idx}:{start}:{end}"


def stable_bucket(values, num_buckets: int):
    """Vectorized stable hash-bucket of a string array → int32 in [0, P).

    Uses ``pandas.util.hash_array`` (SipHash with pandas' fixed default key
    "0123456789123456") — deterministic across processes/nodes, unlike
    Python's per-process-salted ``hash()`` (SURVEY.md §2.2).
    """
    import numpy as np
    import pandas as pd

    arr = np.asarray(values, dtype=object)
    h = pd.util.hash_array(arr, categorize=False)
    return (h % np.uint64(num_buckets)).astype("int32")


_MD5_LOCAL = None


def _md5_con():
    """Per-thread cached in-process DuckDB connection for the
    vectorized md5 paths (a DuckDB connection is not safe for
    concurrent queries; Ray workers are separate processes, so this is
    one tiny connection per worker)."""
    global _MD5_LOCAL
    import threading

    if _MD5_LOCAL is None:
        _MD5_LOCAL = threading.local()
    con = getattr(_MD5_LOCAL, "con", None)
    if con is None:
        import duckdb

        con = duckdb.connect()
        # default, but the order-preserving scan IS the correctness
        # contract here — pin it
        con.execute("SET preserve_insertion_order = true")
        # md5 projections don't parallelize (measured flat 1→32
        # threads); one thread keeps Ray workers from oversubscribing
        con.execute("SET threads = 1")
        _MD5_LOCAL.con = con
    return con


def _md5_safe_arrow(values):
    """Arrow array for which DuckDB ``md5(CAST(v AS VARCHAR))`` is
    byte-identical to Python ``md5(str(v))`` — strings and (int64-range)
    integers only, no nulls; anything else (floats, bools, None,
    timestamps: all with engine-divergent string forms) returns None
    and the caller falls back to the exact per-value hashlib loop."""
    import numpy as np
    import pyarrow as pa

    if isinstance(values, pa.ChunkedArray):
        a = values.combine_chunks()
    elif isinstance(values, pa.Array):
        a = values
    else:
        try:
            a = pa.array(np.asarray(values))
        except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError, TypeError):
            return None
    t = a.type
    ok = (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or (pa.types.is_integer(t) and t.bit_width <= 64)
    )
    if not ok or a.null_count:
        return None
    return a


def _md5_duckdb(a, expr: str):
    """Run one md5 projection over an Arrow array, order-preserving."""
    import pyarrow as pa

    con = _md5_con()
    tbl = pa.table({"v": a})
    con.register("_md5_in", tbl)
    try:
        return con.execute(
            f"SELECT {expr} AS h FROM _md5_in"
        ).arrow()["h"].combine_chunks()
    finally:
        con.unregister("_md5_in")


def md5_60(values):
    """The engine's SQL-mirrorable value hash: int64 of the first 15 hex
    chars (60 bits) of md5 of each value's canonical string form —
    DuckDB recomputes it as ``('0x' || substr(md5(CAST(x AS VARCHAR)),
    1, 15))::BIGINT``, which is what makes every md5-60-seeded operator
    (HyperBall registers, G5 HLL, corrupt-tail negatives, FFD buckets,
    k-means seeding, random walks) oracle-replayable. ONE definition on
    purpose: the byte-identity with the SQL mirror is a correctness
    contract, and inline copies drift (review r4). Returns an int64
    numpy array.

    Vectorized (ADVICE r4): string/int inputs run the EXACT mirror
    expression through a per-worker in-process DuckDB — C-speed md5
    over the whole Arrow column, digests byte-identical by
    construction; other dtypes keep the per-value hashlib loop (their
    ``str(v)`` form has no cross-engine guarantee anyway)."""
    import numpy as np

    a = _md5_safe_arrow(values)
    if a is not None:
        return _md5_duckdb(
            a, "('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
    import hashlib

    return np.array(
        [
            int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            for v in np.asarray(values, dtype=object)
        ],
        dtype=np.int64,
    )


def md5_hex(values):
    """Vectorized full lowercase-hex md5 digest of each value's
    canonical string form (``hashlib.md5(str(v).encode()).hexdigest()``
    semantics, DuckDB ``md5(CAST(v AS VARCHAR))`` mirror) — the shared
    primitive behind the hash samplers / split rules (ADVICE r4:
    replaces their per-row hashlib listcomps). Returns a pyarrow string
    array aligned with the input."""
    import pyarrow as pa

    a = _md5_safe_arrow(values)
    if a is not None:
        return _md5_duckdb(a, "md5(CAST(v AS VARCHAR))")
    import hashlib

    import numpy as np

    return pa.array(
        [
            hashlib.md5(str(v).encode()).hexdigest()
            for v in np.asarray(values, dtype=object)
        ],
        pa.string(),
    )


def stable_hash64(values):
    """Vectorized stable 64-bit hash of a string array → int64 numpy.

    Used to replace long string grouping keys with 8-byte keys before a
    shuffle (bytes moved and sort/join cost both drop). Collision odds are
    n²/2⁶⁵ (≈4e-6 at 10⁷ distinct keys); a 10¹²-key deployment would
    widen to 128 bits (two independent hashes) behind the same helper.
    """
    import numpy as np
    import pandas as pd

    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False).view(np.int64)


def validate_schema(table: pa.Table, expected: pa.Schema, stage: str) -> None:
    """Assert a stage-boundary table matches its declared schema exactly
    (names + types, order-sensitive). Schema equality is itself a test
    (FIXTURES.md F4)."""
    got = pa.schema([(f.name, f.type) for f in table.schema])
    want = pa.schema([(f.name, f.type) for f in expected])
    if got != want:
        raise TypeError(
            f"stage {stage!r}: schema mismatch\n  got:  {got}\n  want: {want}"
        )
