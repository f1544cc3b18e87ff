"""Count-min sketch — the decomposable heavy-hitters aggregate.

Completes the sketch trio (HLL distinct in `sketch.py`, MRL quantiles
in `qsketch.py`): a d×w counter matrix where each item increments one
counter per row (row-salted stable hash); estimate = min over rows.
Per-block partial sketches merge by ELEMENT-WISE ADD, so at 100 TB the
shuffle moves d·w int64s per block instead of that block's token
counts — the standard Cormode–Muthukrishnan construction, deterministic
here because the hashes are the engine's seeded stable_hash64.

One-sided guarantee carried to the caller: ``estimate(x) ≥ true(x)``
always (collisions only ADD); overshoot ≤ ε·N with ε = e/w per row and
the min over d rows takes the best. Tests pin both sides against exact
counts on zipfian data.
"""

from __future__ import annotations

import numpy as np

from ..schema import stable_hash64

DEFAULT_D = 4
DEFAULT_W = 2048


def cms_empty(d: int = DEFAULT_D, w: int = DEFAULT_W) -> np.ndarray:
    return np.zeros((d, w), dtype=np.int64)


def _row_hash(values: np.ndarray, row: int) -> np.ndarray:
    # row-salt by suffixing the row index — keeps stable_hash64 the only
    # hash primitive in the engine
    salted = np.char.add(values.astype("U"), f"\x1f{row}")
    return stable_hash64(salted).astype(np.uint64)


def cms_add(
    cms: np.ndarray, values, counts=None
) -> np.ndarray:
    """Fold ``values`` (with optional per-value ``counts``) into the
    sketch IN PLACE and return it."""
    v = np.asarray(values)
    if v.size == 0:
        return cms
    c = (
        np.ones(v.size, np.int64)
        if counts is None
        else np.asarray(counts, np.int64)
    )
    d, w = cms.shape
    for row in range(d):
        idx = (_row_hash(v, row) % np.uint64(w)).astype(np.int64)
        np.add.at(cms[row], idx, c)
    return cms


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a += b
    return a


def cms_estimate(cms: np.ndarray, values) -> np.ndarray:
    """Point estimates (≥ true counts) for ``values``."""
    v = np.asarray(values)
    d, w = cms.shape
    est = np.full(v.size, np.iinfo(np.int64).max, np.int64)
    for row in range(d):
        idx = (_row_hash(v, row) % np.uint64(w)).astype(np.int64)
        np.minimum(est, cms[row][idx], out=est)
    return est


def cms_serialize(cms: np.ndarray) -> bytes:
    d, w = cms.shape
    return d.to_bytes(4, "little") + w.to_bytes(4, "little") + cms.tobytes()


def cms_deserialize(blob: bytes) -> np.ndarray:
    d = int.from_bytes(blob[:4], "little")
    w = int.from_bytes(blob[4:8], "little")
    return np.frombuffer(blob[8:], dtype=np.int64).reshape(d, w).copy()
