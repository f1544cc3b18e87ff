"""HyperLogLog distinct-count sketch — the decomposable aggregate that
lets ``COUNT(DISTINCT ...)`` pre-aggregate per block (SURVEY.md §2.2 G5
family; driver brief "a novel sketch").

Exact distinct is not decomposable: the raw rows must shuffle (see
stages/events.py daily_rollup). An HLL register array IS decomposable —
per-block partial sketches merge by element-wise max — so the shuffle
payload per (group, block) is ``2^p`` bytes instead of that block's raw
rows: the difference between shipping 10^12 user ids and shipping 4 KB
per group per block at 100 TB.

Pure numpy; precision p=12 → 4096 registers, standard error ≈ 1.6%.
Hash = the engine's stable 64-bit hash (schema.stable_hash64), so sketches
are deterministic across runs and nodes. The (64-p)-bit rank suffix fits
float64's 53-bit exact-integer range for p ≥ 11, so the log2-based rank is
exact (asserted at import for the default p).
"""

from __future__ import annotations

import numpy as np

from ..schema import stable_hash64

DEFAULT_P = 12

assert 64 - DEFAULT_P <= 53, "rank suffix must stay float64-exact"


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_empty(p: int = DEFAULT_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add(registers: np.ndarray, values, p: int = DEFAULT_P) -> np.ndarray:
    """Fold ``values`` (any dtype; hashed with stable_hash64) into the
    register array IN PLACE and return it."""
    if len(values) == 0:
        return registers
    h = stable_hash64(np.asarray(values)).astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    # rank = leading-zero count of the (64-p)-bit suffix + 1
    rank = np.where(
        w == 0,
        64 - p + 1,
        (64 - p) - np.floor(np.log2(np.maximum(w, 1).astype(np.float64))),
    ).astype(np.uint8)
    np.maximum.at(registers, idx, rank)
    return registers


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_count(registers: np.ndarray, p: int = DEFAULT_P) -> int:
    """Cardinality estimate with the standard small-range correction."""
    m = 1 << p
    est = _alpha(m) * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int(np.count_nonzero(registers == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return int(round(est))


def hll_serialize(registers: np.ndarray) -> bytes:
    return registers.tobytes()


def hll_deserialize(blob: bytes) -> np.ndarray:
    return np.frombuffer(blob, dtype=np.uint8).copy()
