"""HyperLogLog distinct-count sketch — the decomposable aggregate that
lets ``COUNT(DISTINCT ...)`` pre-aggregate per block (SURVEY.md §2.2 G5
family; driver brief "a novel sketch").

Exact distinct is not decomposable: the raw rows must shuffle (see
stages/events.py daily_rollup). An HLL register array IS decomposable —
per-block partial sketches merge by element-wise max — so the shuffle
payload per (group, block) is ``2^p`` bytes instead of that block's raw
rows: the difference between shipping 10^12 user ids and shipping 4 KB
per group per block at 100 TB.

Pure numpy + hashlib; precision p=12 → 4096 registers, standard error
≈ 1.6%. Hash = md5-60 of the value's canonical string form (the engine's
SQL-mirrorable hash family, same as random_walks' step rule and the
HyperBall registers in stages/graph.py) — so a DuckDB oracle recomputes
IDENTICAL registers from ``md5(CAST(x AS VARCHAR))`` and the estimates
are exact mirrors. The estimator keeps Z⁻¹ as the exact integer
S = Σ 2^(R−reg) (R = 61−p), making the raw estimate ONE
correctly-rounded double division — no float sum depends on reduction
order, so results are bit-reproducible across engines and block layouts.
(A vectorized 64-bit hash is the drop-in replacement if oracle parity is
ever traded away for ingest throughput.)
"""

from __future__ import annotations

import math

import numpy as np

from ..schema import md5_60

DEFAULT_P = 12

assert 60 - DEFAULT_P <= 52, "rank suffix must stay float64-exact"


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_estimate_num(p: int) -> float:
    """alpha_m·m²·2^(61−p): the estimator's numerator, computed once and
    embedded verbatim (repr) in oracle SQL so both engines divide the
    same double by the same integer S."""
    m = 1 << p
    return _alpha(m) * m * m * float(1 << (60 - p + 1))


def hll_empty(p: int = DEFAULT_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add(registers: np.ndarray, values, p: int = DEFAULT_P) -> np.ndarray:
    """Fold ``values`` into the register array IN PLACE and return it.

    Values hash as md5-60 of their canonical string form. The
    documented contract is STRING / INT inputs only: numpy's float (and
    bool/datetime) string formatting is NOT guaranteed to match
    DuckDB's ``CAST(x AS VARCHAR)`` across magnitudes (scientific-
    notation cutoffs, 'True' vs 'true'), so those dtypes raise rather
    than silently breaking oracle parity (ADVICE r4). Top p bits →
    register index, (60−p)-bit suffix → rank via the exact frexp
    bit-length (no log2 rounding hazard)."""
    if len(values) == 0:
        return registers
    arr = np.asarray(values)
    if arr.dtype.kind in ("f", "c", "b", "M", "m"):
        raise TypeError(
            "hll_add takes string/int values only: the "
            f"{arr.dtype} string form has no cross-engine md5 parity "
            "guarantee (cast to a canonical string yourself first)"
        )
    if arr.dtype.kind not in ("U", "O"):
        arr = arr.astype(str)
    q = 60 - p
    h = md5_60(arr).astype(np.uint64)
    idx = (h >> np.uint64(q)).astype(np.int64)
    w = h & np.uint64((1 << q) - 1)
    blen = np.frexp(w.astype(np.float64))[1]
    rank = np.where(w == 0, q + 1, q + 1 - blen).astype(np.uint8)
    np.maximum.at(registers, idx, rank)
    return registers


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_count(registers: np.ndarray, p: int = DEFAULT_P) -> int:
    """Cardinality estimate with the standard small-range correction —
    bit-reproducibly: S = Σ 2^(R−reg) is an exact int (≤ m·2^R < 2^62),
    the raw estimate is one double division NUM/S, linear counting uses
    libm log (what DuckDB's ln calls too), readout floor(est+0.5)."""
    m = 1 << p
    R = 60 - p + 1
    regs = registers.astype(np.int64)
    s = int(np.left_shift(np.int64(1), R - regs).sum())
    est = hll_estimate_num(p) / s
    zeros = int(np.count_nonzero(registers == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)  # linear counting
    return int(math.floor(est + 0.5))


def hll_serialize(registers: np.ndarray) -> bytes:
    return registers.tobytes()


def hll_deserialize(blob: bytes) -> np.ndarray:
    return np.frombuffer(blob, dtype=np.uint8).copy()
