"""Deterministic mergeable quantile sketch (MRL compactor chain) — the
APPROXIMATE scale path for percentiles over unbounded-cardinality
columns.

The exact quantile operators (stages/relational.value_quantiles*) ship
the DISTINCT-value histogram, which is only driver-small for bounded
integer metrics. For a 100-TB float column (latencies, scores) the
histogram IS the column; the classic answer is a compactor-chain sketch
(Manku–Rajagopalan–Lindsay 1998 / the derandomized-KLL family): each
level holds ≤ k items of weight 2^level; an over-full level sorts
itself and promotes every second item (alternating even/odd offsets —
fully DETERMINISTIC, no RNG) to the next level. Size is O(k·log(n/k));
merge = concatenate levels + recompress, so per-block partial sketches
reduce in a tree exactly like the HLL in `sketch.py`.

Error accounting is carried IN the sketch: each compaction at level l
perturbs any rank by ≤ 2^l, so ``err_bound`` (the running sum) is a
worst-case certificate — `query(q)` returns a value whose true rank is
within ±err_bound of q·n, and tests assert the certificate holds
against exact quantiles. Deterministic given the same input order; the
result may differ across block layouts (documented — that is every
mergeable sketch's contract, and why the driver check is rows-only).
"""

from __future__ import annotations

import numpy as np

DEFAULT_K = 256


class QuantileSketch:
    __slots__ = ("k", "levels", "n", "err_bound", "_alt")

    def __init__(self, k: int = DEFAULT_K):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.n = 0
        self.err_bound = 0
        self._alt: list[int] = [0]  # per-level alternation counters

    def add_batch(self, values) -> "QuantileSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += int(v.size)
        self._compress()
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
            self._alt.append(0)
        for lvl, items in enumerate(other.levels):
            if items.size:
                self.levels[lvl] = np.concatenate([self.levels[lvl], items])
        self.n += other.n
        self.err_bound += other.err_bound
        self._compress()
        return self

    def _compress(self) -> None:
        lvl = 0
        while lvl < len(self.levels):
            buf = self.levels[lvl]
            if buf.size <= self.k:
                lvl += 1
                continue
            buf = np.sort(buf, kind="stable")
            m = buf.size - (buf.size & 1)  # compact an even count
            off = self._alt[lvl] & 1
            self._alt[lvl] += 1
            promoted = buf[off:m:2]
            leftover = buf[m:]  # ≤ 1 item stays at this level
            self.levels[lvl] = leftover
            if lvl + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
                self._alt.append(0)
            self.levels[lvl + 1] = np.concatenate(
                [self.levels[lvl + 1], promoted]
            )
            self.err_bound += 1 << lvl
            lvl += 1

    def query(self, q: float) -> float:
        """Smallest sketched value whose cumulative weight ≥ q·n (the
        lower quantile rule); true rank is within ±err_bound."""
        if self.n == 0:
            raise ValueError("empty sketch")
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [
                np.full(items.size, 1 << lvl, np.int64)
                for lvl, items in enumerate(self.levels)
            ]
        )
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        target = max(1, int(np.ceil(q * self.n)))
        idx = int(np.searchsorted(cum, target))
        return float(vals[min(idx, vals.size - 1)])

    def size(self) -> int:
        return int(sum(items.size for items in self.levels))

    def serialize(self) -> bytes:
        import pickle

        return pickle.dumps(
            (self.k, [i.tolist() for i in self.levels], self.n,
             self.err_bound, self._alt)
        )

    @classmethod
    def deserialize(cls, blob: bytes) -> "QuantileSketch":
        import pickle

        k, levels, n, err, alt = pickle.loads(blob)
        s = cls(k)
        s.levels = [np.asarray(i, np.float64) for i in levels]
        s.n, s.err_bound, s._alt = n, err, list(alt)
        return s
