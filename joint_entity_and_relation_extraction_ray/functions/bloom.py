"""Distributed Bloom filter — a shuffle-volume reducer for big-big
semi/anti joins (SURVEY.md §2.2 "custom operators"; the classic
pre-filter every distributed engine bolts onto hash joins).

When the right side of a membership join is too big to broadcast as a
key set, the co-bucketed shuffle ships EVERY left row. A Bloom filter
of the right keys is ~1.2 bytes/key at 1% false positives — often 50×
smaller than the key set — so it still broadcasts long after the keys
can't, and the exact shuffle then only moves the (maybe-member) left
rows that pass it. False positives are culled by the exact stage, so
the composed operator stays EXACT; false negatives are impossible.

Construction is distributed: one Ray task per chunk of Arrow block
refs builds a partial bitmap, then a binary tree of OR tasks merges
them — the driver touches exactly one final bitmap (m/8 bytes).

Hashing: ``pandas.util.hash_array`` (SipHash, fixed key) gives h1;
h2 is a splitmix64 remix of h1 (``hash_array``'s ``hash_key`` only
affects object dtypes, so remixing is how we get an independent
second hash for int64 keys too). Bit i = (h1 + i*h2) mod m — standard
Kirsch–Mitzenmacher double hashing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

__all__ = ["BloomFilter", "bloom_from_dataset"]

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a full-avalanche remix."""
    with np.errstate(over="ignore"):
        x = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
        x = ((x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)).astype(_U64)
        x = ((x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)).astype(_U64)
        return (x ^ (x >> _U64(31))).astype(_U64)


def _hashes(values, m_bits: int, k: int) -> np.ndarray:
    """(n, k) uint64 bit indices for each value."""
    import pandas as pd

    arr = np.asarray(values)
    if arr.dtype.kind not in "iufb":  # strings hash via the object path
        arr = arr.astype(object)
    h1 = pd.util.hash_array(arr, categorize=False).astype(_U64)
    h2 = _splitmix64(h1)
    i = np.arange(k, dtype=_U64)
    with np.errstate(over="ignore"):
        idx = (h1[:, None] + i[None, :] * h2[:, None]).astype(_U64)
    return idx % _U64(m_bits)


def _set_bits(bits: np.ndarray, idx: np.ndarray) -> None:
    """OR bit positions ``idx`` (flat uint64 array) into packed ``bits``."""
    word = (idx >> _U64(6)).astype(np.int64)
    bit = (idx & _U64(63)).astype(_U64)
    np.bitwise_or.at(bits, word, _U64(1) << bit)


class BloomFilter:
    """Immutable packed-bit Bloom filter. ``bits`` is uint64[m/64]."""

    def __init__(self, bits: np.ndarray, m_bits: int, k: int):
        self.bits = bits
        self.m_bits = int(m_bits)
        self.k = int(k)

    def contains(self, values) -> np.ndarray:
        """Vectorized maybe-membership test → bool[n]. No false negatives."""
        idx = _hashes(values, self.m_bits, self.k)
        word = (idx >> _U64(6)).astype(np.int64)
        bit = (idx & _U64(63)).astype(_U64)
        hit = (self.bits[word] >> bit) & _U64(1)
        return hit.all(axis=1)

    @staticmethod
    def sized_for(n_keys: int, fp_rate: float = 0.01) -> tuple[int, int]:
        """(m_bits, k) for a target false-positive rate; m is rounded up
        to a multiple of 64 with a 2^16 floor."""
        n = max(1, n_keys)
        m = int(np.ceil(-n * np.log(fp_rate) / (np.log(2) ** 2)))
        m = max(1 << 16, (m + 63) // 64 * 64)
        k = max(1, int(round(m / n * np.log(2))))
        return m, min(k, 16)


def bloom_from_dataset(
    ds: ray.data.Dataset,
    col: str,
    *,
    n_keys_hint: int | None = None,
    fp_rate: float = 0.01,
) -> BloomFilter:
    """Build a BloomFilter over ``ds[col]`` distributed: partial bitmaps
    per chunk of Arrow block refs, OR-merged by a binary task tree. The
    driver materializes ONE bitmap of m/8 bytes (e.g. 1.2 MB per million
    keys at 1%), never the keys."""
    mat = ds.select_columns([col]).materialize()
    n = n_keys_hint if n_keys_hint is not None else mat.count()
    m_bits, k = BloomFilter.sized_for(n, fp_rate)
    blocks = mat.to_arrow_refs()

    @ray.remote
    def _partial(*tables) -> np.ndarray:
        bits = np.zeros(m_bits // 64, dtype=_U64)
        for t in tables:
            if t.num_rows == 0:
                continue
            vals = t[col].combine_chunks().drop_null()
            if len(vals) == 0:
                continue
            _set_bits(
                bits, _hashes(vals.to_numpy(zero_copy_only=False),
                              m_bits, k).ravel()
            )
        return bits

    @ray.remote
    def _or(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.bitwise_or(a, b)

    if not blocks:
        return BloomFilter(np.zeros(m_bits // 64, dtype=_U64), m_bits, k)
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n_chunks = max(1, min(len(blocks), 2 * ncpu))
    size = (len(blocks) + n_chunks - 1) // n_chunks
    parts = [
        _partial.remote(*blocks[i : i + size])
        for i in range(0, len(blocks), size)
    ]
    while len(parts) > 1:  # binary OR tree: driver never holds >1 bitmap
        nxt = [
            _or.remote(parts[i], parts[i + 1])
            for i in range(0, len(parts) - 1, 2)
        ]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return BloomFilter(ray.get(parts[0]), m_bits, k)
