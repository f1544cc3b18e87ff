"""Tokenization and text normalization (pure, no Ray).

The reference family whitespace-tokenizes corpus sentences before wordpiece
alignment (SURVEY.md §2.1 R3, recon). Offsets here are char offsets into the
ORIGINAL ``text`` — the per-turn text-equality invariant (BASELINE.json:15)
forbids mutating `text`, so normalized forms live in scratch columns only.
"""

from __future__ import annotations

import re
import unicodedata

_TOKEN_RE = re.compile(r"\S+")


def tokenize_with_offsets(text: str) -> list[tuple[str, int, int]]:
    """Whitespace tokens with [start, end) char offsets into `text`."""
    return [(m.group(0), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


def normalize_surface(s: str) -> str:
    """NFC + casefold — the alias-dictionary key normalization
    (FIXTURES.md F2). Never applied to the `text` column itself."""
    return unicodedata.normalize("NFC", s).casefold()


def normalize_surface_array(arr):
    """Vectorized NFC + lowercase over an Arrow string array (the hot-path
    variant for grouping keys: Python-per-row normalize over 10^7 rows was
    a top-3 pipeline cost).

    Uses simple lowercase (pc.utf8_lower == str.lower) rather than full
    casefold; identical for ASCII and for all simple-case scripts — and it
    matches the DuckDB oracle's ``lower()``. Grouping only requires the
    SAME normalization on every path, which stages/canonical.py and
    stages/fused.py guarantee by both calling this function.
    """
    import pyarrow.compute as pc

    return pc.utf8_lower(pc.utf8_normalize(arr, form="NFC"))
