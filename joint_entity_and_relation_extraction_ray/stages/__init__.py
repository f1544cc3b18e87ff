"""Ray Data stages: scorer, linker, canonicalization, graph, dedup, text."""
