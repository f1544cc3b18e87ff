"""Pure, Ray-free functions: tokenization, decode semantics, hashing."""
