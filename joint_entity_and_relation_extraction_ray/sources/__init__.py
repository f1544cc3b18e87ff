"""Sources: transcript reader/validator + deterministic synthetic corpus."""
