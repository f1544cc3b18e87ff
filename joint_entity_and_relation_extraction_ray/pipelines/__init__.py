"""End-to-end pipelines and CLI entry points."""
