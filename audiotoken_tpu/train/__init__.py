"""Offline training tooling: semantic->acoustic GPT trainer (sharded) and
semantic quantizer training (EMA VQ / k-means) — SURVEY.md §2 rows
"Quantizer training" and the GPT checkpoints' provenance."""
