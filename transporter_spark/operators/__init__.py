"""Operator library.

- ``transforms``  — parity set with the reference's per-message functions
  (function/registry.go:22-45): pick, omit, rename, skip, opfilter,
  remap, pretty, py (the JS-UDF analog).
- ``relational``  — the surface the reference deliberately lacks
  (SURVEY.md §2.6): joins, aggregation, windows, sorts, set ops.
- ``dedup``       — exact & near-duplicate detection at corpus scale.
- ``similarity``  — embedding similarity search (brute force + LSH).
- ``text``        — language id, quality scoring, tokenization,
  fingerprinting.
- ``multimodal``  — binary-column (image/audio/video) plumbing.
"""
