"""Text normalization for dedup pipelines: the canonical form two
near-identical documents share. Pure Column expression."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: str) -> Column:
    """lowercase -> strip punctuation -> collapse whitespace -> trim.
    The standard pre-hash canonicalization for exact dedup: catches
    case/punctuation/spacing variants that md5-of-raw-text misses."""
    out = F.lower(F.col(col))
    out = F.regexp_replace(out, r"[^\p{L}\p{N}\s]", " ")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)
