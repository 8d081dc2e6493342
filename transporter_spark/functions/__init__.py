"""The engine's scalar-function surface.

The reference has NO scalar function library (SURVEY §2.6 — only the
implicit casify coercions); this package is the deliberate replacement:
pyspark.sql.functions passes through untouched, plus the engine's own
additions — extended-JSON normalization (the BSON edge-type policy),
text analytics, portable hashing, vector math.
"""

from pyspark.sql import functions as F  # re-export: the base library

from transporter_spark.functions.extended_json import (
    EXTENDED_JSON_POLICY,
    normalize_extended_json,
)
from transporter_spark.operators.dedup import cosine_expr, stable_hash32, word_shingles
from transporter_spark.operators.text import (
    char_count,
    fingerprint,
    lang_id,
    mean_token_len,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)
from transporter_spark.functions.textnorm import normalize_text

__all__ = [
    "F",
    "EXTENDED_JSON_POLICY",
    "normalize_extended_json",
    "normalize_text",
    "cosine_expr",
    "stable_hash32",
    "word_shingles",
    "char_count",
    "fingerprint",
    "lang_id",
    "mean_token_len",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "token_count",
]
