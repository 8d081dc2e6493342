"""transporter_spark — a PySpark-native data movement & analytics engine.

A from-scratch rebuild of the capabilities of compose/transporter
(reference: /root/reference, a Go row-at-a-time ETL/CDC engine) as an
idiomatic Spark engine:

- the reference's Msg envelope (op/ts/ns/data) becomes a DataFrame with
  metadata columns (``envelope``),
- its per-message transforms (pick/omit/rename/skip/opfilter/remap/js-udf)
  become vectorized Column expressions registered by name (``registry``),
- its pipeline runtime (source -> transforms -> N sinks with namespace
  regex filters) becomes a declarative spec executed as DataFrame plans
  (``plans.pipeline``),
- its commitlog/offset resume machinery is replaced by Structured
  Streaming checkpoints (``streaming``),
- and the relational surface the reference lacks (joins, aggregations,
  windows, set ops) plus large-scale training-data ops (dedup, similarity
  search, text analysis, multimodal) are first-class operators.

Everything is expressed through the DataFrame API so Catalyst handles
predicate pushdown, column pruning, join strategy, and AQE; Python-level
code only *declares* plans.
"""

from transporter_spark.session import get_spark, stop_spark
from transporter_spark.envelope import (
    ENVELOPE_FIELDS,
    to_envelope,
    from_envelope,
    ns_filter,
)
from transporter_spark.registry import OPERATORS, register, build_operator

__all__ = [
    "get_spark",
    "stop_spark",
    "ENVELOPE_FIELDS",
    "to_envelope",
    "from_envelope",
    "ns_filter",
    "OPERATORS",
    "register",
    "build_operator",
]

__version__ = "0.1.0"
