"""Operator registry: name -> factory(config) -> (DataFrame -> DataFrame).

Parity with the reference's function registry (function/registry.go:22-45)
where transforms are registered by name and instantiated from JSON config.
Here an operator factory returns a *plan transformer* — a pure function
DataFrame -> DataFrame — so pipelines stay declarative and Catalyst sees
one fused plan, not a chain of materialized steps.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame

Operator = Callable[[DataFrame], DataFrame]
OperatorFactory = Callable[..., Operator]

OPERATORS: Dict[str, OperatorFactory] = {}


def register(name: str, *aliases: str) -> Callable[[OperatorFactory], OperatorFactory]:
    """Decorator: ``@register("pick")`` adds the factory under ``name``.

    Aliases mirror the reference's goja/js and otto/transformer dual names
    (function/registry.go:30-44).
    """

    def deco(factory: OperatorFactory) -> OperatorFactory:
        for n in (name, *aliases):
            if n in OPERATORS:
                raise ValueError(f"operator {n!r} already registered")
            OPERATORS[n] = factory
        return factory

    return deco


def build_operator(name: str, **config) -> Operator:
    """Instantiate an operator from its registered name + config dict."""
    _ensure_loaded()
    try:
        factory = OPERATORS[name]
    except KeyError:
        raise KeyError(
            f"unknown operator {name!r}; registered: {sorted(OPERATORS)}"
        ) from None
    return factory(**config)


#: operator modules with @register side effects (the analog of the
#: reference's blank imports, function/all/all.go)
_OPERATOR_MODULES = (
    "transporter_spark.operators.transforms",
    "transporter_spark.operators.dedup",
    "transporter_spark.operators.text",
    "transporter_spark.operators.similarity",
    "transporter_spark.operators.multimodal",
    "transporter_spark.operators.relational",
    "transporter_spark.operators.sketches",
)

_loaded = False


def _ensure_loaded() -> None:
    global _loaded
    if _loaded:
        return
    import importlib

    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _loaded = True
