"""Model contracts (dbt 1.5 ``contract: {enforced: true}``).

Reference parity: the reference pins dbt-core ">=1.5" surfaces
(README.md:91 `dbt run`); contracts are the schema-stability guarantee a
mart consumer relies on. dbt enforces two layers and so do we:

1. **Schema contract** — the built frame must carry EXACTLY the declared
   column set, each with the declared data type. This is a plan-time
   check against ``df.schema`` (Catalyst already resolved types): zero
   jobs, zero data read, so it runs unconditionally before any write.
2. **Constraints** — ``not_null`` / ``check`` / ``unique`` per column.
   Snowflake/Spark don't enforce row constraints in the engine, and dbt
   downgrades them to "validated, not enforced" on such adapters; we
   validate them with ONE aggregate job over the build frame *before*
   the write, so a violating build never lands (stronger than dbt's
   post-hoc test, same cost as one extra scan of the batch).

Scale notes: the validation scan is a single map-side-combinable
aggregate (conditional counts), no shuffle except for ``unique`` which
needs ``count_distinct`` on the constrained column — the same shuffle
the equivalent dbt ``unique`` test would run. For an incremental model
only the BATCH is validated (the frame being written), so cost tracks
batch size, not table size, at 100 TB.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from dbt_foundation_spark.manifest import Node


class ContractError(ValueError):
    """A contracted model's frame violates its declared schema/constraints."""


def _normalize_type(ddl: str) -> str:
    """Canonical Spark DDL spelling so 'long' == 'bigint', 'integer' == 'int'."""
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(ddl).simpleString()


def _declared_constraints(spec: dict[str, Any]) -> list[dict[str, Any]]:
    """Column constraints, accepting both dbt's dict shape
    (``{"type": "not_null"}``) and a bare-string shorthand."""
    out = []
    for c in spec.get("constraints", ()) or ():
        if isinstance(c, str):
            out.append({"type": c})
        else:
            out.append(dict(c))
    return out


def check_schema(node: Node, df: DataFrame) -> None:
    """Layer 1: exact column-set + type match (plan-time, no job).

    dbt's contract check is order-insensitive on names but exact on the
    set and on types; we match that. Every declared column needs a
    ``data_type`` (dbt errors on contracted models without one).
    """
    declared = node.columns
    missing_types = [c for c, spec in declared.items() if not spec.get("data_type")]
    if missing_types:
        raise ContractError(
            f"{node.name}: contract is enforced but columns {sorted(missing_types)} "
            "declare no data_type"
        )
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems: list[str] = []
    for name, spec in declared.items():
        want = _normalize_type(str(spec["data_type"]))
        got = actual.get(name)
        if got is None:
            problems.append(f"missing declared column {name} ({want})")
        elif got != want:
            problems.append(f"column {name}: declared {want}, built {got}")
    undeclared = sorted(set(actual) - set(declared))
    if undeclared:
        problems.append(f"undeclared columns in build: {undeclared}")
    if problems:
        raise ContractError(
            f"{node.name}: schema contract violated — " + "; ".join(problems)
        )


def validate_constraints(node: Node, df: DataFrame) -> None:
    """Layer 2: one aggregate job counting violations for every declared
    row constraint; raises listing each violated constraint with its
    violation count. No-op (zero jobs) when no constraints are declared.
    """
    aggs: list[tuple[str, Column]] = []  # (description, violation-count agg)
    for col, spec in node.columns.items():
        for c in _declared_constraints(spec):
            kind = c.get("type")
            if kind == "not_null":
                aggs.append(
                    (
                        f"{col} not_null",
                        F.count_if(F.col(col).isNull()),
                    )
                )
            elif kind == "check":
                expr = c.get("expression")
                if not expr:
                    raise ContractError(
                        f"{node.name}: check constraint on {col} has no expression"
                    )
                cond = F.expr(expr)
                # SQL CHECK semantics (and the warehouse behavior dbt
                # emulates): a NULL predicate result PASSES — only rows
                # where the predicate is definitively false violate.
                aggs.append(
                    (
                        f"{col} check({expr})",
                        F.count_if(~F.coalesce(cond, F.lit(True))),
                    )
                )
            elif kind == "unique":
                aggs.append(
                    (
                        f"{col} unique",
                        F.count(F.col(col)) - F.count_distinct(F.col(col)),
                    )
                )
            elif kind in ("primary_key",):
                aggs.append((f"{col} pk/null", F.count_if(F.col(col).isNull())))
                aggs.append(
                    (
                        f"{col} pk/unique",
                        F.count(F.col(col)) - F.count_distinct(F.col(col)),
                    )
                )
            elif kind in ("foreign_key", "custom"):
                # engine-external referents: documented as not validated
                # (dbt marks these warn_unenforced on Spark-like adapters)
                continue
            else:
                raise ContractError(
                    f"{node.name}: unknown constraint type {kind!r} on {col}"
                )
    if not aggs:
        return
    row = df.agg(*[a.alias(f"c{i}") for i, (_, a) in enumerate(aggs)]).first()
    violated = [
        f"{desc} ({row[i]} rows)" for i, (desc, _) in enumerate(aggs) if row[i]
    ]
    if violated:
        raise ContractError(
            f"{node.name}: constraint(s) violated — " + "; ".join(violated)
        )


def enforce(node: Node, df: DataFrame) -> None:
    """Full contract gate, called by the executor before materialization
    when ``node.config.extra['contract']['enforced']`` is true."""
    check_schema(node, df)
    validate_constraints(node, df)
