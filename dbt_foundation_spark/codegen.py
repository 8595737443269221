"""Codegen — scaffolding generators (reference: the pinned ``codegen``
0.13.1 package, /root/reference/packages.yml:6-7, README.md:265).

The dbt codegen package generates three artifacts from live warehouse
schemas: source YAML, base ("staging") models, and model YAML. Here the
schema authority is Catalyst (``df.schema``) instead of the Snowflake
information schema, and generated models are PySpark model functions (or
equivalent SQL text) instead of Jinja SQL.

Emission is dependency-free string building — no yaml lib required to
*write* YAML this simple, and the output round-trips through any parser.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from dbt_foundation_spark.sources.registry import SourceRegistry


def _simple_type(dt: str) -> str:
    """Spark simpleString for a column type (already lowercase)."""
    return dt


def generate_source_yaml(
    spark: SparkSession, registry: SourceRegistry, source_name: str
) -> str:
    """codegen.generate_source analog: YAML block for every table of a
    declared source, with per-column names + Spark types."""
    lines = ["version: 2", "", "sources:", f"  - name: {source_name}", "    tables:"]
    for table in registry.tables(source_name):
        df = registry.load(spark, source_name, table)
        lines.append(f"      - name: {table}")
        lines.append("        columns:")
        for f in df.schema.fields:
            lines.append(f"          - name: {f.name}")
            lines.append(f"            data_type: {_simple_type(f.dataType.simpleString())}")
    return "\n".join(lines) + "\n"


def generate_base_model(
    spark: SparkSession, registry: SourceRegistry, source_name: str, table: str
) -> str:
    """codegen.generate_base_model analog: the canonical 1:1 staging
    model over a source — explicit column list (anti-``SELECT *``), ready
    to paste as a ``@project.model`` function."""
    df = registry.load(spark, source_name, table)
    cols = ",\n        ".join(f'"{c}"' for c in df.schema.names)
    return (
        f"@project.model(materialized=\"view\")\n"
        f"def stg_{table}(ctx):\n"
        f"    return ctx.source(\"{source_name}\", \"{table}\").select(\n"
        f"        {cols},\n"
        f"    )\n"
    )


def generate_model_import_ctes(project, model_name: str) -> str:
    """codegen.generate_model_import_ctes analog (the pinned package's
    fourth generator): rewrite a SQL-string model so every ``ref()``
    appears exactly once, in an import CTE at the top, and the body
    reads the CTE aliases — the house style the upstream macro enforces.

    The import CTEs keep the ``ref()`` call inside them (``select * from
    ref('x')``), so the rewritten text still compiles through
    ``Project.resolve_sql`` with identical DAG edges — the test
    round-trips a 2-ref model and checks result equality.
    """
    from dbt_foundation_spark.project import _SQL_REF_RE, _ref_shape

    node = project.manifest[model_name]
    if node.sql is None:
        raise ValueError(
            f"{model_name}: generate_model_import_ctes rewrites SQL-string "
            "models; function models already bind refs via ctx.ref()"
        )
    body = node.sql.strip()
    order: list[tuple[str, str]] = []  # (ref text, cte alias), first-seen order
    aliases: dict[str, str] = {}

    def alias_for(m: re.Match) -> str:
        txt = m.group(0)
        if txt not in aliases:
            name, pkg, ver = _ref_shape(m)
            base = re.sub(r"\W+", "_", "_".join(p for p in (pkg, name) if p))
            if ver is not None:
                base += f"_v{ver}"
            alias = base
            n = 1
            while alias in aliases.values():
                n += 1
                alias = f"{base}_{n}"
            aliases[txt] = alias
            order.append((txt, alias))
        return aliases[txt]

    new_body = _SQL_REF_RE.sub(alias_for, body)
    if not order:
        return body
    imports = ",\n".join(
        f"{alias} as (\n    select * from {txt}\n)" for txt, alias in order
    )
    # splice before any CTEs the model already declares
    if re.match(r"(?i)^\s*with\b", new_body):
        new_body = re.sub(r"(?i)^\s*with\b", "", new_body, count=1).strip()
        return f"with {imports},\n{new_body}"
    return f"with {imports}\n{new_body}"


def generate_model_yaml(name: str, df: DataFrame, description: str = "") -> str:
    """codegen.generate_model_yaml analog: per-column YAML scaffold for
    docs + tests, typed from the model DataFrame's Catalyst schema."""
    lines = ["version: 2", "", "models:", f"  - name: {name}"]
    if description:
        lines.append(f"    description: \"{description}\"")
    lines.append("    columns:")
    for f in df.schema.fields:
        lines.append(f"      - name: {f.name}")
        lines.append(f"        data_type: {_simple_type(f.dataType.simpleString())}")
        lines.append("        description: \"\"")
    return "\n".join(lines) + "\n"
