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
