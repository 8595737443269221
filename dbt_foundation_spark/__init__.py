"""dbt_foundation_spark — a PySpark-native analytics/transformation engine.

Re-expresses the capabilities of the reference dbt framework
(YukiTechnologies/dbt-foundation, a dbt-on-Snowflake starter: SQL
pass-through models + DAG orchestration + tests + utility macros) as an
idiomatic Spark-first engine:

- ``project`` / ``manifest``: models as Python functions ``(ctx) -> DataFrame``
  (or Spark-SQL strings) with ``ref()``/``source()`` resolution and a
  topologically-ordered parallel scheduler (reference:
  profiles.example.yml:15 — 16 threads).
- ``materialize``: view / table / incremental / ephemeral / snapshot
  materialization strategies on plain Parquet (no Delta in this env).
- ``testing``: dbt-style data tests (unique / not_null / relationships /
  accepted_values + the dbt_utils generic-test family) — a test is a query
  whose result must be empty (reference: models/example/schema.yml:10-21).
- ``functions``: dbt_utils macro parity as pure Column helpers (zero-cost,
  Catalyst-visible — no UDFs in the hot path).
- ``operators``: LLM-data-pipeline extensions (dedup, similarity search,
  text analysis, multimodal plumbing) designed for 100 TB scale.
- ``queries``: the SURVEY §2 query catalog wired to DuckDB oracles.
"""

__version__ = "0.1.0"

from dbt_foundation_spark.session import get_spark  # noqa: F401
