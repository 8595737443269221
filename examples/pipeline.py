"""End-to-end example project — the engine's user-facing surface in one
file, mirroring how the reference project is used day-to-day:

    dbt run            → build_project(...).run()
    dbt test           → run_tests(project, ...)
    dbt run-operation list_orphaned_objects → ops registry
    project_evaluator  → evaluator.evaluate

Run directly (uses sf0.001 testdata):  python examples/pipeline.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from dbt_foundation_spark.evaluator import evaluate
from dbt_foundation_spark.ops import default_registry, lint
from dbt_foundation_spark.project import Project, Target
from dbt_foundation_spark.sources.registry import testdata_sources
from dbt_foundation_spark.testing import not_null, relationships, run_tests


def build_project(spark, sf_dir: str, schema: str = "example") -> Project:
    project = Project(
        "example_project",
        spark,
        sources=testdata_sources(sf_dir),
        target=Target(name="dev", schema=schema, threads=4),
    )

    # --- staging layer: 1:1 views over sources (reference default
    #     materialization, dbt_project.yml:32-36) ---

    @project.model(
        columns={"o_orderkey": {"tests": ["unique", "not_null"], "description": "pk"}}
    )
    def stg_orders(ctx):
        return ctx.source("raw", "orders")

    @project.model
    def stg_lineitem(ctx):
        return ctx.source("raw", "lineitem")

    @project.model
    def stg_customer(ctx):
        return ctx.source("raw", "customer")

    # --- marts: a partitioned CTAS table and an incremental merge ---

    @project.model(
        materialized="table",
        partition_by=("l_returnflag",),
        # dbt 1.5 enforced contract: schema checked at plan time, row
        # constraints validated before the write (contracts.py)
        contract={"enforced": True},
        columns={
            "l_returnflag": {"data_type": "string", "constraints": ["not_null"]},
            "l_linestatus": {"data_type": "string", "constraints": ["not_null"]},
            "sum_qty": {"data_type": "double"},
            "sum_base_price": {"data_type": "double"},
            "avg_disc": {
                "data_type": "double",
                "constraints": [
                    {"type": "check", "expression": "avg_disc BETWEEN 0 AND 1"}
                ],
            },
            "count_order": {"data_type": "bigint"},
        },
    )
    def fct_pricing_summary(ctx):
        li = ctx.ref("stg_lineitem")
        return (
            li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum("l_extendedprice").alias("sum_base_price"),
                F.avg("l_discount").alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )

    @project.model(
        materialized="incremental", incremental_strategy="merge", unique_key="c_custkey"
    )
    def dim_customer(ctx):
        return ctx.ref("stg_customer")

    # dbt 1.9 microbatch: daily event partitions, lookback restatement —
    # re-running rebuilds only the trailing window, never the table
    @project.model(
        materialized="incremental",
        incremental_strategy="microbatch",
        event_time="ts",
        batch_size="day",
        lookback=1,
        begin="2024-01-01",
    )
    def fct_daily_events(ctx):
        ev = ctx.source("raw", "events")
        if dict(ev.dtypes).get("ts") == "bigint":  # TIMESTAMP(NANOS) parquet
            ev = ev.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
            )
        return ev.select("event_id", "ts", "user_id", "value")

    # --- curation mart: the LLM-data operators inside the same DAG ---

    @project.model
    def stg_documents(ctx):
        return ctx.source("raw", "documents")

    @project.model(materialized="table")
    def fct_curated_documents(ctx):
        """Scrub + score + gate the corpus, then drop exact dups —
        operators and framework composing in one node."""
        from dbt_foundation_spark.functions.redact import redact_pii
        from dbt_foundation_spark.functions.text import (
            fingerprint,
            lang_id,
            quality_score,
        )
        from dbt_foundation_spark.operators.dedup import exact_dedup

        docs = ctx.ref("stg_documents")
        curated = (
            docs.withColumn("quality", F.round(quality_score("text"), 6))
            .filter(F.col("quality") >= 0.5)
            .select(
                "doc_id",
                redact_pii("text").alias("clean_text"),
                lang_id("text").alias("lang_detected"),
                "quality",
                fingerprint("text").alias("fp"),
            )
        )
        return exact_dedup(curated, ["fp"], keep_order=["doc_id"]).drop("fp")

    return project


def run_example_tests(project: Project):
    """Declared column tests (from model metadata) + a singular
    relationships test, dbt-test style: pass iff zero violation rows."""
    declared = run_tests(project)  # unique/not_null from columns metadata
    singular = run_tests(
        project,
        tests={
            "stg_lineitem": {
                "fk_orders": [
                    relationships(
                        "l_orderkey", project._node_frame("stg_orders"), "o_orderkey"
                    )
                ]
            },
            "fct_pricing_summary": {"flag_not_null": [not_null("l_returnflag")]},
        },
    )
    return declared + singular


def main() -> None:  # pragma: no cover - direct invocation path
    import tempfile

    from dbt_foundation_spark.docs import generate_docs
    from dbt_foundation_spark.session import get_spark
    from dbt_foundation_spark.unit_tests import run_unit_test

    spark = get_spark(app_name="example_pipeline")
    sf_dir = "/root/testdata/sf0.001"
    project = build_project(spark, sf_dir)
    # dashboards are lineage nodes: the evaluator flags view parents
    project.exposure(
        "revenue_dashboard", depends_on=("fct_pricing_summary",), owner="analytics"
    )
    # selector grammar: run the pricing mart and everything it needs
    for r in project.run(selector="+fct_pricing_summary"):
        print(f"{r.status:8s} {r.node}")
    # dbt build for the rest: declared tests run right after each model
    # and gate its dependents (test_pass/test_fail rows in the results)
    for r in project.build():
        print(f"{r.status:8s} {r.node}")
    for t in run_example_tests(project):
        print(f"{t.status:5s} {t.model}.{t.test}")
    # dbt-1.8 unit test: model logic on fixture rows, no warehouse reads
    ut = run_unit_test(
        project,
        "fct_pricing_summary",
        given={"stg_lineitem": [
            {"l_returnflag": "A", "l_linestatus": "F", "l_quantity": 2.0,
             "l_extendedprice": 10.0, "l_discount": 0.0, "l_tax": 0.0,
             "l_shipdate": "1995-01-01"},
        ]},
        expect=[{"l_returnflag": "A", "sum_qty": 2.0}],
    )
    print(f"unit  fct_pricing_summary: {ut.status} {ut.message or ''}")
    # source freshness: graded against the declared budgets
    from dbt_foundation_spark.sources.registry import check_freshness

    for row in check_freshness(spark, project.sources):
        print(f"fresh {row['source']}.{row['table']}: {row['status']}")
    # semantic layer: governed metrics over the built mart (metrics.py)
    from dbt_foundation_spark.metrics import SemanticLayer

    sl = SemanticLayer()
    sl.semantic_model(
        "pricing",
        lambda: spark.table(f"{project.target.schema}.fct_pricing_summary"),
        measures={
            "base_price": {"agg": "sum", "expr": "sum_base_price"},
            "orders": {"agg": "sum", "expr": "count_order"},
        },
        dimensions={"returnflag": "l_returnflag"},
    )
    sl.metric("revenue", model="pricing", measure="base_price")
    sl.metric(
        "aov", type="ratio", model="pricing",
        numerator="base_price", denominator="orders",
    )
    for row in sl.query(["revenue", "aov"], group_by=["returnflag"]).collect():
        print(f"metric {row['returnflag']}: revenue={row['revenue']:.2f} "
              f"aov={row['aov']:.2f}")
    for f in evaluate(project):
        print(f"lint: {f}")
    # physical-plan scale gate: planning-only, rejects cartesian/row-UDF/
    # single-partition shapes before anything would run at cluster scale
    for p in lint(project, scale=True):
        print(f"plan-lint: {p}")
    default_registry().run("list_orphaned_objects", project)
    # docs artifacts: manifest.json + catalog.json
    with tempfile.TemporaryDirectory() as td:
        arts = generate_docs(project, path=td)
        print(
            f"docs: {len(arts['manifest']['nodes'])} nodes, "
            f"{len(arts['catalog'])} cataloged relations"
        )


if __name__ == "__main__":
    main()
