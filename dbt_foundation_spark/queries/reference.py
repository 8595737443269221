"""Queries literally present in (or directly derived from) the reference.

Each docstring cites the reference file:line it re-expresses (paths are
into /root/reference). These run on the driver testdata tables; the
oracle strings are DuckDB SQL over the same parquet views.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_foundation_spark.queries import query
from dbt_foundation_spark.queries._util import (
    davg,
    dsum,
    register_views,
    sql_davg,
    sql_dsum,
    t,
)


@query(
    "q_literal_union",
    oracle="SELECT 1 AS id UNION ALL SELECT CAST(NULL AS INTEGER) AS id",
)
def q_literal_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: constant relation incl. NULL row.

    Reference: models/example/my_first_dbt_model.sql:12-18
    (``select 1 as id union all select null as id``).
    """
    return spark.sql("SELECT 1 AS id UNION ALL SELECT CAST(NULL AS INT) AS id")


@query(
    "q_ref_filter",
    oracle="""
    WITH my_first_dbt_model AS (
        SELECT 1 AS id UNION ALL SELECT CAST(NULL AS INTEGER) AS id
    )
    SELECT * FROM my_first_dbt_model WHERE id = 1
    """,
)
def q_ref_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A6/A8: ``select * from ref('my_first_dbt_model') where id = 1``.

    Reference: models/example/my_second_dbt_model.sql:4-6. Ephemeral
    composition — the upstream model is an unpersisted DataFrame that
    Catalyst inlines (dbt 'ephemeral' semantics are Spark's default).
    """
    first = spark.sql("SELECT 1 AS id UNION ALL SELECT CAST(NULL AS INT) AS id")
    return first.filter(F.col("id") == 1)


@query(
    "q_notnull_filter",
    oracle="""
    WITH my_first_dbt_model AS (
        SELECT 1 AS id UNION ALL SELECT CAST(NULL AS INTEGER) AS id
    )
    SELECT * FROM my_first_dbt_model WHERE id IS NOT NULL
    """,
)
def q_notnull_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: the canonical ``where id is not null`` exercise.

    Reference: models/example/my_first_dbt_model.sql:23-27 (shipped
    commented; README.md:116 uses IS NOT NULL in the perf query).
    """
    first = spark.sql("SELECT 1 AS id UNION ALL SELECT CAST(NULL AS INT) AS id")
    return first.filter(F.col("id").isNotNull())


@query(
    "q_source_scan",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def q_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: read a declared source table (raw.customers).

    Reference: models/sources.yml:4-8. Resolved through the engine's
    SourceRegistry (the sources.yml analog), not a hard-coded path.
    """
    from dbt_foundation_spark.sources import testdata_sources

    reg = testdata_sources(sf_dir, source_name="raw")
    return reg.load(spark, "raw", "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


@query(
    "q_star_except",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM orders
    """,
)
def q_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: star-from-relations with an ``except`` column list.

    Reference: macros/star_from_relations.sql:12,18-23 — expand ``*`` to
    explicit quoted columns minus an exclusion list (README.md:124-143).
    """
    orders = t(spark, sf_dir, "orders")
    keep = [c for c in orders.columns if c not in {"o_orderstatus", "o_orderpriority"}]
    # date as ISO string: engine-neutral (DATE collects as datetime.date in
    # Spark but datetime64 via DuckDB-pandas — strings hash identically).
    return orders.select(*keep).withColumn(
        "o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd")
    )


@query(
    "q_recent_events",
    oracle="""
    SELECT event_id, user_id, event_type, value, ts
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
    """,
)
def q_recent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11/A29/A30: DATEADD(DAY, -7, <anchor>) range predicate.

    Reference: README.md:117 (``start_time >= DATEADD(DAY,-7,CURRENT_DATE())``).
    Anchored to max(ts) instead of wall-clock so results are deterministic;
    the filter is a scalar subquery + range predicate Catalyst pushes to
    the parquet scan.
    """
    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_id, user_id, event_type, value, ts
        FROM events
        WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAYS
        """
    )


@query(
    "q_json_extract_agg",
    oracle=f"""
    SELECT event_type AS model,
           {sql_davg("value", "avg_value")},
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS runs
    FROM events
    WHERE props IS NOT NULL
    GROUP BY event_type
    ORDER BY avg_value DESC
    """,
)
def q_json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14/A17/A18/A21/A27/A28: the README query-tag analysis pattern.

    Reference: README.md:108-119 — LATERAL TRY_PARSE_JSON(query_tag),
    ``parsed:dbt_model::string`` path+cast, AVG + COUNT(*) + ORDER BY DESC.
    Here the JSON column is events.props; extraction is JVM-side
    get_json_object (no UDF).
    """
    events = t(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    parsed = events.withColumn(
        "k", F.get_json_object(F.col("props"), "$.k").cast("bigint")
    )
    return (
        parsed.groupBy(F.col("event_type").alias("model"))
        .agg(
            davg("value", "avg_value"),
            F.sum("k").alias("sum_k"),
            F.count(F.lit(1)).alias("runs"),
        )
        .orderBy(F.desc("avg_value"))
    )


@query(
    "q_group_by_all",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {sql_dsum("l_quantity", "sum_qty")}
    FROM lineitem
    GROUP BY ALL
    """,
)
def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19: GROUP BY ALL (group by every non-aggregate select item).

    Reference: README.md:118. Native in Spark ≥3.4.
    """
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,8))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ALL
        """
    )


@query(
    "q_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_base_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {sql_davg("l_quantity", "avg_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           {sql_davg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship mart query (TPC-H-Q1-style pricing summary).

    The reference's models are arbitrary SELECTs materialized on the
    warehouse (models/example/*.sql are placeholders); this is the
    representative 'real' model: filter → groupBy → 8 aggregates →
    order. Plan shape to verify: parquet scan with pushed shipdate
    filter + partial (map-side) HashAggregate → exchange → final
    HashAggregate, all whole-stage-codegen'd.
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_info_schema_views",
    oracle="""
    SELECT DISTINCT table_type AS object_type, table_name AS object_name
    FROM information_schema.tables
    WHERE table_name IN ('region','nation','customer','supplier','part','orders',
                         'lineitem','events','documents','embeddings')
      AND table_type = 'VIEW'
    ORDER BY object_name
    """,
)
def q_info_schema_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 with a real cross-engine oracle: register the testdata tables
    as views, then read them back from the information schema — both
    engines list the same 10 (VIEW, name) rows. Filtered to the known
    names so concurrent catalog churn (other queries' tables) can't
    leak in; schema column omitted (session-namespace names differ by
    engine, not by semantics).

    Reference: macros/list_orphaned_objects.sql:24-32.
    """
    from dbt_foundation_spark.queries._util import TABLES
    from dbt_foundation_spark.sources.registry import information_schema_tables

    register_views(spark, sf_dir)
    ist = information_schema_tables(spark)
    return (
        ist.filter(F.col("table_name").isin(list(TABLES)) & (F.col("table_type") == "VIEW"))
        .select(
            F.col("table_type").alias("object_type"),
            F.col("table_name").alias("object_name"),
        )
        .dropDuplicates()
        .orderBy("object_name")
    )


@query("q_catalog_tables")  # rows-only: spark.catalog has no DuckDB twin
def q_catalog_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A7/A10/A20/A24: information-schema scan with the macro's shape.

    Reference: macros/list_orphaned_objects.sql:24-32 — project
    (table_type stripped of 'BASE ', table_schema, table_name), filter
    out INFORMATION_SCHEMA / DATA_REFRESH_TIME, multi-key ORDER BY.
    """
    from dbt_foundation_spark.sources.registry import information_schema_tables

    register_views(spark, sf_dir, "orders", "customer")
    ist = information_schema_tables(spark)
    return (
        ist.select(
            F.replace(F.col("table_type"), F.lit("BASE "), F.lit("")).alias("object_type"),
            F.col("table_schema").alias("object_schema"),
            F.col("table_name").alias("object_name"),
        )
        .filter(
            (F.upper(F.col("object_schema")) != "INFORMATION_SCHEMA")
            & (F.upper(F.col("object_name")) != "DATA_REFRESH_TIME")
        )
        .orderBy("object_schema", "object_type", "object_name")
    )
