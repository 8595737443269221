"""dbt_utils-parity catalog queries (SURVEY §2.D C4-C6, §2.H C7-C13).

Each exercises a helper from dbt_foundation_spark.functions.utils with a
DuckDB oracle. Where the two engines' native functions have undefined
last-ulp behavior (width_bucket boundaries, transcendental rounding),
the query uses an explicitly-specified arithmetic form on BOTH sides and
the native function is covered by unit tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_foundation_spark.functions import utils as U
from dbt_foundation_spark.queries import query
from dbt_foundation_spark.queries._util import t


@query(
    "q_surrogate_key",
    oracle="""
    SELECT c_custkey,
           md5(concat_ws('-', CAST(c_custkey AS VARCHAR),
               COALESCE(CAST(c_name AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
               CAST(c_nationkey AS VARCHAR))) AS sk
    FROM customer
    """,
)
def q_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 dbt_utils.generate_surrogate_key: null-safe md5 of concat."""
    cust = t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        U.generate_surrogate_key("c_custkey", "c_name", "c_nationkey").alias("sk"),
    )


@query(
    "q_dedup_rownum",
    oracle="""
    SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS latest_date
    FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
    ) = 1
    """,
)
def q_dedup_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 dbt_utils.deduplicate: one row per key by order (latest order
    per customer; deterministic tiebreak on the key)."""
    orders = t(spark, sf_dir, "orders")
    deduped = U.deduplicate(
        orders,
        partition_by=["o_custkey"],
        order_by=[F.desc("o_orderdate"), F.desc("o_orderkey")],
    )
    return deduped.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_date"),
    )


@query(
    "q_date_spine",
    oracle="""
    SELECT strftime(CAST(d AS DATE), '%Y-%m-%d') AS date_day
    FROM (
        SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-12-31', INTERVAL 1 DAY)) AS d
    )
    WHERE CAST(d AS DATE) < DATE '1995-12-31'
    """,
)
def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 dbt_utils.date_spine: one row per day in [start, end)."""
    spine = U.date_spine(spark, "1995-01-01", "1995-12-31", "day")
    return spine.select(F.date_format("date_day", "yyyy-MM-dd").alias("date_day"))


@query(
    "q_generate_series",
    oracle="""
    SELECT CAST(unnest(generate_series(1, 1000)) AS BIGINT) AS generated_number
    """,
)
def q_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 dbt_utils.generate_series via spark.range (parallel source)."""
    return U.generate_series(spark, 1000)


@query(
    "q_safe_divide",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_custkey % 7 = 0 THEN NULL
                ELSE o_totalprice / (o_custkey % 7) END AS ratio
    FROM orders
    """,
)
def q_safe_divide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 dbt_utils.safe_divide → F.try_divide (NULL on zero)."""
    orders = t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        U.safe_divide(F.col("o_totalprice"), F.col("o_custkey") % 7).alias("ratio"),
    )


@query(
    "q_width_bucket",
    oracle="""
    SELECT bucket, COUNT(*) AS n FROM (
        SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                    WHEN o_totalprice >= 600000.0 THEN 21
                    ELSE CAST(FLOOR((o_totalprice - 0.0) * 20 / (600000.0 - 0.0)) AS BIGINT) + 1
               END AS bucket
        FROM orders
    ) GROUP BY bucket ORDER BY bucket
    """,
)
def q_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 dbt_utils.width_bucket: histogram bucketing.

    Uses the spec formula identically on both sides (native
    width_bucket's boundary arithmetic is engine-private; the native fn
    is unit-tested against this form in tests/test_functions.py).
    """
    orders = t(spark, sf_dir, "orders")
    v, lo, hi, n = F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), 20
    bucket = (
        F.when(v < lo, F.lit(0))
        .when(v >= hi, F.lit(n + 1))
        .otherwise(F.floor((v - lo) * n / (hi - lo)) + 1)
        .cast("bigint")
    )
    return (
        orders.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


@query(
    "q_haversine",
    oracle="""
    SELECT n_nationkey,
           round(2 * 6371.0 * asin(sqrt(
               sin(radians((-60.0 + n_nationkey * 4.7) - 0.0) / 2) * sin(radians((-60.0 + n_nationkey * 4.7) - 0.0) / 2)
               + cos(radians(0.0)) * cos(radians(-60.0 + n_nationkey * 4.7))
                 * sin(radians((-150.0 + n_nationkey * 11.3) - 0.0) / 2) * sin(radians((-150.0 + n_nationkey * 11.3) - 0.0) / 2)
           )), 4) AS dist_km
    FROM nation
    """,
)
def q_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11 dbt_utils.haversine_distance from synthetic per-nation coords
    to (0,0); rounded to 4 decimals (libm last-ulp tolerance)."""
    nation = t(spark, sf_dir, "nation")
    df = nation.select(
        "n_nationkey",
        (F.lit(-60.0) + F.col("n_nationkey") * 4.7).alias("lat"),
        (F.lit(-150.0) + F.col("n_nationkey") * 11.3).alias("lon"),
    )
    return df.select(
        "n_nationkey",
        F.round(
            U.haversine_distance(F.col("lat"), F.col("lon"), F.lit(0.0), F.lit(0.0)), 4
        ).alias("dist_km"),
    )


@query(
    "q_parse_url",
    oracle="""
    WITH urls AS (
        SELECT doc_id,
               'https://cdn.example.com/' || source || '/' || CAST(doc_id AS VARCHAR)
                   || '?lang=' || lang || '&v=2' AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^https://([^/]+)', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'lang=([^&]+)', 1) AS lang_param
    FROM urls
    """,
)
def q_parse_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12 dbt_utils.get_url_host/path/parameter → F.parse_url."""
    docs = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://cdn.example.com/"),
        F.col("source"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    with_url = docs.select("doc_id", url.alias("url"))
    return with_url.select(
        "doc_id",
        U.get_url_host("url").alias("host"),
        U.get_url_path("url").alias("path"),
        U.get_url_parameter("url", "lang").alias("lang_param"),
    )


@query(
    "q_slugify",
    oracle="""
    SELECT DISTINCT p_name,
           regexp_replace(regexp_replace(lower(p_name), '[^a-z0-9]+', '_', 'g'),
                          '^_+|_+$', '', 'g') AS slug
    FROM part
    """,
)
def q_slugify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13 dbt_utils.slugify (Jinja-side in dbt; column-side here)."""
    part = t(spark, sf_dir, "part")
    return part.select("p_name", U.slugify("p_name").alias("slug")).distinct()


@query(
    "q_pivot",
    oracle="""
    SELECT user_id % 10 AS cohort,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
    FROM events
    GROUP BY 1
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 dbt_utils.pivot with explicit value list (no distinct pre-scan)."""
    events = t(spark, sf_dir, "events").withColumn("cohort", F.col("user_id") % 10)
    return U.pivot(
        events,
        group_by=["cohort"],
        pivot_column="event_type",
        values=["click", "view", "purchase", "signup", "error"],
        agg_column=F.lit(1),
        agg="count",
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, 'p_retailprice' AS field_name, p_retailprice AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 dbt_utils.unpivot via native UNPIVOT (JVM stack, no shuffle)."""
    part = t(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("double").alias("p_size")
    )
    return U.unpivot(
        part,
        id_columns=["p_partkey"],
        value_columns=["p_retailprice", "p_size"],
        name_column="field_name",
        value_column="value",
    )


@query(
    "q_union_relations",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal,
           CAST(NULL AS BIGINT) AS s_suppkey, CAST(NULL AS VARCHAR) AS s_name,
           CAST(NULL AS INTEGER) AS s_nationkey, CAST(NULL AS DOUBLE) AS s_acctbal,
           'customer' AS _dbt_source_relation
    FROM customer
    UNION ALL
    SELECT CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER),
           CAST(NULL AS DOUBLE), s_suppkey, s_name, s_nationkey, s_acctbal, 'supplier'
    FROM supplier
    """,
)
def q_union_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A22/A23 dbt_utils.union_relations: union by name, NULL padding,
    provenance column (star_from_relations.sql:14, README.md:124-143)."""
    from dbt_foundation_spark.ops import union_relations

    cust = t(spark, sf_dir, "customer").drop("c_mktsegment")
    supp = t(spark, sf_dir, "supplier")
    return union_relations({"customer": cust, "supplier": supp})


@query(
    "q_crossdb_datemath",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus_3m,
           CAST(date_diff('day', o_orderdate, DATE '1995-06-17') AS BIGINT) AS day_diff,
           CAST(date_diff('month', o_orderdate, DATE '1995-06-17') AS BIGINT) AS mo_diff,
           CAST(date_diff('week', o_orderdate, DATE '1995-06-17') AS BIGINT) AS wk_diff,
           CAST(last_day(o_orderdate) AS VARCHAR) AS eom,
           split_part(o_orderpriority, '-', 1) AS prio_code,
           CAST(strpos(o_orderpriority, 'URGENT') AS BIGINT) AS pos_urgent
    FROM orders
    """,
)
def q_crossdb_datemath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt cross-database macro surface (dbt.dateadd/datediff/last_day/
    split_part/position) with Snowflake boundary-count datediff
    semantics — DuckDB's date_diff counts the same boundaries, making
    the whole family cross-engine checkable. Pure Column exprs, one
    projection, no shuffle."""
    from dbt_foundation_spark.functions import crossdb as C

    orders = t(spark, sf_dir, "orders")
    ref_date = F.lit("1995-06-17").cast("date")
    return orders.select(
        "o_orderkey",
        # cast to DATE first: dateadd is type-preserving now (r3), and a
        # TIMESTAMP input would correctly come back as a TIMESTAMP
        C.dateadd("month", 3, F.col("o_orderdate").cast("date"))
        .cast("string")
        .alias("plus_3m"),
        C.datediff("day", "o_orderdate", ref_date).alias("day_diff"),
        C.datediff("month", "o_orderdate", ref_date).alias("mo_diff"),
        C.datediff("week", "o_orderdate", ref_date).alias("wk_diff"),
        C.last_day("o_orderdate").cast("string").alias("eom"),
        C.split_part("o_orderpriority", "-", 1).alias("prio_code"),
        C.position("URGENT", "o_orderpriority").cast("bigint").alias("pos_urgent"),
    )


@query(
    "q_crossdb_listagg",
    oracle="""
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def q_crossdb_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt.listagg: ordered string aggregation (collect_list →
    array_sort → array_join; the sort happens on the already-grouped
    small lists, not via a global orderBy)."""
    from dbt_foundation_spark.functions import crossdb as C

    nation = t(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        C.listagg("n_name", ",", order_by="n_name").alias("nations")
    )


@query(
    "q_udtf_chunks",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tok
        FROM documents WHERE doc_id % 20 = 0
    )
    SELECT doc_id, i AS chunk_idx,
           array_to_string(tok[(i*5+1):(i*5+10)], ' ') AS chunk_text
    FROM toks, (SELECT unnest(range(0, 10000)) AS i)
    WHERE i*5 < len(tok)
    """,
)
def q_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDTF extension point, end-to-end: a Python UDTF registered
    under a SQL name, LATERAL-joined in a SQL-string query, matching the
    Column-based chunker's oracle. Subset (doc_id % 20) bounds the
    Python-worker cost — UDTFs are the explicit slow path and q_doc_chunks
    is the production (zero-shuffle, codegen) formulation."""
    from dbt_foundation_spark.functions.udtf import register_udtfs
    from dbt_foundation_spark.queries._util import register_views

    register_udtfs(spark)
    register_views(spark, sf_dir, "documents")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text
        FROM documents d, LATERAL text_chunks(d.text, 10, 5) c
        WHERE d.doc_id % 20 = 0
        """
    )
