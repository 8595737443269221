"""Pass-through relational surface (SURVEY §2.C/§2.D/§2.F/§2.G).

The reference's models are arbitrary SELECTs executed by the warehouse;
Spark SQL/Catalyst is that executor here. These queries pin down the
join suite, set ops, aggregation variants, top-k and the dbt-style test
queries, each with a DuckDB oracle.

Scale notes are inline: every join states its expected physical
strategy (broadcast vs shuffle) and every agg is map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_foundation_spark.queries import query
from dbt_foundation_spark.queries._util import davg, dsum, sql_davg, sql_dsum, t


@query(
    "q_join_inner",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           {sql_dsum("o_totalprice", "revenue")}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16: equi inner join (model-to-model composition, README.md:275).

    customer is the dimension side but GROWS with SF (150k × SF rows),
    so no forced broadcast hint: AQE + autoBroadcastJoinThreshold pick
    broadcast while the pruned 2-col dim fits (it does at bench scale)
    and degrade gracefully to a shuffle join at 100 TB instead of
    OOMing the executors. Hints stay reserved for provably bounded
    inputs (nation/region/scalar aggregates)."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "revenue"))
        .orderBy("c_mktsegment")
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having orders."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return cust.join(orders, "c_custkey", "left_semi").select("c_custkey")


@query(
    "q_fk_orphans",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
    """,
)
def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: relationships test — child keys with no parent (anti-join).

    Reference: models/example/schema.yml:10-12 family; dbt-core
    relationships test semantics. Empty result = FK integrity holds.
    The parent-key side grows with SF → no forced broadcast; AQE picks
    broadcast-anti while the 1-col key set fits, shuffle-anti beyond."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("o_custkey"))
    return orders.join(cust, "o_custkey", "left_anti").select(
        "o_orderkey", "o_custkey"
    )


@query(
    "q_join_range",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS n, {sql_dsum("l_extendedprice", "sum_price")}
    FROM lineitem JOIN part
      ON l_partkey = p_partkey
     AND l_quantity BETWEEN p_size - 5 AND p_size + 5
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: equi key + inequality band condition.

    The equi conjunct keeps this a hash join (band filters post-match) —
    the pattern that still scales when a pure range join would not.
    part grows with SF → strategy left to AQE (broadcast by size at
    bench scale, shuffle-hash/SMJ at 100 TB)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == part.p_partkey)
        & (li.l_quantity >= part.p_size - 5)
        & (li.l_quantity <= part.p_size + 5)
    )
    return (
        li.join(part, cond)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice", "sum_price"))
        .orderBy("p_brand")
    )


@query(
    "q_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style 3-way join + agg + top-k.

    Physical shape: customer (filtered, 1-col) joins orders with the
    strategy chosen by AQE — broadcast while the segment slice fits,
    shuffle beyond (customer grows with SF, so no forced hint); the
    orders->lineitem join shuffles on orderkey, aggregation is partial →
    final, top-k is TakeOrderedAndProject (no global sort)."""
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue, "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q_lateral_json",
    oracle="""
    SELECT e.event_id, j.k
    FROM events e, LATERAL (
        SELECT CAST(json_extract_string(e.props, '$.k') AS BIGINT) AS k
    ) j
    WHERE j.k > 90
    """,
)
def q_lateral_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: correlated LATERAL subquery computing a JSON projection.

    Reference: README.md:114-115 (JOIN LATERAL (SELECT TRY_PARSE_JSON
    ...)). Catalyst decorrelates this into a plain projection — zero
    join cost — which is exactly why the reference pattern is safe to
    reproduce verbatim."""
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT e.event_id, j.k
        FROM events e, LATERAL (
            SELECT CAST(get_json_object(e.props, '$.k') AS BIGINT) AS k
        ) j
        WHERE j.k > 90
        """
    )


@query(
    "q_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers who never ordered."""
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders").select("o_custkey")
    return cust.exceptAll(orders.distinct()).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations with both customers and suppliers."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q_agg_rollup",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region,
           COALESCE(n_name, 'ALL') AS nation,
           COUNT(*) AS n
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region, nation
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total)."""
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    joined = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n",
        )
        .orderBy("region", "nation")
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT COALESCE(l_returnflag, '_') AS rf, COALESCE(l_linestatus, '_') AS ls,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY rf, ls
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("_")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("_")).alias("ls"),
            "n",
        )
        .orderBy("rf", "ls")
    )


@query(
    "q_grouping_sets",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, '_') AS status,
           COALESCE(o_orderpriority, '_') AS priority,
           COUNT(*) AS n, {sql_dsum("o_totalprice", "total")}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY status, priority
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL surface, same text both engines)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, '_') AS status,
               COALESCE(o_orderpriority, '_') AS priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority
        """
    )


@query(
    "q_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (hash aggregate, map-side combinable)."""
    return t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject — per-partition heaps +
    driver merge, never a global sort."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


@query(
    "q_approx_distinct",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS approx_within_5pct
    FROM lineitem
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++, rsd=0.02) validated INSIDE the
    query: the raw sketch estimate is engine-specific (Spark's HLL++ is
    not bit-equal to DuckDB's), so the driver-comparable output is the
    exact count plus a boolean asserting the estimate landed within 5 %
    (2.5 sigma at rsd 0.02). Deterministic for a fixed dataset — Spark's
    HLL++ hash and merge are order-insensitive — which turns the former
    rows-only check into a full hash-compared oracle row (VERDICT r4
    ask #3)."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", 0.02).alias("_approx"),
    ).select(
        "exact_parts",
        (
            F.abs(F.col("_approx").cast("double") - F.col("exact_parts"))
            <= 0.05 * F.col("exact_parts")
        ).alias("approx_within_5pct"),
    )


# ---------- dbt-style test queries (empty result = pass) ----------


@query(
    "q_test_unique",
    oracle="""
    SELECT o_orderkey, COUNT(*) AS n FROM orders
    GROUP BY o_orderkey HAVING COUNT(*) > 1
    """,
)
def q_test_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: unique test (group-count-having). Empty = key is unique.

    Reference: models/example/schema.yml:11,20."""
    from dbt_foundation_spark.testing import unique

    violations = unique("o_orderkey")(t(spark, sf_dir, "orders"))
    return violations.select("o_orderkey", F.col("count").alias("n"))


@query(
    "q_test_notnull",
    oracle="SELECT doc_id FROM documents WHERE text IS NULL",
)
def q_test_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: not_null test. Reference: models/example/schema.yml:12,21."""
    from dbt_foundation_spark.testing import not_null

    return not_null("text")(t(spark, sf_dir, "documents")).select("doc_id")


@query(
    "q_test_accepted_values",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders
    WHERE o_orderstatus NOT IN ('O', 'F', 'P') OR o_orderstatus IS NULL
    """,
)
def q_test_accepted_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt accepted_values test as a violations query."""
    from dbt_foundation_spark.testing import accepted_values

    v = accepted_values("o_orderstatus", ["O", "F", "P"])(t(spark, sf_dir, "orders"))
    return v.select("o_orderkey", "o_orderstatus")


@query(
    "q_test_equal_rowcount",
    oracle="""
    SELECT a.n_a, b.n_b
    FROM (SELECT COUNT(*) AS n_a FROM orders) a,
         (SELECT COUNT(*) AS n_b FROM lineitem) b
    WHERE a.n_a != b.n_b
    """,
)
def q_test_equal_rowcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 dbt_utils.equal_rowcount (violation row carries both counts)."""
    from dbt_foundation_spark.testing import equal_rowcount

    return equal_rowcount(t(spark, sf_dir, "lineitem"))(t(spark, sf_dir, "orders"))


@query(
    "q_test_equality",
    oracle="""
    SELECT p_partkey, p_brand FROM part
    EXCEPT ALL
    SELECT p_partkey, p_brand FROM part
    """,
)
def q_test_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 dbt_utils.equality: symmetric multiset difference (empty = equal)."""
    from dbt_foundation_spark.testing import equality

    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return equality(part)(part)


@query(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.50) AS p50,
           quantile_cont(l_quantity, 0.90) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont` semantics). The approximate path for 100 TB
    is `approx_percentile` (t-digest) — same call shape, bounded
    memory; exact is kept here because the oracle can check it."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.50)").alias("p50"),
        F.expr("percentile(l_quantity, 0.90)").alias("p90"),
    )


@query(
    "q_list_agg",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list(n_name ORDER BY n_name), ',') AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def q_list_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation (sort_array ∘ collect_list — the
    deterministic form; bare collect_list order is partition-dependent
    and must never be exposed)."""
    n = t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@query(
    "q_join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, CAST(o.n_orders AS BIGINT) AS n_orders
    FROM customer c
    FULL OUTER JOIN (
        SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer equi-join (customers x per-customer order counts) —
    completes the join family (inner/semi/anti/range elsewhere).
    Pre-aggregating the fact side before the join keeps the outer join
    row-bounded by the dimension at any scale."""
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    counts = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return cust.join(
        counts, cust.c_custkey == counts.o_custkey, "full_outer"
    ).select("c_custkey", "c_name", "n_orders")


@query(
    "q_conditional_agg",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_large,
           {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END", "open_value")}
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: count_if (Spark 4 native) + guarded sum
    — the FILTER-clause family, one pass over the fact table."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.count_if(F.col("o_totalprice") > 100000).alias("n_large"),
        dsum(
            F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")).otherwise(0.0),
            "open_value",
        ),
    )


@query(
    "q_promo_revenue",
    oracle=f"""
    WITH j AS (
        SELECT p_type, l_extendedprice * (1 - l_discount) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    )
    SELECT {sql_dsum("CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END", "promo_revenue")},
           {sql_dsum("rev", "total_revenue")},
           round(100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END AS DECIMAL(18,8))) AS DOUBLE)
                 / CAST(SUM(CAST(rev AS DECIMAL(18,8))) AS DOUBLE), 6) AS promo_pct
    FROM j
    """,
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-style promotion share: lineitem⋈part (strategy by AQE —
    part grows with SF, so no forced broadcast), one conditional/total
    decimal-sum pair, scalar ratio. The fact scan carries the shipdate
    pushdown; no shuffle besides the final 1-group aggregate while the
    pruned part dim broadcasts by size."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    j = li.join(part, li.l_partkey == part.p_partkey)
    return j.agg(
        dsum(promo, "promo_revenue"),
        dsum(rev, "total_revenue"),
        F.round(
            100.0
            * F.sum(promo.cast("decimal(18,8)")).cast("double")
            / F.sum(rev.cast("decimal(18,8)")).cast("double"),
            6,
        ).alias("promo_pct"),
    )


@query(
    "q_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey,
               {sql_dsum("l_extendedprice * (1 - l_discount)", "total_revenue")}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-style top supplier: per-supplier revenue, keep the
    max-revenue supplier(s). The max is one scalar broadcast back over
    the (small) per-supplier aggregate — never a global sort; that hint
    is kept because a 1-row aggregate is bounded by construction. The
    supplier dim grows with SF, so its join strategy is left to AQE.
    Decimal-routed sums make the double-equality against the max
    engine-stable."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx._mx)
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-style shipping volume between nation pairs by year.
    Physical shape: lineitem⋈orders shuffles on orderkey (the only big
    shuffle); nation² keeps forced broadcasts (25 rows, bounded by the
    data model); customer/supplier grow with SF so their strategy is
    AQE's call — broadcast by size at bench scale, shuffle at 100 TB.
    The group-by is low-cardinality (nations² × years) → map-side
    partials collapse almost everything before the final exchange."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1._sn_key)
        .join(F.broadcast(n2), cust.c_nationkey == n2._cn_key)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_salted_join",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           {sql_dsum("value", "sum_value")}
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-toolkit join as a catalog query: the (hot-keyed) events fact
    salted-joins the customer side (operators/skew.salted_join — skewed
    side salted deterministically, other side replicated across salts),
    then aggregates per segment. Salting is a pure rewrite, so the
    oracle is the PLAIN join — results must be identical; what changes
    is only that a hot user's rows spread over 8 reducers instead of
    one."""
    from dbt_foundation_spark.operators.skew import salted_join

    ev = t(spark, sf_dir, "events").select("user_id", "value")
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, on=["user_id"], salt=8)
    return (
        joined.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .orderBy("c_mktsegment")
    )


@query(
    "q_two_phase_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_two_phase_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant exact COUNT(DISTINCT): dedup on (key, value)
    first — a hot key's values hash across reducers — then count the
    small distinct set per key (operators/skew.two_phase_distinct).
    Oracle is the plain COUNT(DISTINCT): identical result, different
    (single-reducer-free) physical shape."""
    from dbt_foundation_spark.operators.skew import two_phase_distinct

    ev = t(spark, sf_dir, "events")
    return two_phase_distinct(ev, ["event_type"], "user_id", alias="n_users").orderBy(
        "event_type"
    )


@query(
    "q_returned_customers",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-style returned-item ranking: which customers returned
    the most revenue. Physical shape: the returnflag filter is pushed
    into the lineitem scan (the fact shrinks ~25% before any join),
    lineitem⋈orders shuffles on orderkey, customer's strategy is AQE's
    call (grows with SF), nation broadcasts (bounded 25 rows). Top-20 is
    TakeOrderedAndProject over the per-customer aggregate — no global
    sort. Decimal-routed revenue makes the DESC ranking engine-stable;
    c_custkey tiebreaks."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_priority_shipments",
    oracle="""
    SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY ship_year
    ORDER BY ship_year
    """,
)
def q_priority_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-style priority accounting (adapted to the testdata
    schema: ship-year stands in for shipmode): one fact⋈fact equi-join
    on orderkey — the canonical shuffle join both sides of which exceed
    any broadcast threshold at scale, exactly where AQE's skew split
    earns its keep — then a two-way conditional count with map-side
    partials collapsing to one row per year."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.sum(high.cast("bigint")).alias("high_line_count"),
            F.sum((~high).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


@query(
    "q_brand_revenue",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 35)
    """,
)
def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-style disjunctive-predicate revenue: an OR-of-ANDs
    spanning both join sides. The single-side conjuncts are derivable:
    Catalyst pushes p_brand IN (...) to the part scan and the overall
    quantity envelope (1..35) to the lineitem scan, so both inputs
    shrink BEFORE the join even though the full predicate can only be
    evaluated after it — the optimizer behavior this query exists to
    pin. Part's join strategy is AQE's (grows with SF)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    qty = F.col("l_quantity")
    pred = (
        ((F.col("p_brand") == "Brand#12") & qty.between(1, 15))
        | ((F.col("p_brand") == "Brand#23") & qty.between(10, 25))
        | ((F.col("p_brand") == "Brand#34") & qty.between(20, 35))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@query(
    "q_big_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey, {sql_dsum("l_quantity", "total_qty")}
        FROM lineitem GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,8))) AS DOUBLE) > 140
    )
    SELECT c_custkey, c_name, o_orderkey, total_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 25
    """,
)
def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-style large-volume orders: aggregate-then-join — the
    per-order quantity rollup (keyed shuffle with map-side partials)
    happens BEFORE touching orders/customer, so the join inputs are the
    few qualifying orders, not the fact table. The decimal HAVING
    threshold and ranking are engine-stable; orderkey tiebreaks. At
    100 TB the rollup output is a vanishing fraction of lineitem, so
    both downstream joins broadcast by size under AQE — unhinted."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > 140)
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "total_qty")
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(25)
    )


# ---------- subquery-shape marts (EXISTS / correlated / scalar) ----------


@query(
    "q_exists_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style priority check: orders in a quarter having at
    least one deep-discount line. The EXISTS is a LEFT SEMI join —
    Spark's physical form of a decorrelated EXISTS — so each order
    emits at most once no matter how many lines qualify (a plain inner
    join would need a post-join dedup). The quarter predicate pushes to
    the orders scan and the discount predicate to the lineitem scan;
    both inputs shrink before the orderkey shuffle. At 100 TB the semi
    join carries only l_orderkey on the probe side — the narrowest
    possible shuffle of the fact table."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    disc = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount") > 0.05)
        .select("l_orderkey")
    )
    return (
        orders.join(disc, orders.o_orderkey == disc.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_local_volume",
    oracle=f"""
    SELECT n_name, {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= '1997-01-01' AND o_orderdate < '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style local-supplier volume: revenue from orders where
    the customer and the line's supplier share a nation, by nation
    within one region. Six-way join: the region→nation chain is a
    bounded broadcast (25/5 rows) that prunes suppliers BEFORE the
    fact joins; lineitem⋈orders⋈customer shuffle on their keys with
    the year predicate pushed into the orders scan. The
    c_nationkey = s_nationkey clause is a second equi-conjunct on the
    supplier join, not a filter afterward — Catalyst keeps it in the
    join condition so no cross-nation pairs ever materialize."""
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supp = t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q_market_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                         THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,8))
                         ELSE CAST(0 AS DECIMAL(18,8)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,8))) AS DOUBLE)
           AS mkt_share
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = cn.n_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE r_name = 'EUROPE'
    GROUP BY order_year
    ORDER BY order_year
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-style market share: the fraction of a region's revenue
    supplied by one nation, per year — a conditional aggregate over a
    seven-way join with nation joined TWICE under different roles
    (customer side restricts to the region, supplier side tags the
    numerator). Both nation broadcasts are bounded dims; the share is
    an exact-decimal numerator and denominator in ONE aggregate pass
    (no self-join of per-year totals), divided as doubles at the end."""
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cnation = (
        t(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    snation = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,8)")
    national = F.when(F.col("sn_name") == "NATION_3", rev).otherwise(
        F.lit(0).cast("decimal(18,8)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cnation), cust.c_nationkey == F.col("cn_key"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(snation), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            (F.sum(national).cast("double") / F.sum(rev).cast("double")).alias(
                "mkt_share"
            )
        )
        .orderBy("order_year")
    )


@query(
    "q_nation_profit",
    oracle=f"""
    SELECT n_name,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           {sql_dsum("l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.01", "profit")}
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, order_year
    ORDER BY n_name, order_year DESC
    """,
)
def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-style product profit by supplier nation and year, for
    parts matching a name pattern (retailprice-derived carrying cost
    stands in for ps_supplycost — the testdata has no partsupp). The
    LIKE prunes part BEFORE its join (contains-pushdown reaches the
    scan as a StringContains filter); part and nation broadcast as
    bounded-growth dims under AQE, lineitem⋈orders shuffles on
    orderkey. The per-row profit expression is evaluated in double
    with the same association order as the oracle, then decimal-summed
    exactly."""
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey", "p_retailprice")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.01)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(dsum(profit, "profit"))
        .orderBy("n_name", F.desc("order_year"))
    )


@query(
    "q_customer_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-style customer order-count distribution — the
    canonical two-level aggregate with a LEFT join whose SECONDARY
    predicate lives in the join condition, not a WHERE (filtering
    afterward would drop zero-order customers; COUNT(o_orderkey)
    counts non-NULLs so they come out as c_count = 0). First agg keys
    on c_custkey (the join's own shuffle key — no extra exchange),
    second on the tiny c_count domain. Customer-side skew is the
    classic AQE skew-split case at scale."""
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q_small_qty_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,8))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#12'
      AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-style small-quantity revenue: lines of one brand whose
    quantity is below half the part's corpus-wide average. Runs through
    spark.sql with a GENUINE correlated scalar subquery so Catalyst's
    decorrelation (RewriteCorrelatedScalarSubquery → per-partkey
    aggregate + join) is exercised, not hand-replicated. AVG(l_quantity)
    is order-insensitive here because quantities are integral doubles
    (exact partial sums); the revenue total is decimal-routed. At scale
    the decorrelated aggregate keys on l_partkey — the same shuffle key
    as the main join, which AQE coalesces into adjacent stages."""
    from dbt_foundation_spark.queries._util import register_views

    register_views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,8))) AS DOUBLE) / 7.0
               AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#12'
          AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        """
    )


@query(
    "q_waiting_suppliers",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT l1.l_suppkey AS suppkey, l1.l_orderkey AS orderkey
        FROM lineitem l1 JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM pairs JOIN supplier ON s_suppkey = suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-style suppliers-who-kept-orders-waiting: in
    multi-supplier orders, the supplier who was the ONLY one to ship
    late (>90 days after the order date). The oracle states it with
    EXISTS / NOT EXISTS; the Spark plan reformulates both quantifiers
    as ONE per-order aggregate — n_suppliers >= 2 and n_late_suppliers
    == 1 — because a distinct-count per key subsumes 'exists another'
    and 'not exists another late' at a single shuffle, where the
    literal translation would be two more self-joins of the fact
    table. Late (supplier, order) pairs then join back to the
    qualifying orders; top-20 is TakeOrderedAndProject."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    # ONE pass over the fact join (guide §2.4): the previous shape
    # consumed `lo` twice — the per-order quantifier aggregate AND a
    # second distinct over the late (supplier, order) pairs, i.e. the
    # lineitem⋈orders join executed and shuffled twice. Instead,
    # aggregate once per (order, supplier) — is_late = max(late) —
    # then fold per order; both are plain codegen hash aggregates with
    # map-side combine (a collect_set/countDistinct variant was tried
    # first and measured 3× WORSE: mixing a distinct aggregate with an
    # object aggregate forces the Expand + sort-based path). A
    # qualifying order has EXACTLY ONE late supplier (n_late == 1), so
    # max(when(is_late, suppkey)) IS that supplier and the late-pair
    # re-join disappears. Same rows, half the fact-side work.
    per_pair = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(late.cast("int")).alias("_is_late")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("_is_late").alias("n_late"),
        F.max(
            F.when(F.col("_is_late") == 1, F.col("l_suppkey"))
        ).alias("l_suppkey"),
    )
    sole_late = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
    ).select("l_suppkey", "l_orderkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(supp, sole_late.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q_idle_customers",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           {sql_dsum("c_acctbal", "total_acctbal")}
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,8))) AS DOUBLE)
                              / COUNT(c_acctbal)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= '2000-01-01')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style idle high-balance customers: above-average
    account balance, no recent orders, grouped by segment. Two
    subquery shapes in one mart: the global-average threshold is a
    1-row aggregate broadcast into a cross join (bounded by
    construction — the correct broadcast use), and NOT EXISTS is a
    LEFT ANTI join against the date-pruned orders scan (the predicate
    pushes down, so the anti join probes only recent orders). The
    average is decimal-routed on both engines so the > comparison sees
    bit-identical thresholds."""
    cust = t(spark, sf_dir, "customer")
    thr = cust.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal", "avg_bal")
    )
    recent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_important_nations",
    oracle="""
    WITH nrev AS (
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,8)))
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        GROUP BY n_name
    )
    SELECT n_name, revenue
    FROM nrev
    WHERE revenue > (SELECT 0.04 * CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                                 AS DECIMAL(18,8))) AS DOUBLE)
                     FROM lineitem JOIN supplier ON s_suppkey = l_suppkey)
    ORDER BY revenue DESC, n_name
    """,
)
def q_important_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-style important-stock cut: supplier nations whose
    revenue exceeds a FRACTION OF THE GLOBAL TOTAL — the
    scalar-subquery-in-HAVING shape. The per-nation aggregate is
    computed once and reused for both the rows and the threshold
    (Spark reuses the exchange); the global total is a 1-row broadcast
    into the filter, computed as ONE exact decimal sum over the joined
    fact — summing the ~25 per-nation doubles instead would be
    order-dependent in the last ulp and could flip a boundary nation
    between engines. The 0.04 multiplier is exact against the same
    double on both sides."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # NOTE (r13): a single-pass variant that derived the global total
    # by summing the per-nation decimals was tried (exact decimal
    # arithmetic, measured flat locally) and REVERTED on review: the
    # oracle's total is over lineitem⋈supplier WITHOUT the nation
    # join, so a supplier with a NULL/dangling s_nationkey (dirty FK —
    # certain at 100 TB per the README contract) would be counted by
    # the oracle's threshold but silently dropped from the derived
    # one, flipping boundary nations. The two-pass form keeps the
    # threshold's domain identical to the oracle's on EVERY input;
    # Spark reuses the li⋈supp exchanges between the two passes.
    nrev = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    total = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "t"))
        .select((F.lit(0.04) * F.col("t")).alias("threshold"))
    )
    return (
        nrev.crossJoin(F.broadcast(total))
        .filter(F.col("revenue") > F.col("threshold"))
        .select("n_name", "revenue")
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT l_partkey AS partkey, l_suppkey AS suppkey,
           unit_cost AS best_cost
    FROM cost c
    WHERE unit_cost = (SELECT MIN(unit_cost) FROM cost c2
                       WHERE c2.l_partkey = c.l_partkey)
    ORDER BY partkey, suppkey
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-style cheapest supplier per part (unit cost derived
    from lineitem — no partsupp in the testdata). The oracle keeps
    Q2's correlated-MIN formulation; the Spark plan is the argmin-
    via-window rewrite (min over a partkey partition, keep equal rows)
    — ONE shuffle on the partition key versus the decorrelated
    aggregate-plus-self-join, and the idiomatic Spark shape for
    per-group argmin. Ties keep all tied suppliers on both engines.
    Unit cost is a single per-row division (no summation), so
    cross-engine doubles are bit-identical and compared RAW: a
    round(6) here looked repr-cosmetic but landed on a half-boundary
    at sf0.1 (133.7415625 — Spark's BigDecimal HALF_UP vs DuckDB's
    multiply-and-round disagree on the 6th digit; the r7 sf0.1
    sweep caught it)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey")
    return (
        cost.withColumn("_best", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("_best"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            F.col("unit_cost").alias("best_cost"),
        )
        .orderBy("partkey", "suppkey")
    )


@query(
    "q_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * l_discount", "revenue_delta")}
    FROM lineitem
    WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-style what-if revenue delta: a pure scan-and-aggregate
    whose THREE conjuncts must all reach the parquet scan (year range,
    discount band, quantity cap — PLANS.md pins the PushedFilters).
    The minimal single-stage shape: no join, no window, one partial+
    final aggregate; at 100 TB this is purely scan-bandwidth-bound,
    the query that measures the engine's floor."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.03, 0.05))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue_delta"))
    )


@query(
    "q_supplier_variety",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = l_partkey
    WHERE p_brand NOT IN ('Brand#11', 'Brand#22')
      AND p_size IN (5, 10, 15, 20)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-style supplier variety: distinct suppliers per
    (brand, type, size) for an attribute slice, excluding a brand
    denylist (NOT IN — Catalyst turns it into scan-pushable
    Not(In(...)) conjuncts). The (part, supplier) relation is derived
    by a DISTINCT over lineitem — at scale that pre-dedup shrinks the
    fact to partsupp cardinality BEFORE the join, and the distinct
    count re-shuffles only the surviving slice. Ordering matches Q16's
    (count desc, then keys)."""
    ps = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = t(spark, sf_dir, "part").filter(
        ~F.col("p_brand").isin("Brand#11", "Brand#22")
        & F.col("p_size").isin(5, 10, 15, 20)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        ps.join(part, ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q_excess_shippers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%red%'
          AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        GROUP BY l_suppkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,8))) AS DOUBLE) > 400
    )
    ORDER BY s_suppkey
    """,
)
def q_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-style heavy shippers of a part family: suppliers whose
    1997 shipped quantity of 'red' parts exceeded a threshold — the
    IN-over-grouped-subquery shape. Spark form: aggregate the pruned
    fact slice (LIKE + year both pushed), HAVING-filter it, LEFT SEMI
    join supplier against the surviving keys — the subquery side
    shrinks to qualifying suppliers before touching the outer table,
    and at 100 TB the semi join probe is a broadcast of those few
    keys. Decimal-routed HAVING sum on both engines."""
    part = t(spark, sf_dir, "part").filter(F.col("p_name").contains("red")).select(
        "p_partkey"
    )
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    heavy = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity", "qty"))
        .filter(F.col("qty") > 400)
        .select("l_suppkey")
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .orderBy("s_suppkey")
    )
