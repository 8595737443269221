"""Source-schema drift contracts (r10 verdict #6, probed live).

A file-backed source's schema is whatever its parquet footers say, and
the three drift shapes get three DISTINCT behaviors (measured on this
Spark, pinned here):

* ADDED column — the default single-footer sample silently drops it
  (and the winning footer can flip with file listing order);
  ``merge_schema=True`` is the adaptive opt-in: union schema,
  NULL-fill for the files that lack it.
* MISSING declared column — ``expected_columns`` makes it loud AT THE
  SOURCE BOUNDARY instead of an unresolved reference (or a silent
  SELECT-* vanish) downstream.
* WIDENED type (int→bigint across generations) — loud by default
  (PARQUET_COLUMN_DATA_TYPE_MISMATCH mid-scan) AND under mergeSchema
  (CANNOT_MERGE_SCHEMAS); the adaptive path is an explicit
  ``read_schema`` declaration with the wide type (Spark 4 widens
  int32 files under a declared bigint schema).

And the seam the other way (source → incremental model): drift that
the source read never surfaces is INVISIBLE to on_schema_change — an
added source column reaches ``append_new_columns`` only when the
source reads with ``merge_schema=True``.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from dbt_foundation_spark.sources.registry import Source, SourceRegistry


def _write(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_missing_declared_column_is_loud(spark, tmp_path):
    path = str(tmp_path / "src_missing")
    _write(spark, path, [(1, "a")], "id int, v string")
    src = Source("raw", "t", path=path, expected_columns=("id", "v", "extra"))
    with pytest.raises(ValueError, match="schema drift"):
        src.load(spark)
    # the same declaration over a conforming source is a no-op
    ok = Source("raw", "t", path=path, expected_columns=("id", "v"))
    assert ok.load(spark).count() == 1


def test_added_column_adaptive_with_merge(spark, tmp_path):
    path = str(tmp_path / "src_added")
    _write(spark, path, [(1, "a")], "id int, v string")
    _write(spark, path, [(2, "b", "x")], "id int, v string, extra string")

    merged = Source("raw", "t", path=path, merge_schema=True).load(spark)
    assert set(merged.columns) == {"id", "v", "extra"}
    rows = {(r.id, r.v, r.extra) for r in merged.collect()}
    assert rows == {(1, "a", None), (2, "b", "x")}
    # merge + declaration composes: the union schema satisfies it
    declared = Source(
        "raw", "t", path=path, merge_schema=True,
        expected_columns=("id", "v", "extra"),
    )
    assert declared.load(spark).count() == 2
    # the default read is the documented hazard: one footer wins, so
    # `extra` may or may not resolve — all this test pins is that it
    # does NOT fail and reads both rows' common columns
    plain = Source("raw", "t", path=path).load(spark)
    assert {(r.id, r.v) for r in plain.select("id", "v").collect()} == {
        (1, "a"), (2, "b"),
    }


def test_widened_type_loud_default_adaptive_by_declaration(spark, tmp_path):
    path = str(tmp_path / "src_widen")
    _write(spark, path, [(1, "a")], "id int, v string")
    _write(spark, path, [(9_000_000_000, "z")], "id long, v string")

    # the default read is footer-order-dependent: an int-winning
    # sample fails loudly mid-scan on the long file; a long-winning
    # sample succeeds because Spark 4 widens int32 files under a
    # resolved bigint schema. Pin the safe envelope — loud OR
    # correctly widened, never silently corrupted values
    try:
        rows = {(r.id, r.v) for r in Source("raw", "t", path=path).load(spark).collect()}
        assert rows == {(1, "a"), (9_000_000_000, "z")}
    except Exception as e:
        assert "PARQUET_COLUMN_DATA_TYPE_MISMATCH" in str(e)
    # mergeSchema refuses the int/long union deterministically
    with pytest.raises(Exception, match="CANNOT_MERGE"):
        Source("raw", "t", path=path, merge_schema=True).load(spark).collect()
    wide = Source("raw", "t", path=path, read_schema="id bigint, v string")
    rows = {(r.id, r.v) for r in wide.load(spark).collect()}
    assert rows == {(1, "a"), (9_000_000_000, "z")}


def test_catalog_source_refuses_file_reader_knobs(spark, tmp_path):
    """merge_schema/read_schema are file-reader options; silently
    ignoring them on a catalog_table source would leave a user who
    declared read_schema for widening with no protection and no signal
    (r11 review) — the load raises instead. expected_columns IS
    honored for catalog sources."""
    spark.createDataFrame([(1, "a")], "id int, v string").createOrReplaceTempView(
        "drift_cat_src"
    )
    with pytest.raises(ValueError, match="catalog_table"):
        Source(
            "raw", "t", catalog_table="drift_cat_src",
            read_schema="id bigint, v string",
        ).load(spark)
    with pytest.raises(ValueError, match="catalog_table"):
        Source(
            "raw", "t", catalog_table="drift_cat_src", merge_schema=True
        ).load(spark)
    ok = Source(
        "raw", "t", catalog_table="drift_cat_src",
        expected_columns=("id", "v"),
    )
    assert ok.load(spark).count() == 1
    with pytest.raises(ValueError, match="schema drift"):
        Source(
            "raw", "t", catalog_table="drift_cat_src",
            expected_columns=("id", "gone"),
        ).load(spark)


def test_source_drift_through_incremental_model(spark, tmp_path):
    """The source→model direction of on_schema_change: an added source
    column is INVISIBLE to append_new_columns while the source read
    samples one footer; declaring merge_schema=True on the source is
    what propagates additive drift into the incremental evolution."""
    from dbt_foundation_spark.project import Project, Target

    path = str(tmp_path / "src_stream")
    _write(spark, path, [(1, "a")], "id int, v string")

    def registry(merge: bool) -> SourceRegistry:
        reg = SourceRegistry()
        reg.add(Source("raw", "stream", path=path, merge_schema=merge))
        return reg

    schema = f"t_{uuid.uuid4().hex[:8]}"
    target = Target(name="dev", schema=schema, threads=4)

    def build(merge: bool) -> Project:
        p = Project("drift_project", spark, sources=registry(merge), target=target)

        @p.model(
            name="inc_from_source",
            materialized="incremental",
            incremental_strategy="append",
            on_schema_change="append_new_columns",
        )
        def inc_from_source(ctx):
            return ctx.source("raw", "stream")

        return p

    try:
        p1 = build(merge=False)
        assert {r.node: r.status for r in p1.run()} == {"inc_from_source": "success"}
        rel = p1.relation_name(p1.manifest["inc_from_source"])
        assert set(spark.table(rel).columns) == {"id", "v"}

        # the source grows a column in newer files
        _write(spark, path, [(2, "b", "x")], "id int, v string, extra string")

        # run 2, source still sampling one footer: WHICH footer wins is
        # listing-order-dependent (the documented flapping hazard), so
        # schema evolution here is NONDETERMINISTIC — if the sample
        # lands on the old file, append_new_columns has nothing to see
        # and the target stays (id, v); if it lands on the new file the
        # column arrives early. The pin is that neither outcome fails
        # and the run stays green — determinism requires merge_schema,
        # which run 3 pins.
        p2 = build(merge=False)
        assert {r.node: r.status for r in p2.run()} == {"inc_from_source": "success"}
        assert {"id", "v"} <= set(spark.table(rel).columns) <= {"id", "v", "extra"}

        # run 3 with the adaptive source: the union schema reaches the
        # incremental batch and append_new_columns evolves the target
        p3 = build(merge=True)
        assert {r.node: r.status for r in p3.run()} == {"inc_from_source": "success"}
        evolved = spark.table(rel)
        assert set(evolved.columns) == {"id", "v", "extra"}
        rows = {(r.id, r.v, r.extra) for r in evolved.collect()}
        # pre-evolution appends read NULL in the new column; the
        # post-evolution batch carries it
        assert (2, "b", "x") in rows
        assert (1, "a", None) in rows
        assert {r[:2] for r in rows} == {(1, "a"), (2, "b")}
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
