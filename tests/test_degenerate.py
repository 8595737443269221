"""Degenerate-input hardening: every major operator must survive an
EMPTY corpus and a SINGLE-row corpus without crashing and return sane
(usually empty) results. At 100 TB these shapes show up constantly —
an empty partition after a filter, a source table mid-backfill, a
block with one member — and an operator that throws on them kills the
whole job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id bigint, text string, lang string"
    )


@pytest.fixture(scope="module")
def one_doc(spark):
    return spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", "en")],
        "doc_id bigint, text string, lang string",
    )


@pytest.fixture(scope="module")
def empty_vecs(spark):
    return spark.createDataFrame([], "vec_id bigint, embedding array<float>")


@pytest.fixture(scope="module")
def one_vec(spark):
    return spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id bigint, embedding array<float>"
    )


def test_dedup_family_degenerate(spark, empty_docs, one_doc):
    from dbt_foundation_spark.operators.dedup import (
        connected_components,
        containment_pairs,
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_near_pairs,
    )

    for df in (empty_docs, one_doc):
        assert exact_dedup(df, ["text"], keep_order=["doc_id"]).count() <= 1
        assert minhash_lsh_pairs(
            df, "doc_id", "text", num_hashes=16, bands=4,
            shingle_len=3, jaccard_threshold=0.5,
        ).count() == 0
        assert simhash_near_pairs(df, "doc_id", "text", max_hamming=2).count() == 0
        assert ngram_jaccard_pairs(
            df, "doc_id", "text", block_cols=["lang"], threshold=0.5
        ).count() == 0
        assert containment_pairs(df, "doc_id", "text").count() == 0
    empty_pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert connected_components(empty_pairs, "id_a", "id_b").count() == 0


def test_persisted_indexes_degenerate(spark, empty_docs, one_doc, tmp_path):
    """Every persisted-index flavor must build from an EMPTY corpus and
    answer batch-vs-index queries against it (the day-0 bootstrap shape:
    the first ingest dedups against an empty index, then appends)."""
    from dbt_foundation_spark.operators.dedup_index import (
        append_to_containment_index,
        append_to_index,
        append_to_simhash_index,
        build_containment_index,
        build_minhash_index,
        build_simhash_index,
        containment_against_index,
        dedup_against_index,
        dedup_against_simhash_index,
    )

    mh = str(tmp_path / "mh0")
    build_minhash_index(empty_docs, "doc_id", "text", mh, num_hashes=16, bands=4)
    assert dedup_against_index(
        spark, one_doc, "doc_id", "text", mh, num_hashes=16, bands=4
    ).count() == 0
    append_to_index(one_doc, "doc_id", "text", mh, num_hashes=16, bands=4)
    assert dedup_against_index(
        spark, one_doc, "doc_id", "text", mh, num_hashes=16, bands=4,
        jaccard_threshold=0.5,
    ).count() == 1  # the appended doc is its own near-dup

    sh = str(tmp_path / "sh0")
    build_simhash_index(empty_docs, "doc_id", "text", sh, max_hamming=2)
    assert dedup_against_simhash_index(
        spark, one_doc, "doc_id", "text", sh, max_hamming=2
    ).count() == 0
    append_to_simhash_index(one_doc, "doc_id", "text", sh, max_hamming=2)
    assert dedup_against_simhash_index(
        spark, one_doc, "doc_id", "text", sh, max_hamming=2
    ).count() == 1

    ct = str(tmp_path / "ct0")
    build_containment_index(empty_docs, "doc_id", "text", ct, threshold=0.5)
    assert containment_against_index(
        spark, one_doc, "doc_id", "text", ct, threshold=0.5
    ).count() == 0
    append_to_containment_index(one_doc, "doc_id", "text", ct, threshold=0.5)
    assert containment_against_index(
        spark, one_doc, "doc_id", "text", ct, threshold=0.5
    ).count() == 1


def test_persisted_embedding_index_degenerate(spark, empty_vecs, one_vec, tmp_path):
    """Embedding index day-0: an empty corpus cannot be dim-sniffed —
    build demands an explicit dim with a named error — and after the
    bootstrap the usual empty→append→self-hit cycle holds."""
    from dbt_foundation_spark.operators.dedup_index import (
        append_to_embedding_index,
        build_embedding_index,
        dedup_against_embedding_index,
    )

    em = str(tmp_path / "em0")
    with pytest.raises(ValueError, match="dim"):
        build_embedding_index(empty_vecs, "vec_id", "embedding", em)
    build_embedding_index(empty_vecs, "vec_id", "embedding", em, dim=4, threshold=0.5)
    assert dedup_against_embedding_index(
        spark, one_vec, "vec_id", "embedding", em, threshold=0.5
    ).count() == 0
    append_to_embedding_index(one_vec, "vec_id", "embedding", em)
    assert dedup_against_embedding_index(
        spark, one_vec, "vec_id", "embedding", em, threshold=0.5
    ).count() == 1  # the appended vector is its own near-dup


def test_similarity_family_degenerate(spark, empty_vecs, one_vec):
    from dbt_foundation_spark.operators.similarity import (
        cosine_topk,
        embedding_near_pairs,
        knn_join,
    )

    q = [1.0, 0.0, 0.0, 0.0]
    assert cosine_topk(empty_vecs, "vec_id", "embedding", q, k=5).count() == 0
    assert cosine_topk(one_vec, "vec_id", "embedding", q, k=5).count() == 1
    assert embedding_near_pairs(
        empty_vecs, "vec_id", "embedding", threshold=0.5, dim=4
    ).count() == 0
    assert embedding_near_pairs(
        one_vec, "vec_id", "embedding", threshold=0.5, dim=4
    ).count() == 0
    # knn over a 1-row corpus with self-exclusion yields nothing
    assert knn_join(
        one_vec, one_vec, "vec_id", "vec_id", "embedding", "embedding", k=3
    ).count() == 0


def test_curation_ops_degenerate(spark, empty_docs, one_doc):
    from dbt_foundation_spark.functions.redact import redact_pii
    from dbt_foundation_spark.functions.text import (
        dup_ngram_ratio,
        lang_id,
        quality_score,
        token_count,
    )
    from dbt_foundation_spark.operators.packing import (
        pack_sequences,
        serpentine_shards,
    )
    from dbt_foundation_spark.operators.sampling import (
        hash_sample,
        train_test_split,
    )

    for df in (empty_docs, one_doc):
        n = df.count()
        scored = df.select(
            "doc_id",
            quality_score("text").alias("q"),
            lang_id("text").alias("l"),
            dup_ngram_ratio("text", 2).alias("d"),
            redact_pii("text").alias("clean"),
            token_count("text").alias("toks"),
        )
        assert scored.count() == n
        assert hash_sample(df, "doc_id", 0.5).count() <= n
        tr, te = train_test_split(df, "doc_id", test_fraction=0.2)
        assert tr.count() + te.count() == n
        sized = df.select("doc_id", token_count("text").alias("toks"))
        shards = serpentine_shards(
            sized, id_col="doc_id", cost_col="toks", n_shards=4
        )
        assert shards.count() == n
        packed = pack_sequences(
            sized, tokens_col="toks", budget=16, order_cols=["doc_id"],
            bucket_by=("doc_id", 4),
        )
        assert packed.count() == n


def test_empty_events_through_windows_and_metrics(spark):
    from dbt_foundation_spark.metrics import SemanticLayer

    ev = spark.createDataFrame(
        [], "event_id bigint, ts timestamp, user_id bigint, value double"
    )
    # windowed agg over empty input: zero rows, no crash
    out = ev.groupBy(F.window("ts", "1 hour"), "user_id").agg(
        F.sum("value").alias("v")
    )
    assert out.count() == 0
    sl = SemanticLayer()
    sl.semantic_model(
        "ev", ev,
        measures={"v": {"agg": "sum", "expr": "value"}},
        dimensions={"user": "user_id"},
    )
    sl.metric("vol", model="ev", measure="v")
    assert sl.query(["vol"], group_by=["user"]).count() == 0
    # grand total over empty frame: one row, NULL metric (SQL semantics)
    row = sl.query(["vol"]).collect()[0]
    assert row["vol"] is None


def test_ivf_index_degenerate(spark, empty_vecs, one_vec, tmp_path):
    """IVF day-0: unlike the LSH flavors a coarse quantizer cannot be
    fitted on nothing — empty build raises the named sample error
    (bootstrap with the first real corpus slice instead). After a
    minimal build: empty appends are no-ops, an empty query batch
    returns an empty frame with the contract schema, over-asked k
    returns what exists, and a fresh append self-retrieves."""
    from dbt_foundation_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        knn_join_ivf,
        search_ivf_index,
    )

    path = str(tmp_path / "ivf0")
    with pytest.raises(ValueError, match="sample vectors"):
        build_ivf_index(empty_vecs, "vec_id", "embedding", path, n_lists=2)

    tiny = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.0]) for i in range(10, 18)],
        "vec_id bigint, embedding array<float>",
    )
    build_ivf_index(tiny, "vec_id", "embedding", path, n_lists=2)

    append_to_ivf_index(empty_vecs, "vec_id", "embedding", path)
    assert spark.read.parquet(f"{path}/lists").count() == 8

    empty_knn = knn_join_ivf(
        spark, path, empty_vecs, "vec_id", "embedding", k=3, n_probe=1
    )
    assert empty_knn.columns == ["query_id", "corpus_id", "cosine_sim"]
    assert empty_knn.count() == 0

    # k far beyond the probed lists returns what exists, ranked
    got = search_ivf_index(
        spark, path, "vec_id", "embedding", [11.0, 1.0, 0.0, 0.0],
        k=100, n_probe=2,
    ).collect()
    assert len(got) == 8 and got[0]["vec_id"] == 11

    append_to_ivf_index(one_vec, "vec_id", "embedding", path)
    top = search_ivf_index(
        spark, path, "vec_id", "embedding", [1.0, 0.0, 0.0, 0.0],
        k=1, n_probe=2,
    ).first()
    assert top["vec_id"] == 1 and top["cosine_sim"] > 0.9999


def test_variant_extraction_survives_dirty_json(spark):
    """q_json_props' extraction must NULL, never throw, on dirty JSON:
    the strict variant_get aborts the whole scan at the first
    non-castable value (INVALID_VARIANT_CAST on '{"k": "abc"}' — r9
    probe), which at 100 TB means one bad record kills the job.  Pins
    the try_variant_get choice and its NULL behavior on every dirty
    shape the DuckDB oracle's TRY_CAST also NULLs."""
    dirty = [
        '{"k": 5}', "{k: 5}", "not json", "", None,
        '{"k": "abc"}', '{"k": null}', "[1,2]", '{"k": "7"}',
    ]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(dirty)],
                               "i int, props string")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "bigint")
    got = {r["i"]: r["k"] for r in df.select("i", k.alias("k")).collect()}
    assert got == {0: 5, 1: None, 2: None, 3: None, 4: None,
                   5: None, 6: None, 7: None, 8: 7}


def test_unicode_case_fold_divergence_executable_contract(spark):
    """r10: the Spark-vs-DuckDB case-folding divergence as an
    EXECUTABLE contract (it was prose in the verify skill; the prose
    even had the sigma direction backwards — this is the probed truth).

    Spark lowers/uppers with the JDK's full, context-aware case
    mappings; DuckDB uses utf8proc's one-to-one maps. Divergent chars:

    ===========  ===================  ==============
    input        Spark                DuckDB
    ===========  ===================  ==============
    lower('İ')   'i' + U+0307         'i'
    lower('ΣΟΣ') 'σος' (final sigma)  'σοσ'
    upper('ß')   'SS'                 'ẞ' (U+1E9E)
    ===========  ===================  ==============

    Any oracle replaying lower()/upper()/fingerprint math over such
    text diverges, so oracle comparability rests on the testdata
    all-ASCII invariant asserted below (sf0.001 + sf0.01 — the driver
    gate scales; r9 verified sf0.1 by hand). If testdata ever grows
    non-ASCII text, normalize both sides or restrict the compared
    slice to ASCII rows."""
    import duckdb

    got = spark.sql(
        "SELECT lower('İ') AS a, lower('ΣΟΣ') AS b, upper('ß') AS c"
    ).collect()[0]
    assert got["a"] == "i̇"
    assert got["b"] == "σος"  # final sigma, contextual
    assert got["c"] == "SS"

    da, db, dc = duckdb.sql(
        "SELECT lower('İ'), lower('ΣΟΣ'), upper('ß')"
    ).fetchone()
    assert da == "i"
    assert db == "σοσ"  # plain sigma, non-contextual
    assert dc == "ẞ"
    # the divergence itself — if either engine changes, re-audit every
    # lowered-text oracle before trusting green sweeps
    assert (got["a"], got["b"], got["c"]) != (da, db, dc)

    # the invariant that keeps the oracles comparable: every string
    # column of every gate-scale testdata table is pure ASCII
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for tbl in ("region", "nation", "customer", "supplier", "part",
                    "orders", "lineitem", "events", "documents"):
            df = spark.read.parquet(f"{sf}/{tbl}.parquet")
            scols = [f.name for f in df.schema.fields
                     if f.dataType.simpleString() == "string"]
            if not scols:
                continue
            bad = df.filter(
                F.concat_ws("", *scols).rlike("[^\\x00-\\x7F]")
            ).count()
            assert bad == 0, f"non-ASCII text in {sf}/{tbl}: {bad} rows"


def test_extreme_timestamp_boundaries_contract(spark):
    """r10 probe class: garbage/sentinel timestamps (year-9999 'open
    row' sentinels, year-0001 zero-dates) are everywhere in enterprise
    data. The contract, probed and pinned:

    * JVM-side (filters, comparisons, INTERVAL arithmetic, joins,
      windows) the FULL Spark range 0001-01-01..9999-12-31 works —
      operators never choke on extremes that stay on executors.
    * Driver-side COLLECTION is the narrow seam: classic pickle
      collect() fails only on 0001-01-01 itself (datetime.MINYEAR
      underflow in the deserializer); Arrow toPandas() — the oracle
      compare path — is bounded by pandas' ns range (1677-09-21 ..
      2262-04-11) and raises ArrowInvalid outside it.  Render extremes
      with date_format (string) when they must reach the driver.
    * This is WHY the SCD2 snapshot uses NULL dbt_valid_to for open
      rows, never a 9999-12-31 sentinel: the sentinel would crash the
      toPandas path of every consumer that collects the table.
    """
    import pytest as _pytest

    # JVM-side: full-range arithmetic and comparison, strings out
    row = spark.sql(
        "SELECT date_format(TIMESTAMP'0001-01-01 00:00:00' + INTERVAL 30 MINUTE,"
        "                   'yyyy-MM-dd HH:mm:ss') AS lo,"
        "       date_format(TIMESTAMP'9999-12-31 23:59:59' - INTERVAL 1 DAY,"
        "                   'yyyy-MM-dd HH:mm:ss') AS hi,"
        "       TIMESTAMP'9999-12-31 23:59:59' > TIMESTAMP'2024-01-01' AS cmp"
    ).collect()[0]
    assert row["lo"] == "0001-01-01 00:30:00"
    assert row["hi"] == "9999-12-30 23:59:59"
    assert row["cmp"] is True

    # asof over sentinel right-timestamps stays JVM-correct: the 9999
    # sentinel row wins a backward lookup only for left rows >= it,
    # i.e. never — verified via counts, nothing extreme collected
    from dbt_foundation_spark.operators.asof import asof_join
    from pyspark.sql import functions as F2

    left = spark.createDataFrame(
        [("k", "2024-06-01 00:00:00", 1)], "k string, ts string, lv int"
    ).withColumn("ts", F2.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:00:00", 1.0), ("k", "9999-12-31 23:59:59", 99.0)],
        "k string, ts string, rv double",
    ).withColumn("ts", F2.col("ts").cast("timestamp"))
    j = asof_join(left, right, on=["k"], left_ts="ts")
    assert j.filter(F2.col("rv") == 1.0).count() == 1  # sentinel ignored

    # driver-side seams, pinned so an upgrade changing them is loud:
    # classic collect survives everything except day one of year one
    assert spark.sql(
        "SELECT TIMESTAMP'0001-01-02 00:00:00' AS t"
    ).collect()[0]["t"].year == 1
    with _pytest.raises(ValueError):
        spark.sql("SELECT TIMESTAMP'0001-01-01 00:00:00' AS t").collect()
    # Arrow/toPandas path is ns-bounded (the oracle-compare transport)
    import pyarrow as _pa

    with _pytest.raises(Exception) as ei:
        spark.sql("SELECT TIMESTAMP'9999-12-31 23:59:59' AS t").toPandas()
    assert "out of bounds" in str(ei.value) or isinstance(
        ei.value, _pa.lib.ArrowInvalid
    )


# ---------------------------------------------------------------------------
# Non-finite / malformed vectors (r10 probe class): one corrupt embedding
# (NaN/Inf element, NULL element, wrong dimensionality) must never poison
# the CLEAN rows' answers. Pre-fix behavior, probed live: NaN cosine ranked
# ABOVE 1.0 in every descending top-k (Spark orders NaN > +Inf), NaN passed
# every `>= threshold` near-dup gate (Spark compares NaN greater than any
# value), one NaN row aborted the whole int8_quantize scan (ANSI
# CAST_OVERFLOW), and a ragged vector crashed the IVF centroid fit.
# ---------------------------------------------------------------------------

_NAN = float("nan")
_INF = float("inf")

_CLEAN_VECS = [
    (1, [1.0, 0.0, 0.0]),
    (2, [0.9, 0.1, 0.0]),
    (3, [0.0, 1.0, 0.0]),
    (4, [0.5, 0.5, 0.0]),
    (5, [0.0, 0.0, 1.0]),
    (6, [0.7, 0.0, 0.7]),
    (7, [0.2, 0.9, 0.1]),
    (8, [0.8, 0.2, 0.1]),
]
_CORRUPT_VECS = [
    (100, [_NAN, 0.5, 0.5]),
    (101, [_INF, 0.0, 0.0]),
    (102, [-_INF, 1.0, 0.0]),
    (103, [1.0, None, 0.0]),
    (104, [1.0, 0.0]),          # wrong dim (short)
    (105, [1.0, 0.0, 0.0, 0.0]),  # wrong dim (long)
    (106, None),                # NULL vector
]


@pytest.fixture(scope="module")
def clean_vecs(spark):
    return spark.createDataFrame(_CLEAN_VECS, "vec_id bigint, embedding array<double>")


@pytest.fixture(scope="module")
def dirty_vecs(spark):
    return spark.createDataFrame(
        _CLEAN_VECS + _CORRUPT_VECS, "vec_id bigint, embedding array<double>"
    )


def test_nonfinite_scalar_contract(spark, dirty_vecs):
    """cosine/dot/l2/normalize/int8_quantize: corrupt input -> NULL,
    clean input -> unchanged. No NaN escapes, no ANSI abort."""
    from dbt_foundation_spark.functions import vectors as V

    q = F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0))
    out = dirty_vecs.select(
        "vec_id",
        V.cosine("embedding", q).alias("cos"),
        V.dot("embedding", q).alias("dot"),
        V.l2_distance("embedding", q).alias("l2"),
        V.normalize("embedding").alias("norm"),
        V.int8_quantize("embedding").alias("qz"),
        V.is_finite_vector("embedding").alias("ok"),
    ).collect()
    by_id = {r.vec_id: r for r in out}
    for cid in (100, 101, 102, 103, 106):
        r = by_id[cid]
        assert r.cos is None and r.dot is None and r.l2 is None, cid
        assert r.norm is None and r.qz is None, cid
        assert r.ok in (False, None), cid
    # wrong-dim rows: per-pair ops NULL (zip_with pads with NULL);
    # single-vector ops still work (the vector itself is finite)
    for cid in (104, 105):
        r = by_id[cid]
        assert r.cos is None and r.dot is None, cid
        assert r.qz is not None and r.ok is True, cid
    r1 = by_id[1]
    assert r1.cos == pytest.approx(1.0) and r1.dot == pytest.approx(1.0)
    assert r1.qz.codes == [255, 0, 0] and r1.ok is True
    import math

    for r in out:  # the meta-contract: nothing non-finite survives
        for v in (r.cos, r.dot, r.l2):
            assert v is None or math.isfinite(v), (r.vec_id, v)


def test_nonfinite_rows_do_not_poison_topk(spark, clean_vecs, dirty_vecs):
    """The invariance that matters in production: adding corrupt rows to
    the corpus changes NOTHING about the clean rows' top-k answers, for
    every ANN flavor (brute, LSH, quantized two-stage, IVF)."""
    from dbt_foundation_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf,
        cosine_topk_lsh,
        cosine_topk_quantized,
    )

    qv = [1.0, 0.0, 0.0]

    def ranked(fn, df, **kw):
        return [
            (r.vec_id, round(r.cosine_sim, 9))
            for r in fn(df, "vec_id", "embedding", qv, k=5, **kw).collect()
        ]

    for fn, kw in (
        (cosine_topk, {}),
        (cosine_topk_lsh, {"m": 4}),
        (cosine_topk_quantized, {"shortlist": 6}),
        (cosine_topk_ivf, {"n_lists": 2, "n_probe": 2}),
    ):
        clean = ranked(fn, clean_vecs, **kw)
        dirty = ranked(fn, dirty_vecs, **kw)
        assert clean == dirty, fn.__name__
        assert all(vid < 100 for vid, _ in dirty), fn.__name__
        assert len(clean) == 5, fn.__name__


def test_nonfinite_rows_fail_threshold_gates(spark, dirty_vecs):
    """A NaN/Inf vector must FAIL `cosine >= t` (NULL comparison), never
    pass it — pre-fix NaN passed every threshold."""
    from dbt_foundation_spark.functions import vectors as V

    pairs = dirty_vecs.alias("a").crossJoin(dirty_vecs.alias("b")).filter(
        F.col("a.vec_id") < F.col("b.vec_id")
    )
    survivors = pairs.select(
        F.col("a.vec_id").alias("ia"),
        F.col("b.vec_id").alias("ib"),
        V.cosine("a.embedding", "b.embedding").alias("cos"),
    ).filter(F.col("cos") >= 0.99)
    for r in survivors.collect():
        assert r.ia < 100 and r.ib < 100, (r.ia, r.ib)


def test_ivf_fit_and_assign_quarantine(spark, clean_vecs, dirty_vecs):
    """Centroid fit ignores corrupt vectors (identical geometry with or
    without them present — pre-fix: ragged sample crashed numpy, NaN
    poisoned the means); corrupt rows are assigned the -1 quarantine
    list; clean rows' assignments are unchanged."""
    from dbt_foundation_spark.operators.similarity import ivf_assignments

    a_clean, c_clean = ivf_assignments(clean_vecs, "embedding", n_lists=2, seed=7)
    a_dirty, c_dirty = ivf_assignments(dirty_vecs, "embedding", n_lists=2, seed=7)
    assert c_clean == c_dirty
    clean_map = {r.vec_id: r._ivf_list for r in a_clean.collect()}
    dirty_map = {r.vec_id: r._ivf_list for r in a_dirty.collect()}
    for vid, lst in clean_map.items():
        assert dirty_map[vid] == lst, vid
    for vid in (100, 101, 102, 103, 104, 105, 106):
        assert dirty_map[vid] == -1, vid


def test_cdc_null_op_never_masks_history(spark):
    """A NULL op (unparseable log record) is ignored — comparison
    semantics. Pre-fix it won the window rank at the key's max seq and
    then failed the delete filter, silently ERASING the key's valid
    lower-seq history from the snapshot; through cdc_apply the
    anti-join then deleted the key from the old snapshot outright."""
    from dbt_foundation_spark.operators.cdc import cdc_apply, cdc_snapshot

    changes = spark.createDataFrame(
        [(1, 1, "I", "v1"), (1, 2, "U", "v2"), (1, 3, None, "corrupt"),
         (2, 5, None, "corrupt"), (3, 1, "I", "x1"), (3, 2, "D", None)],
        "k bigint, seq bigint, op string, val string",
    )
    snap = {r.k: r.val for r in cdc_snapshot(changes, ["k"], "seq").collect()}
    assert snap == {1: "v2"}  # k=1 keeps valid history; k=2 all-corrupt -> absent

    old = spark.createDataFrame(
        [(1, 0, "I", "old1"), (2, 0, "I", "old2"), (3, 0, "I", "old3"),
         (4, 0, "I", "old4")],
        "k bigint, seq bigint, op string, val string",
    )
    out = {r.k: r.val for r in cdc_apply(old, changes, ["k"], "seq").collect()}
    # k=1 updated, k=2 (only corrupt rows) KEEPS the old row, k=3
    # deleted by a valid D, k=4 untouched
    assert out == {1: "v2", 2: "old2", 4: "old4"}


def test_dirty_token_counts_pack_contract(spark):
    """NULL/negative token counts (failed upstream counting) pack as
    NULL seq_id/seq_offset and consume no budget, identically in the
    window and greedy paths; clean rows' packing is INVARIANT to the
    corrupt rows' presence. Pre-fix a negative count entered the window
    cumsum and shifted every later document's offsets, and int(NaN)
    crashed the greedy path's Arrow batch."""
    from dbt_foundation_spark.operators.packing import (
        pack_sequences,
        pack_sequences_greedy,
    )

    clean_rows = [(1, 10), (3, 5), (5, 8), (7, 12)]
    dirty_rows = [(2, None), (4, -7), (6, None)]
    mk = lambda rows: spark.createDataFrame(
        sorted(rows), "doc_id bigint, n_tokens bigint"
    )
    for fn in (pack_sequences, pack_sequences_greedy):
        clean = {
            r.doc_id: (r.seq_id, r.seq_offset)
            for r in fn(mk(clean_rows), "n_tokens", 16, ["doc_id"],
                        bucket_by=("doc_id", 1)).collect()
        }
        dirty = {
            r.doc_id: (r.seq_id, r.seq_offset)
            for r in fn(mk(clean_rows + dirty_rows), "n_tokens", 16,
                        ["doc_id"], bucket_by=("doc_id", 1)).collect()
        }
        for did, _ in clean_rows:
            assert dirty[did] == clean[did], (fn.__name__, did)
        for did, _ in dirty_rows:
            assert dirty[did] == (None, None), (fn.__name__, did)


def test_null_id_sampling_contract(spark):
    """NULL-id / NULL-domain rows through the samplers (module
    docstring, NULL-id contract). Pre-fix: a NULL id's NULL hash failed
    BOTH train_test_split filters (rows vanished from the corpus), a
    NULL domain crashed temperature_resample's weight-table sort
    (None < str), and mixture counts included phantom never-admittable
    rows, skewing clean domains' realized rates."""
    from dbt_foundation_spark.operators.sampling import (
        hash_sample,
        mixture_resample,
        temperature_resample,
        train_test_split,
    )

    rows = [(i, "web" if i % 2 else "code") for i in range(1, 101)]
    dirty = [(None, "web"), (None, "code"), (777, None)]
    clean_df = spark.createDataFrame(rows, "doc_id bigint, domain string")
    dirty_df = spark.createDataFrame(rows + dirty, "doc_id bigint, domain string")

    # exhaustive + disjoint, NULL ids in train
    train, test = train_test_split(dirty_df, "doc_id", 0.2)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == dirty_df.count()
    assert test.filter(F.col("doc_id").isNull()).count() == 0
    assert train.filter(F.col("doc_id").isNull()).count() == 2

    # membership samplers exclude NULL ids; clean-row fate unchanged
    # (777 has a valid id — NULL domain is irrelevant to hash_sample)
    ids = lambda df: {r.doc_id for r in df.select("doc_id").collect()}
    assert ids(hash_sample(dirty_df, "doc_id", 0.5)) - {777} == ids(
        hash_sample(clean_df, "doc_id", 0.5)
    )
    assert None not in ids(hash_sample(dirty_df, "doc_id", 0.99))

    # mixture: clean rows' membership invariant to dirty-row presence
    kw = dict(target_weights={"web": 0.5, "code": 0.5})
    assert ids(mixture_resample(dirty_df, "doc_id", "domain", **kw)) == ids(
        mixture_resample(clean_df, "doc_id", "domain", **kw)
    )

    # temperature path survives NULL domain, same invariance
    assert ids(temperature_resample(dirty_df, "doc_id", "domain", 2.0)) == ids(
        temperature_resample(clean_df, "doc_id", "domain", 2.0)
    )
    # degenerate: nothing eligible -> empty, not a raise
    all_null = spark.createDataFrame(
        [(None, None)], "doc_id bigint, domain string"
    )
    assert temperature_resample(all_null, "doc_id", "domain", 2.0).count() == 0

    with pytest.raises(ValueError, match="None"):
        mixture_resample(dirty_df, "doc_id", "domain",
                         target_weights={None: 0.5, "web": 0.5})


def test_exact_dedup_tie_keeper_deterministic(spark):
    """keep_order ties (equal or NULL order values inside one dedup
    group) resolve via the md5-over-row tiebreak, so the keeper is
    identical across partition layouts — pre-fix row_number over a tied
    sort kept whichever row the shuffle happened to deliver first."""
    from dbt_foundation_spark.operators.dedup import exact_dedup

    rows = [
        ("dup text", 5, "payload-a"),
        ("dup text", 5, "payload-b"),      # tied keep_order value
        ("dup text", None, "payload-c"),   # NULL order value
        ("other", 1, "payload-d"),
    ]
    keepers = set()
    for n_parts, order in ((1, rows), (4, rows[::-1]), (7, rows[1:] + rows[:1])):
        df = spark.createDataFrame(
            order, "text string, prio int, payload string"
        ).repartition(n_parts)
        got = {
            (r.text, r.payload)
            for r in exact_dedup(df, ["text"], keep_order=[F.desc_nulls_last("prio")])
            .collect()
        }
        keepers.add(frozenset(got))
    assert len(keepers) == 1, keepers


def test_ivf_append_quarantines_partial_refuses_all_dirty(spark, clean_vecs, tmp_path):
    """Append-side quarantine matches build-side (r10 review): a batch
    with SOME corrupt rows appends — clean rows searchable, corrupt
    rows in list -1 — while an ALL-dirty batch is refused loudly (a
    systematic error, e.g. the wrong embedding model, not dirty data)."""
    from dbt_foundation_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        search_ivf_index,
    )

    path = str(tmp_path / "ivf_q")
    build_ivf_index(clean_vecs, "vec_id", "embedding", path, n_lists=2, seed=7)

    mixed = spark.createDataFrame(
        [(200, [0.95, 0.05, 0.0]), (201, [float("nan"), 0.0, 0.0]),
         (202, [1.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    append_to_ivf_index(mixed, "vec_id", "embedding", path)
    lists = spark.read.parquet(f"{path}/lists")
    quar = {r.vec_id for r in lists.filter(F.col("_ivf_list") == -1).collect()}
    assert quar == {201, 202}
    hits = {
        r.vec_id
        for r in search_ivf_index(
            spark, path, "vec_id", "embedding", [1.0, 0.0, 0.0], k=3, n_probe=2
        ).collect()
    }
    assert 200 in hits and not ({201, 202} & hits)

    all_dirty = spark.createDataFrame(
        [(300, None), (301, [float("inf"), 0.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(ValueError, match="quarantined"):
        append_to_ivf_index(all_dirty, "vec_id", "embedding", path)

    # NULL-id rows quarantine too (r11 degenerate-identity class): an
    # id-less vector could rank in top-k but never be fetched,
    # deduplicated, or retracted — no stable identity, not searchable.
    # Build and append agree on the fate.
    null_id = spark.createDataFrame(
        [(None, [1.0, 0.0, 0.0]), (400, [0.0, 1.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    append_to_ivf_index(null_id, "vec_id", "embedding", path)
    lists = spark.read.parquet(f"{path}/lists")
    assert lists.filter(
        F.col("_ivf_list") == -1
    ).filter(F.col("vec_id").isNull()).count() == 1
    hits = {
        r.vec_id
        for r in search_ivf_index(
            spark, path, "vec_id", "embedding", [1.0, 0.0, 0.0], k=50, n_probe=2
        ).collect()
    }
    assert None not in hits and 400 in hits

    path2 = str(tmp_path / "ivf_q2")
    build_ivf_index(
        clean_vecs.unionByName(null_id), "vec_id", "embedding", path2,
        n_lists=2, seed=7,
    )
    built = spark.read.parquet(f"{path2}/lists")
    assert built.filter(F.col("vec_id").isNull()).collect()[0]["_ivf_list"] == -1


def test_pack_tied_order_cols_serial_and_deterministic(spark):
    """Tied order_cols (r10 review): the window path's default RANGE
    frame counted every tied peer's tokens into each peer's own
    cumsum-before (overlapping offsets matching no serial packing), and
    the greedy path's stable sort kept shuffle arrival order. Both now
    share the md5-over-row tiebreak: offsets are a serial prefix
    (disjoint, budget-respecting) and identical across partition
    layouts."""
    from dbt_foundation_spark.operators.packing import (
        pack_sequences,
        pack_sequences_greedy,
    )

    rows = [(i, "en", 5) for i in range(1, 9)]  # all tied on order col
    for fn in (pack_sequences, pack_sequences_greedy):
        results = []
        for n_parts in (1, 4, 7):
            df = spark.createDataFrame(
                rows, "doc_id bigint, lang string, n_tokens bigint"
            ).repartition(n_parts)
            out = {
                r.doc_id: (r.seq_id, r.seq_offset)
                for r in fn(df, "n_tokens", 16, ["lang"],
                            bucket_by=("doc_id", 1)).collect()
            }
            results.append(out)
        assert results[0] == results[1] == results[2], fn.__name__
        placed = sorted(results[0].values())
        if fn is pack_sequences:
            # contiguous fill (documents may straddle): before = 0,5,…,35
            # over the unique total order → (floor(b/16), b mod 16);
            # pre-fix the RANGE frame gave all 8 peers before=35
            assert placed == sorted(
                (b // 16, b % 16) for b in range(0, 40, 5)
            ), placed
        else:
            # greedy never straddles: 3 docs of 5 fit a 16 budget
            assert placed == sorted(
                (i // 3, (i % 3) * 5) for i in range(8)
            ), placed


def test_pack_preserves_user_columns_named_like_helpers(spark):
    """r10 advice: pack_sequences_greedy wrote a helper column literally
    named _pack_tie and dropped it at the end, so an input that already
    carried a _pack_tie column was silently overwritten and removed
    from the output (_grouping's _pack_bucket had the same hazard).
    Helper names are now collision-proof: user columns pass through
    untouched in both packing paths."""
    from dbt_foundation_spark.operators.packing import (
        pack_sequences,
        pack_sequences_greedy,
    )

    rows = [(i, "en", 5, f"tie{i}", i * 10) for i in range(1, 5)]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, lang string, n_tokens bigint, "
        "_pack_tie string, _pack_bucket bigint",
    )
    for fn in (pack_sequences, pack_sequences_greedy):
        got = {
            r.doc_id: (r._pack_tie, r._pack_bucket, r.seq_id)
            for r in fn(
                df, "n_tokens", 16, ["doc_id"], bucket_by=("doc_id", 1)
            ).collect()
        }
        for i in range(1, 5):
            tie, bucket, seq = got[i]
            assert (tie, bucket) == (f"tie{i}", i * 10), fn.__name__
            assert seq is not None


def test_null_media_payload_contract(spark):
    """A NULL binary payload (missing media) yields NULL
    n_bytes/sha256/features and the decode callback is never invoked on
    it — pre-fix the `p or b""` coalesce gave a MISSING payload the
    same sha256 and features as a zero-byte FILE (false dedup-by-hash
    matches), and a real PIL/ffmpeg decode_fn would have crashed the
    Arrow batch on None. An empty b"" payload is real data and still
    decodes."""
    from dbt_foundation_spark.operators.multimodal import extract_features

    media = spark.createDataFrame(
        [(1, "image/png", bytes([7] * 16)), (2, "image/png", None),
         (3, "image/png", b"")],
        "media_id bigint, mime_type string, payload binary",
    )
    def strict_decode(p):
        # a real backend (PIL/ffmpeg) raises on None — so does this spy;
        # the whole job aborting = extract_features called it on NULL
        if p is None:
            raise TypeError("decode_fn called on a NULL payload")
        return [float(len(p)), 2.0]

    rows = {
        r.media_id: r
        for r in extract_features(media, dim=2, decode_fn=strict_decode).collect()
    }
    assert rows[2].n_bytes is None and rows[2].sha256 is None
    assert rows[2].features is None
    assert rows[1].n_bytes == 16 and rows[3].n_bytes == 0
    assert rows[1].sha256 != rows[3].sha256 != rows[2].sha256
    assert rows[3].features == [0.0, 2.0]  # empty payload still decodes


def test_nonfinite_aggregate_divergence_executable_contract(spark):
    """Engine divergence on NON-FINITE doubles through aggregates,
    pinned executable (the unicode-case-fold precedent): Spark's
    stddev/avg/max return NaN, while DuckDB's stddev ABORTS with
    OutOfRangeException — an oracle replaying stddev over data
    containing ±Inf/NaN crashes instead of mismatching. Approx
    quantile sketches also place non-finites differently (exact
    medians agree). Harmless today for two reasons, both asserted
    here: the analytics queries route dispersion through decimal
    power sums (never the engine stddev builtin), and the testdata's
    double columns are verified all-finite at the gate SFs. If either
    stops holding, non-finite rows must be filtered on BOTH sides of
    any dispersion oracle."""
    import duckdb

    nan, inf = float("nan"), float("inf")
    df = spark.createDataFrame(
        [(v,) for v in [1.0, 2.0, 3.0, 4.0, nan, inf, None]], "v double"
    )
    import math

    r = df.agg(
        F.stddev("v").alias("sd"), F.avg("v").alias("av"),
        F.max("v").alias("mx"), F.expr("percentile(v, 0.5)").alias("med"),
    ).collect()[0]
    assert math.isnan(r.sd) and math.isnan(r.av) and math.isnan(r.mx)
    assert r.med == 3.5

    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    for v in [1.0, 2.0, 3.0, 4.0, nan, inf, None]:
        con.execute("INSERT INTO t VALUES (?)", [v])
    med, av, mx = con.execute("SELECT median(v), avg(v), max(v) FROM t").fetchone()
    assert med == 3.5 and math.isnan(av) and math.isnan(mx)  # these agree
    with pytest.raises(Exception, match="[Oo]ut of [Rr]ange"):
        con.execute("SELECT stddev(v) FROM t").fetchone()  # this DIVERGES

    # the invariant that keeps every oracle safe: gate-SF double
    # columns are all-finite
    for sf in ("0.001", "0.01"):
        ev = spark.read.parquet(f"/root/testdata/sf{sf}/events.parquet")
        bad = ev.filter(
            F.isnan(F.col("value")) | (F.abs(F.col("value")) == F.lit(inf))
        ).count()
        assert bad == 0, (sf, bad)
        emb = spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")
        from dbt_foundation_spark.functions.vectors import is_finite_vector

        nonfinite = emb.filter(~F.coalesce(
            is_finite_vector("embedding"), F.lit(False))).count()
        assert nonfinite == 0, (sf, nonfinite)


def test_degenerate_identities_in_pair_detectors(spark):
    """NULL ids and duplicated ids (same id, different text) through
    every in-memory pair detector (r11 probe). Pre-fix, minhash/simhash
    computed ONE signature per id by grouping the exploded streams, so
    a duplicated id MERGED two texts into a garbage signature that
    banded like neither — the probe lost an exact-copy pair at jaccard
    1.0 and simhash lost every pair; ngram_jaccard's count aggregation
    pushed a doubled identical row's own 'jaccard' past 1.0. Contract
    now: (a) NULL-id rows are excluded (no stable identity — the
    sampler rule) and their presence changes NOTHING about clean
    pairs; (b) each (id, distinct text) version signs separately and
    pair output folds to the strongest evidence per (id_a, id_b) —
    the in-memory twin of the index module's multi-version contract."""
    from dbt_foundation_spark.operators.dedup import (
        containment_pairs,
        minhash_lsh_join,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_near_pairs,
    )
    from dbt_foundation_spark.operators.similarity import embedding_near_pairs

    docs = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")
    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    t2 = "alpha beta gamma delta epsilon zeta eta iota"
    t3 = "ships harbors tides quays docks piers moorings anchors"
    clean = [(1, t1), (2, t2), (3, t3)]
    kw = dict(num_hashes=16, bands=8, shingle_len=3, jaccard_threshold=0.5)

    base = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(docs(clean), "doc_id", "text", **kw).collect()
    }
    assert base == {(1, 2): pytest.approx(5 / 7)}

    # duplicated id 1 carries an exact copy of doc 3's text: the (1,3)
    # pair MUST surface at 1.0 (pre-fix the merged signature lost it)
    # and the clean (1,2) pair must keep its version-1 jaccard
    dup = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(
            docs(clean + [(1, t3)]), "doc_id", "text", **kw
        ).collect()
    }
    assert dup[(1, 2)] == base[(1, 2)]
    assert dup[(1, 3)] == pytest.approx(1.0)
    assert len(dup) == len({(a, b) for a, b in dup})  # one row per pair

    # simhash: the exact copy is hamming 0 (pre-fix: empty output)
    sh = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(
            docs(clean + [(1, t3)]), "doc_id", "text", max_hamming=8
        ).collect()
    }
    assert sh[(1, 3)] == 0

    # containment: column-wise max over versions, one row per pair
    ct = {
        (r.id_a, r.id_b): (r.containment_a, r.containment_b)
        for r in containment_pairs(
            docs(clean + [(1, t3)]), "doc_id", "text",
            shingle_len=2, threshold=0.6,
        ).collect()
    }
    assert ct[(1, 3)] == (pytest.approx(1.0), pytest.approx(1.0))

    # ngram jaccard: version-keyed counts — the dup id pairs at 1.0,
    # and a DOUBLED identical row cannot inflate its own jaccard
    # (pre-fix the merged co-occurrence counts pushed it past 1.0)
    lang = lambda d: d.withColumn("lang", F.lit("en"))
    nj = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            lang(docs(clean + [(1, t3)])), "doc_id", "text", ["lang"],
            shingle_len=2, threshold=0.5,
        ).collect()
    }
    assert nj[(1, 3)] == pytest.approx(1.0)
    doubled = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            lang(docs(clean + [(1, t1)])), "doc_id", "text", ["lang"],
            shingle_len=2, threshold=0.3,
        ).collect()
    }
    assert all(v <= 1.0 for v in doubled.values())
    assert doubled[(1, 2)] == pytest.approx(0.75)

    # NULL ids: invisible by contract, clean pairs byte-identical —
    # including a NULL-id exact copy of doc 1 (it must pair with
    # nothing, not fabricate a (1, NULL) row)
    withnull = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(
            docs(clean + [(None, t1), (None, t3)]), "doc_id", "text", **kw
        ).collect()
    }
    assert withnull == base

    # incremental join: a batch id with two versions matches through
    # EACH version (pre-fix the merged signature lost (10, 3))
    joined = {
        (r.new_id, r.corpus_id): r.jaccard
        for r in minhash_lsh_join(
            docs([(10, t1), (10, t3)]), docs(clean), "doc_id", "text", **kw
        ).collect()
    }
    assert joined[(10, 1)] == pytest.approx(1.0)
    assert joined[(10, 3)] == pytest.approx(1.0)

    # embedding flavor: per-version verify folds to strongest cosine;
    # NULL-id vectors are excluded
    vecs = lambda rows: spark.createDataFrame(rows, "vec_id bigint, emb array<double>")
    ev = vecs([
        (1, [1.0, 0.0, 0.0]), (2, [0.9, 0.4, 0.2]),
        (1, [0.0, 0.0, 1.0]), (3, [0.05, 0.0, 1.0]),
        (None, [1.0, 0.0, 0.0]),
    ])
    emb = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in embedding_near_pairs(
            ev, "vec_id", "emb", threshold=0.8, m=8, bands=4
        ).collect()
    }
    assert set(emb) == {(1, 2), (1, 3)}
    assert emb[(1, 3)] > 0.99  # version 2 of id 1 carries the match

    # connected_components: a pair with a NULL endpoint is no evidence
    # — dropped at entry, clean components byte-identical (pre-fix a
    # (NULL, component) output row was fabricated); self-loops pass
    from dbt_foundation_spark.operators.dedup import connected_components

    clean_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a bigint, id_b bigint"
    )
    dirty_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (None, 5), (6, None), (None, None), (7, 7)],
        "id_a bigint, id_b bigint",
    )
    base_cc = {(r.id, r.comp) for r in connected_components(clean_pairs).collect()}
    dirty_cc = {(r.id, r.comp) for r in connected_components(dirty_pairs).collect()}
    assert base_cc == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}
    assert dirty_cc == base_cc

    # per-document metrics: a NULL-id row gets no OUTPUT row but its
    # grams remain cross-document EVIDENCE — a boilerplate copy whose
    # id was corrupted must still mark the clean twin as repeated
    # (r11 review: filtering before the window silently lowered clean
    # docs' repetition signal)
    from dbt_foundation_spark.operators.dedup import repeated_ngram_spans

    spans = {
        r["_id"]: (r.repeated_ratio, r.max_span_docs)
        for r in repeated_ngram_spans(
            docs([(1, t1), (3, t3), (None, t1)]), "doc_id", "text", n=4
        ).collect()
    }
    assert set(spans) == {1, 3}  # no NULL output row
    assert spans[1] == (pytest.approx(1.0), 2)  # evidence counted
    assert spans[3][0] == pytest.approx(0.0)


def test_keep_best_eligibility_and_keeperless_clusters(spark):
    """keep_best_per_cluster (r11 probe): a NULL score means the
    scoring stage failed for that member — it is as ineligible as a
    member missing from the scores frame (pre-fix a NULL-scored member
    could 'win' purely because it HAD a row, emitting a keeper with
    best_score NULL as if chosen on merit), and a cluster with no
    eligible member keeps its row with NULL keeper_id instead of
    silently vanishing."""
    from dbt_foundation_spark.operators.dedup import keep_best_per_cluster

    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "id bigint, comp bigint"
    )
    scores = spark.createDataFrame(
        [(1, 0.5), (2, None), (8, None)], "id bigint, score double"
    )
    got = {
        r.comp: (r.keeper_id, r.n_members, r.best_score)
        for r in keep_best_per_cluster(labels, scores).collect()
    }
    # cluster 1: id 2's NULL score is ineligible, id 3 unscored —
    # keeper is the best ELIGIBLE member; n_members counts everyone
    assert got[1] == (1, 3, 0.5)
    # cluster 7: no eligible member — explicit keeper-less row
    assert got[7] == (None, 2, None)

    # NaN scores are as ineligible as NULL (Spark orders NaN above
    # every finite double — a failed-scoring member would beat every
    # legitimately scored one)
    nan_scores = spark.createDataFrame(
        [(1, float("nan")), (2, 0.9), (8, float("nan"))],
        "id bigint, score double",
    )
    got_nan = {
        r.comp: (r.keeper_id, r.best_score)
        for r in keep_best_per_cluster(labels, nan_scores).collect()
    }
    assert got_nan[1] == (2, 0.9)
    assert got_nan[7] == (None, None)
    # fully-scored input is unchanged
    full = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (7, 0.1), (8, 0.2)],
        "id bigint, score double",
    )
    got2 = {
        r.comp: (r.keeper_id, r.best_score)
        for r in keep_best_per_cluster(labels, full).collect()
    }
    assert got2 == {1: (2, 0.9), 7: (8, 0.2)}  # tie -> lower id wins


def test_param_domain_guards_are_named(spark):
    """Degenerate operator parameters (r12 probe): pre-guard,
    num_hashes=0 died as an opaque empty-aggregate assertion, bands=0
    as a ZeroDivisionError, bands>num_hashes as an xxhash64-arity error
    deep inside codegen, a non-dividing bands SILENTLY ignored trailing
    hashes, shingle_len=0 silently matched EVERY document to every
    other (all 0-gram shingles are ''), and a threshold <= 0 silently
    UNDER-reported (the inverted index never materializes zero-overlap
    pairs, so 'all pairs' was never what it returned). Each gets one
    named error at the operator boundary."""
    import pytest as _pytest

    from dbt_foundation_spark.functions.text import token_ngrams
    from dbt_foundation_spark.operators.dedup import (
        banding_geometry,
        containment_pairs,
        minhash_lsh_pairs,
        minhash_signature,
        ngram_jaccard_pairs,
        similarity_threshold,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta delta")],
        ["doc_id", "text"],
    )
    with _pytest.raises(ValueError, match="must both be >= 1"):
        banding_geometry(0, 1)
    with _pytest.raises(ValueError, match="must both be >= 1"):
        banding_geometry(16, 0)
    with _pytest.raises(ValueError, match="exceeds"):
        banding_geometry(4, 8)
    with _pytest.raises(ValueError, match="does not divide"):
        banding_geometry(16, 5)
    assert banding_geometry(16, 4) == 4
    with _pytest.raises(ValueError, match="num_hashes=0"):
        minhash_signature(docs, "doc_id", "text", num_hashes=0)
    with _pytest.raises(ValueError, match="shingle length"):
        token_ngrams("text", 0)
    for bad in (0.0, -1.0, 1.5):
        with _pytest.raises(ValueError, match=r"\(0, 1\]"):
            similarity_threshold(bad, "t")
    assert similarity_threshold(1.0, "t") == 1.0  # exact-dup threshold ok
    with _pytest.raises(ValueError, match=r"\(0, 1\]"):
        minhash_lsh_pairs(docs, "doc_id", "text", jaccard_threshold=0.0)
    with _pytest.raises(ValueError, match=r"\(0, 1\]"):
        containment_pairs(docs, "doc_id", "text", threshold=-0.5)
    with _pytest.raises(ValueError, match="max_df"):
        ngram_jaccard_pairs(
            docs.withColumn("lang", F.lit("en")), "doc_id", "text",
            ["lang"], max_df=0,
        )
    # the guarded domains still compute: a legitimate call is unchanged
    assert minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4,
        jaccard_threshold=0.1,
    ).count() >= 0


def test_glob_metacharacter_paths_are_refused_named(spark, tmp_path):
    """Glob-metacharacter dataset paths (r13 probe — a NEW dirty-shape
    class): Spark WRITES treat a path literally but READS expand it as
    a Hadoop glob, so one string names two locations. Probed live:
    reading ``run[2024]/data`` silently UNIONED three wrong sibling
    directories; ``batch_{1}`` silently read the sibling ``batch_1``;
    an index built at ``idx[v1]`` wrote its datasets literally and
    every later query missed them with PATH_NOT_FOUND. Contract: every
    index/output boundary refuses such paths with a named error and
    the rename heal — BEFORE any dataset is written, so no half-built
    unreadable index can exist. Legal path characters that neither
    layer interprets (hive ``=``, spaces, unicode) stay legal."""
    import pytest as _pytest

    from dbt_foundation_spark.operators.dedup_index import (
        build_minhash_index,
        dedup_against_index,
    )
    from dbt_foundation_spark.operators.maintenance import (
        compact_index,
        index_stats,
    )
    from dbt_foundation_spark.operators.similarity import build_ivf_index
    from dbt_foundation_spark.operators.tombstones import (
        assert_literal_path,
        retract_from_index,
    )

    # unit: each metachar class refused, benign shapes pass
    for bad in ("/d/run[2024]", "/d/batch_{1}", "/d/day=*", "/d/x?y"):
        with _pytest.raises(ValueError, match="glob metacharacter"):
            assert_literal_path(bad)
    for ok in ("/d/run_2024", "/d/day=2024-01-01", "/d/with space",
               "/d/ünïcode", "/d/a=b/c=d"):
        assert assert_literal_path(ok) == ok

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    emb = spark.createDataFrame([(1, [1.0, 0.0, 0.0])], ["vec_id", "embedding"])
    bad_idx = str(tmp_path / "idx[v1]")

    # builds refuse BEFORE writing anything (no half-built index)
    with _pytest.raises(ValueError, match="glob metacharacter"):
        build_minhash_index(docs, "doc_id", "text", bad_idx)
    with _pytest.raises(ValueError, match="glob metacharacter"):
        build_ivf_index(emb, "vec_id", "embedding", bad_idx, n_lists=1)
    import os
    assert not os.path.exists(bad_idx)

    # query / retract / maintenance boundaries refuse too
    with _pytest.raises(ValueError, match="glob metacharacter"):
        dedup_against_index(spark, docs, "doc_id", "text", bad_idx)
    with _pytest.raises(ValueError, match="glob metacharacter"):
        retract_from_index(spark, bad_idx, [1])
    with _pytest.raises(ValueError, match="glob metacharacter"):
        compact_index(spark, bad_idx)
    with _pytest.raises(ValueError, match="glob metacharacter"):
        index_stats(spark, bad_idx)
