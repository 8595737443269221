"""Training-data curation queries (SURVEY §2.L, round-3 additions).

The four steps a production corpus pipeline runs after dedup: PII
scrubbing, per-language quality-quantile cuts, embedding quantization
for the ANN index, and incremental (new-batch-vs-corpus) dedup. Every
query has a DuckDB oracle that replays the full computation — including
the regex scrub and the minhash banding — cross-engine.

Reference parity: the dbt reference (dbt-foundation) has no curation
surface of its own; these belong to the BASELINE.json Cat-D mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_foundation_spark.checkpoint import pin
from dbt_foundation_spark.functions import redact as R
from dbt_foundation_spark.functions import text as X
from dbt_foundation_spark.functions import vectors as V
from dbt_foundation_spark.queries import query
from dbt_foundation_spark.queries._util import fan_out, t
from dbt_foundation_spark.queries.llm import (
    _MINHASH_JAC_SQL,
    _SH_CTE_SQL,
    _minhash_portable_ctes,
    _ngram_sql,
    QUALITY_SCORE_SQL,
)

# ---------- PII / secret redaction ----------

# The synthetic corpus contains no PII, so the query plants one
# deterministic instance of each category per document — the SAME
# concat expression in both engines — and then scrubs it. This makes
# the oracle exercise every pattern instead of comparing two no-ops.
_AUG_SQL = (
    "concat(text, ' contact user', CAST(doc_id AS VARCHAR), "
    "'@example.com or +1415555', "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), "
    "' from 10.', CAST(doc_id % 256 AS VARCHAR), '.0.1 key ', "
    "md5(CAST(doc_id AS VARCHAR)))"
)


def _aug_col() -> Column:
    d = F.col("doc_id").cast("string")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        d,
        F.lit("@example.com or +1415555"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0.1 key "),
        F.md5(d),
    )


def _pii_oracle() -> str:
    scrub, counts = R.pii_sql("text")
    count_cols = ",\n           ".join(f"{sql} AS n_{name}" for name, sql in counts.items())
    return f"""
    WITH aug AS (
        SELECT doc_id, {_AUG_SQL} AS text FROM documents
    )
    SELECT doc_id,
           {scrub} AS clean_text,
           {count_cols}
    FROM aug
    """


@query("q_pii_redact", oracle=_pii_oracle())
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 PII scrub: plant a synthetic email/key/IP/phone per document,
    then redact all four categories and count matches. One map stage
    behind the fan_out repartition (the scrub itself adds no shuffle),
    RE2-safe regexes (functions/redact.py) — the oracle replays the
    identical scrub in DuckDB."""
    # fan_out (r13): pure per-row regex stage over a one-split local
    # scan otherwise runs on one core — measured −65% on the funnel's
    # identical shape; identity on any real many-file corpus
    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    aug = docs.select("doc_id", _aug_col().alias("text"))
    counts = R.pii_counts("text")
    return aug.select(
        "doc_id",
        R.redact_pii("text").alias("clean_text"),
        *[counts[name].alias(f"n_{name}") for name, _, _ in R.PII_PATTERNS],
    )


# ---------- per-language quality quantile gate ----------


@query(
    "q_quality_quantile",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, {QUALITY_SCORE_SQL} AS quality
        FROM documents
    ), ranked AS (
        SELECT doc_id, lang, quality,
               percent_rank() OVER (PARTITION BY lang ORDER BY quality) AS pr
        FROM scored
    )
    SELECT doc_id, lang, round(quality, 6) AS quality, round(pr, 6) AS pct_rank
    FROM ranked WHERE pr >= 0.5
    """,
)
def q_quality_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 quantile cut: keep each language's top half by quality score.
    Unlike the fixed-threshold gate (q_quality_filter), a quantile cut
    holds the language mix constant — the standard way to budget a
    multilingual corpus. percent_rank is rank-based, so ties are
    engine-independent; the window shuffles once on lang (at 100 TB:
    ~one partition per language — pre-repartition by (lang, salt) and
    take per-salt quantiles if a single language outgrows an executor).
    """
    docs = fan_out(spark, t(spark, sf_dir, "documents"))  # r13: see q_pii_redact
    w = Window.partitionBy("lang").orderBy("quality")
    return (
        docs.select("doc_id", "lang", X.quality_score("text").alias("quality"))
        .withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.5)
        .select(
            "doc_id",
            "lang",
            F.round("quality", 6).alias("quality"),
            F.round("pr", 6).alias("pct_rank"),
        )
    )


# ---------- embedding int8 quantization ----------


@query(
    "q_embedding_quantize",
    oracle="""
    WITH s AS (
        SELECT vec_id, embedding,
               CAST(list_min(embedding) AS DOUBLE) AS lo,
               CAST(list_max(embedding) AS DOUBLE) AS hi
        FROM embeddings
    )
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS n_dims,
           lo, hi,
           array_to_string(
               list_transform(
                   embedding,
                   x -> CAST(round((CAST(x AS DOUBLE) - lo)
                                   / greatest((hi - lo) / 255.0, 1e-12)) AS INTEGER)
               ), ',') AS codes_csv
    FROM s
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3/D5 int8 scalar quantization of the embedding column
    (functions/vectors.int8_quantize): 4× smaller ANN scan at 100 TB,
    exact re-scoring on the shortlist only. Codes serialized as CSV so
    the driver's value-hash sees a plain string column. All-IEEE-double
    arithmetic — the oracle reproduces every code bit-for-bit."""
    emb = t(spark, sf_dir, "embeddings")
    q = emb.withColumn("q", V.int8_quantize("embedding"))
    return q.select(
        "vec_id",
        F.array_size("embedding").cast("bigint").alias("n_dims"),
        F.col("q.lo").alias("lo"),
        F.col("q.hi").alias("hi"),
        F.array_join("q.codes", ",").alias("codes_csv"),
    )


# ---------- containment (near-subset) pairs ----------

_CONT_A_SQL = (
    "CAST(len(list_intersect(sa.toks, sb.toks)) AS DOUBLE) / len(sa.toks)"
)
_CONT_B_SQL = (
    "CAST(len(list_intersect(sa.toks, sb.toks)) AS DOUBLE) / len(sb.toks)"
)


@query(
    "q_containment",
    oracle=f"""
    WITH {_SH_CTE_SQL}
    SELECT sa.doc_id AS id_a, sb.doc_id AS id_b,
           round({_CONT_A_SQL}, 6) AS containment_a,
           round({_CONT_B_SQL}, 6) AS containment_b
    FROM sh sa
    JOIN sh sb ON sa.doc_id < sb.doc_id
    WHERE greatest({_CONT_A_SQL}, {_CONT_B_SQL}) >= 0.8
    """,
)
def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 near-subset pairs: two-directional shingle containment — the
    quoted-inside / copied-into detector that symmetric Jaccard
    under-scores. Candidates come from rare-shingle prefix filtering
    (operators/dedup.containment_pairs), which is EXACT at the
    threshold, so the DuckDB oracle is brute-force all-pairs containment
    — the blocking must lose nothing to stay green. Threshold 0.8 (the
    operator default): prefix length scales with (1−t), so 0.8 carries
    half the candidate volume of 0.6 at the same exactness (measured at
    sf0.1: 153k vs 393k candidates over 5000 docs)."""
    from dbt_foundation_spark.operators.dedup import containment_pairs

    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    pairs = containment_pairs(
        docs,
        "doc_id",
        "text",
        shingle_len=3,
        threshold=0.8,
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round("containment_a", 6).alias("containment_a"),
        F.round("containment_b", 6).alias("containment_b"),
    )


# ---------- corpus filter funnel ----------

# Python list repr doubles as a DuckDB list literal here (single-quoted
# strings, square brackets)
_MARKER_HITS_SQL = " + ".join(
    f"len(list_filter(tok, t -> list_contains({markers!r}, t)))"
    for markers in (
        ["der", "die", "das", "und", "zu", "den", "ist"],
        ["the", "a", "of", "and", "to", "in", "is"],
        ["el", "la", "de", "y", "que", "en", "los"],
        ["le", "la", "de", "et", "que", "les", "des"],
        ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"],
    )
)


@query(
    "q_filter_funnel",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, text,
               string_split_regex(lower(trim(text)), '\\s+') AS tok
        FROM documents
    ), lab AS (
        SELECT CASE
            WHEN {QUALITY_SCORE_SQL} < 0.85 THEN 'low_quality'
            WHEN 1.0 - CAST(len(list_distinct({_ngram_sql(2)})) AS DOUBLE)
                 / len({_ngram_sql(2)}) > 0.05 THEN 'repetitive'
            WHEN {_MARKER_HITS_SQL} = 0 THEN 'unknown_lang'
            ELSE 'keep' END AS drop_reason
        FROM toks
    )
    SELECT drop_reason, COUNT(*) AS n_docs
    FROM lab GROUP BY drop_reason ORDER BY drop_reason
    """,
)
def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 end-to-end filter funnel: every document gets its FIRST
    failing rule (quality gate → repetition gate → language gate) or
    'keep', and the funnel reports docs per drop reason — the
    kept/dropped accounting every curation pipeline publishes. One scan,
    pure Column expressions, one tiny final aggregate; the oracle
    replays the full rule chain including boundary behavior (unrounded
    doubles compared against the thresholds in both engines)."""
    docs = fan_out(spark, t(spark, sf_dir, "documents"))  # r13: see q_pii_redact
    quality = X.quality_score("text")
    bigram_dup = X.dup_ngram_ratio("text", 2)
    reason = (
        F.when(quality < 0.85, "low_quality")
        .when(bigram_dup > 0.05, "repetitive")
        .when(X.lang_id("text") == "und", "unknown_lang")
        .otherwise("keep")
    )
    return (
        docs.select(reason.alias("drop_reason"))
        .groupBy("drop_reason")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("drop_reason")
    )


# ---------- quantized two-stage ANN top-k ----------

_DEQ_SCALE = "greatest((hi - lo) / 255.0, 1e-12)"


@query(
    "q_cosine_topk_quantized",
    oracle=f"""
    WITH q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    ), z AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
               CAST(list_min(embedding) AS DOUBLE) AS lo,
               CAST(list_max(embedding) AS DOUBLE) AS hi
        FROM embeddings WHERE vec_id != 0
    ), dq AS (
        SELECT vec_id, emb,
               list_transform(
                   emb,
                   x -> lo + CAST(round((x - lo) / {_DEQ_SCALE}) AS INTEGER)
                             * {_DEQ_SCALE}
               ) AS deq
        FROM z
    ), short AS (
        SELECT vec_id, emb,
               list_dot_product(deq, q.qv)
               / (sqrt(list_dot_product(deq, deq)) * sqrt(list_dot_product(q.qv, q.qv)))
                   AS approx_sim
        FROM dq, q
        ORDER BY approx_sim DESC, vec_id
        LIMIT 30
    )
    SELECT vec_id,
           round(approx_sim, 6) AS approx_sim,
           round(list_dot_product(emb, q.qv)
                 / (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(q.qv, q.qv))), 6)
               AS cosine_sim
    FROM short, q
    ORDER BY list_dot_product(emb, q.qv)
             / (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
             vec_id
    LIMIT 10
    """,
)
def q_cosine_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 two-stage ANN: int8-dequantized approximate scan → exact
    cosine re-score of the top-30 shortlist → top-10. The oracle replays
    quantize, dequantize, both rankings and both cut points — the whole
    lossy pipeline is cross-engine checked bit-for-bit."""
    from dbt_foundation_spark.operators.similarity import cosine_topk_quantized

    from dbt_foundation_spark.queries.llm import _query_vector

    emb = t(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir, 0)
    top = cosine_topk_quantized(
        emb, "vec_id", "embedding", qv, k=10, shortlist=30, exclude_id=0
    )
    return top.select(
        "vec_id",
        F.round("approx_sim", 6).alias("approx_sim"),
        F.round("cosine_sim", 6).alias("cosine_sim"),
    )


# ---------- cross-document repeated spans ----------


@query(
    "q_repeated_spans",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tok
        FROM documents
    ), grams AS (
        SELECT doc_id, unnest(list_distinct({_ngram_sql(8)})) AS g FROM toks
    ), gdf AS (
        SELECT doc_id, COUNT(*) OVER (PARTITION BY g) AS span_docs FROM grams
    )
    SELECT doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN span_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repeated,
           round(CAST(SUM(CASE WHEN span_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS repeated_ratio,
           CAST(MAX(span_docs) AS BIGINT) AS max_span_docs
    FROM gdf GROUP BY doc_id
    """,
)
def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2/D4 cross-doc repeated 8-token spans per document — the
    exact-substring memorization/boilerplate signal
    (operators/dedup.repeated_ngram_spans): distinct spans, spans shared
    by ≥2 docs, the shared fraction, and the widest span spread. Two
    keyed shuffles (span window + doc aggregate), no joins; the oracle
    replays span extraction, the window count and the aggregate."""
    from dbt_foundation_spark.operators.dedup import repeated_ngram_spans

    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    out = repeated_ngram_spans(docs, "doc_id", "text", n=8, min_docs=2)
    return out.select(
        F.col("_id").alias("doc_id"),
        "n_spans",
        "n_repeated",
        "repeated_ratio",
        "max_span_docs",
    )


# ---------- quality-aware cluster keeper selection ----------


@query(
    "q_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_minhash_portable_ctes(16, 4)},
    pairs AS (
        SELECT id_a, id_b FROM cand
        JOIN sh sa ON sa.doc_id = cand.id_a
        JOIN sh sb ON sb.doc_id = cand.id_b
        WHERE {_MINHASH_JAC_SQL} >= 0.5
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ), reach(id, lab) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
    ), comp AS (
        SELECT id, MIN(lab) AS component FROM reach GROUP BY id
    ), scored AS (
        SELECT doc_id, {QUALITY_SCORE_SQL} AS q FROM documents
    ), ranked AS (
        SELECT c.component, c.id, s.q,
               row_number() OVER (PARTITION BY c.component
                                  ORDER BY s.q DESC, c.id) AS rn,
               COUNT(*) OVER (PARTITION BY c.component) AS n_members
        FROM comp c JOIN scored s ON s.doc_id = c.id
    )
    SELECT component, id AS keeper_id,
           CAST(n_members AS BIGINT) AS n_members,
           round(q, 6) AS best_quality
    FROM ranked WHERE rn = 1
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End of the dedup decision chain: minhash pairs → connected
    components → KEEP THE BEST-QUALITY member per cluster (ties broken
    by doc_id), not the minimum id — the policy a quality-aware corpus
    dedup actually ships (operators/dedup.keep_best_per_cluster). The
    oracle replays the full pipeline: portable minhash banding, Jaccard
    verify, transitive closure, quality scoring, and the ranked keeper
    pick."""
    from dbt_foundation_spark.operators.dedup import (
        connected_components,
        keep_best_per_cluster,
        minhash_lsh_pairs,
    )

    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    pairs = minhash_lsh_pairs(
        docs,
        "doc_id",
        "text",
        num_hashes=16,
        bands=4,
        shingle_len=3,
        jaccard_threshold=0.5,
        portable=True,
    )
    comps = connected_components(pairs, "id_a", "id_b")
    # lazy pin = expression barrier (the q_corpus_pipeline gate fix,
    # batch 1): keep_best_per_cluster's eligibility filter otherwise
    # re-expands quality_score into a pushed-down Filter where no CSE
    # applies — the before-plan's scan Filter evaluated the tokenize
    # ~10× per row (isnotnull + isnan, each inlining the score twice).
    scored = pin(
        docs.select(
            F.col("doc_id").alias("id"), X.quality_score("text").alias("score")
        ),
        eager=False,
    )
    best = keep_best_per_cluster(comps, scored)
    return best.select(
        F.col("comp").alias("component"),
        "keeper_id",
        "n_members",
        F.round("best_score", 6).alias("best_quality"),
    )


# ---------- incremental (new-batch vs corpus) dedup ----------


@query(
    "q_dedup_incremental",
    oracle=f"""
    WITH {_minhash_portable_ctes(
        16, 4,
        pair_select="a.doc_id AS new_id, b.doc_id AS corpus_id",
        pair_pred="a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0",
    )}
    SELECT new_id, corpus_id, round({_MINHASH_JAC_SQL}, 6) AS jaccard
    FROM cand
    JOIN sh sa ON sa.doc_id = cand.new_id
    JOIN sh sb ON sb.doc_id = cand.corpus_id
    WHERE {_MINHASH_JAC_SQL} >= 0.5
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 incremental dedup: docs with doc_id % 10 == 0 play the "new
    batch", the rest the standing corpus; minhash_lsh_join generates
    candidates ONLY across the two sides. The oracle computes the full
    corpus banding once and restricts the candidate join to cross-side
    pairs — identical per-doc signatures, so the results must agree
    (operators/dedup.py:minhash_lsh_join documents the at-scale shape:
    persist the corpus band index, join each ingest against it)."""
    from dbt_foundation_spark.operators.dedup import minhash_lsh_join

    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    new_batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    pairs = minhash_lsh_join(
        new_batch,
        corpus,
        "doc_id",
        "text",
        num_hashes=16,
        bands=4,
        shingle_len=3,
        jaccard_threshold=0.5,
        portable=True,
    )
    return pairs.select("new_id", "corpus_id", F.round("jaccard", 6).alias("jaccard"))


# ---------- corpus IDF novelty scoring ----------


@query(
    "q_idf_novelty",
    oracle=r"""
    WITH words AS (
        SELECT doc_id,
               unnest(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS word
        FROM documents
    ), tot AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
    ), dfreq AS (
        SELECT word, COUNT(*) AS df FROM words GROUP BY word
    )
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           round(AVG(ln(tot.n_docs / dfreq.df)), 6) AS novelty
    FROM words w
    JOIN dfreq ON w.word = dfreq.word
    CROSS JOIN tot
    GROUP BY w.doc_id
    """,
)
def q_idf_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 novelty/rarity score: mean IDF (ln N/df) over each document's
    distinct words — the standard diversity signal for training-data
    selection (a doc of corpus-common words scores near 0, one full of
    rare terms scores high; used to up-weight novel content in a mix).

    Shape: explode distinct words (map-side, no shuffle) → df per word
    (groupBy with map-side partial agg — stopword skew is absorbed in
    the combiners, the reduce side sees one row per word) → join the
    exploded words back to the df table → per-doc avg. The df table
    grows with vocabulary (web-scale corpora have billions of distinct
    tokens), so NO broadcast hint — AQE picks by measured size, and its
    skew-join split handles the stopword keys whose join output is
    ~n_docs rows each. The corpus-count scalar IS broadcast (1 row,
    always bounded)."""
    docs = t(spark, sf_dir, "documents")
    tot = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    words = docs.select(
        "doc_id", F.explode(F.array_distinct(X.tokenize("text"))).alias("word")
    )
    dfreq = words.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    return (
        words.join(dfreq, "word")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.avg(F.log(F.col("n_docs") / F.col("df"))), 6).alias("novelty"),
        )
    )


# ---------- token-budget greedy selection ----------


@query(
    "q_token_budget_select",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, {QUALITY_SCORE_SQL} AS quality,
               CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS toks
        FROM documents
    ), tot AS (
        SELECT CAST(floor(SUM(toks) * 0.4) AS BIGINT) AS budget FROM scored
    ), r AS (
        SELECT doc_id, quality, toks,
               SUM(toks) OVER (ORDER BY quality DESC, doc_id
                               ROWS UNBOUNDED PRECEDING) AS run
        FROM scored
    )
    SELECT doc_id, round(quality, 6) AS quality, toks
    FROM r CROSS JOIN tot WHERE run <= budget
    """,
)
def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 budgeted curation: keep the highest-quality documents whose
    cumulative token count fits a 40 %-of-corpus budget — the "give me
    the best N tokens" step every data-constrained training run needs.

    The oracle is the NAIVE plan (one global running-sum window — fine
    for DuckDB single-node); the Spark side runs
    :func:`operators.sampling.budget_select`, the two-phase bin
    decomposition whose only unpartitioned window is over ≤ 1001
    per-bin aggregate rows. The hash compare proves the decomposition
    selects the byte-identical prefix. Budget derives from sum(toks)
    so the query exercises the cutoff at every SF (a fixed budget
    degenerates to select-all at small SF). Ordering floats are
    identical cross-engine: every quality term is exact-integer
    division in IEEE double, both engines.

    The scored subplan (quality over regex/split work) appears in the
    budget agg, the bin totals, and both output branches — Catalyst
    re-derives it per consumer, so the text column scans 6× here. At
    100 TB: persist/checkpoint ``scored`` once (or write it as an
    intermediate model) before the selection — the operator itself adds
    only the tiny bin aggregate and the single boundary-bin window on
    top of that one materialized pass."""
    from dbt_foundation_spark.operators.sampling import budget_select

    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    # pin the scored frame (lazy): it feeds the budget aggregate, the
    # bin totals, and both selection branches — without the pin
    # Catalyst re-derives the regex/split-heavy quality expressions per
    # consumer, scanning the text column 6× (this docstring's own
    # at-scale advice, now applied: one materialized pass, three cheap
    # cached reads). fan_out first so the one real scoring pass runs on
    # every core instead of the single-row-group scan's one task.
    scored = pin(
        docs.select(
            "doc_id",
            X.quality_score("text").alias("quality"),
            X.token_count("text").cast("bigint").alias("toks"),
        ),
        eager=False,
    )
    budget = scored.agg(
        F.floor(F.sum("toks") * 0.4).cast("bigint").alias("budget")
    )
    sel = budget_select(
        scored,
        id_col="doc_id",
        score_col="quality",
        cost_col="toks",
        budget=budget,
    )
    return sel.select("doc_id", F.round("quality", 6).alias("quality"), "toks")


# ---------- unigram LM quality proxy (CCNet-style) ----------

_TOKS_SQL = r"CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)"


@query(
    "q_unigram_logprob",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        FROM documents
    ), freq AS (
        SELECT lang, word, COUNT(*) AS cnt FROM toks GROUP BY lang, word
    ), tot AS (
        SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_tok FROM freq GROUP BY lang
    ), scored AS (
        SELECT t.doc_id, t.lang, COUNT(*) AS n_words,
               round(-avg(ln(CAST(f.cnt AS DOUBLE) / CAST(tt.n_tok AS DOUBLE))), 6)
                   AS nll
        FROM toks t
        JOIN freq f ON t.lang = f.lang AND t.word = f.word
        JOIN tot tt ON t.lang = tt.lang
        GROUP BY t.doc_id, t.lang
    )
    SELECT doc_id, lang, n_words, nll,
           CASE ntile(3) OVER (PARTITION BY lang ORDER BY nll, doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS ppl_bucket
    FROM scored
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality proxy: score every document by its mean
    negative log-probability under a per-language unigram model fit on
    the corpus itself, then cut each language into head/middle/tail
    perplexity buckets — the classic web-corpus quality split (CCNet,
    Wenzek et al. 2020; reference for the method, no code derived).

    Shape at 100 TB: tokenize+explode is map-side; the unigram "model"
    is a (lang, word)→count aggregate with map-side combine (stopword
    skew absorbed in combiners); scoring joins tokens back to the
    frequency table — vocabulary-sized, so NO broadcast hint (AQE
    decides by size; its skew split handles stopword keys). The
    per-lang token-total table is bounded (one row per language) and IS
    broadcast. The final tertile window partitions by language —
    per-lang ordering of doc scores; for lang-skewed corpora swap the
    ntile for the histogram-quantile cut (q_histogram_quantiles).
    """
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(X.tokenize("text")).alias("word")
    )
    freq = toks.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("cnt"))
    tot = freq.groupBy("lang").agg(F.sum("cnt").cast("bigint").alias("n_tok"))
    scored = (
        toks.join(freq, ["lang", "word"])
        .join(F.broadcast(tot), "lang")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(
                -F.avg(
                    F.log(
                        F.col("cnt").cast("double") / F.col("n_tok").cast("double")
                    )
                ),
                6,
            ).alias("nll"),
        )
    )
    tert = F.ntile(3).over(
        Window.partitionBy("lang").orderBy(F.col("nll").asc(), F.col("doc_id").asc())
    )
    return scored.withColumn(
        "ppl_bucket",
        F.when(tert == 1, "head").when(tert == 2, "middle").otherwise("tail"),
    )


# ---------- balanced training-shard planning ----------


@query(
    "q_shard_plan",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), r AS (
        SELECT doc_id, toks,
               row_number() OVER (ORDER BY toks DESC, doc_id % 64, doc_id) AS rn
        FROM sized
    ), assigned AS (
        SELECT toks,
               CASE WHEN ((rn - 1) // 8) % 2 = 0
                    THEN (rn - 1) % 8
                    ELSE 7 - ((rn - 1) % 8)
               END AS shard
        FROM r
    )
    SELECT CAST(shard AS INT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS total_tokens
    FROM assigned GROUP BY shard ORDER BY shard
    """,
)
def q_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced training-shard export plan: deal documents onto 8 shards
    serpentine-style in token-count-descending order (boustrophedon LPT)
    so every shard lands a near-equal token total — the step before
    writing N equal-work training files.

    The oracle is the NAIVE plan (one global row_number window — fine
    single-node); the Spark side runs
    :func:`operators.packing.serpentine_shards`, whose two-phase rank
    keeps every window bounded (histogram-sized offsets + per-tie-group
    row_number) — no all-rows single-partition window exists in the
    plan, so it survives a 100 TB corpus.
    """
    from dbt_foundation_spark.operators.packing import serpentine_shards

    docs = t(spark, sf_dir, "documents")
    sized = docs.select("doc_id", X.token_count("text").alias("toks"))
    assigned = serpentine_shards(
        sized, id_col="doc_id", cost_col="toks", n_shards=8
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("bigint").alias("total_tokens"),
        )
        .orderBy("shard")
    )


# ---------- per-language winsorized token counts ----------


@query(
    "q_winsorize",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents
    ), st AS (
        SELECT lang, COUNT(*) AS n FROM sized GROUP BY lang
    ), rk AS (
        SELECT doc_id, lang, toks,
               row_number() OVER (PARTITION BY lang ORDER BY toks, doc_id) AS rn
        FROM sized
    ), bounds AS (
        SELECT rk.lang,
               MAX(CASE WHEN rn = greatest(1, CAST(ceil(0.05 * n) AS BIGINT))
                        THEN toks END) AS lo,
               MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                        THEN toks END) AS hi
        FROM rk JOIN st ON rk.lang = st.lang
        GROUP BY rk.lang
    )
    SELECT s.doc_id, s.lang, s.toks,
           least(greatest(s.toks, b.lo), b.hi) AS toks_w
    FROM sized s JOIN bounds b ON s.lang = b.lang
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language winsorization of document token counts: clip every
    document's length signal to that language's [p05, p95] order
    statistics — the robust-stats step that stops a handful of giant or
    empty documents from dominating downstream length-normalized
    quality scores.

    The cut points are exact order statistics (the value at rank
    ⌈p·n⌉), not interpolated percentiles — integer in, integer out, so
    the DuckDB replay is bit-exact with zero float risk. Shape: one
    per-lang row_number window (state bounded per language; for
    lang-skewed corpora the histogram-CDF route of
    q_histogram_quantiles computes the same ranks without a per-row
    window), a 5-row bounds table (bounded: one row per language →
    broadcast is correct), one map-side clip.
    """
    docs = t(spark, sf_dir, "documents")
    sized = docs.select("doc_id", "lang", X.token_count("text").alias("toks"))
    st = sized.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    rk = sized.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(F.col("toks").asc(), F.col("doc_id").asc())
        ),
    )
    lo_rank = F.greatest(F.lit(1).cast("bigint"), F.ceil(F.lit(0.05) * F.col("n")))
    hi_rank = F.ceil(F.lit(0.95) * F.col("n"))
    bounds = (
        rk.join(F.broadcast(st), "lang")
        .groupBy("lang")
        .agg(
            F.max(F.when(F.col("rn") == lo_rank, F.col("toks"))).alias("lo"),
            F.max(F.when(F.col("rn") == hi_rank, F.col("toks"))).alias("hi"),
        )
    )
    return sized.join(F.broadcast(bounds), "lang").select(
        "doc_id",
        "lang",
        "toks",
        F.least(F.greatest(F.col("toks"), F.col("lo")), F.col("hi")).alias("toks_w"),
    )


# ---------- bigram LM scoring (the unigram upgrade path) ----------


@query(
    "q_bigram_logprob",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang, w AS word,
               row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        FROM (
            SELECT doc_id, lang,
                   unnest(string_split_regex(lower(trim(text)), '\s+')) AS w,
                   unnest(range(1, len(string_split_regex(lower(trim(text)), '\s+')) + 1)) AS pos
            FROM documents
        )
    ), grams AS (
        SELECT a.doc_id, a.lang, a.word AS w1, b.word AS w2
        FROM toks a JOIN toks b
          ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
    ), big AS (
        SELECT lang, w1, w2, COUNT(*) AS c2 FROM grams GROUP BY lang, w1, w2
    ), uni AS (
        SELECT lang, w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM big GROUP BY lang, w1
    )
    SELECT g.doc_id, g.lang, COUNT(*) AS n_bigrams,
           round(-avg(ln((CAST(b.c2 AS DOUBLE) + 1.0)
                         / (CAST(u.c1 AS DOUBLE) + 1000.0))), 6) AS bigram_nll
    FROM grams g
    JOIN big b ON g.lang = b.lang AND g.w1 = b.w1 AND g.w2 = b.w2
    JOIN uni u ON g.lang = u.lang AND g.w1 = u.w1
    GROUP BY g.doc_id, g.lang
    """,
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM quality score with add-1/V smoothing (V fixed at 1000
    for engine parity): mean −ln P(w_i | w_{i−1}) per document under a
    per-language bigram model fit on the corpus — one step closer to
    the KenLM filter CCNet actually runs than q_unigram_logprob, while
    staying fully SQL-replayable.

    Shape: posexplode keeps token positions (map-side); bigrams come
    from zipping each token array with itself shifted — NO self-join on
    the token table (the oracle's rn-to-rn+1 join is the single-node
    spelling; the Spark side slides the array in place). The bigram
    count table is vocabulary²-bounded-by-data — joined WITHOUT a
    broadcast hint (AQE sizes it); the unigram context totals derive
    from the bigram table (one extra tiny agg), never a second corpus
    pass."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        X.tokenize("text").alias("_t"),
    )
    grams = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.zip_with(
                F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("g"),
    ).select("doc_id", "lang", "g.w1", "g.w2")
    # lazy pins (r13): grams feeds the count model AND the per-doc join,
    # and big feeds uni AND the join — pre-pin all three consumers
    # re-ran the tokenize+zip+explode subtree from its own scan (the
    # before-plan has three Generate-over-Scan copies). One exploded
    # pass now serves the whole query.
    grams = pin(grams, eager=False)
    big = pin(
        grams.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).alias("c2")),
        eager=False,
    )
    uni = big.groupBy("lang", "w1").agg(F.sum("c2").cast("bigint").alias("c1"))
    return (
        grams.join(big, ["lang", "w1", "w2"])
        .join(uni, ["lang", "w1"])
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -F.avg(
                    F.log(
                        (F.col("c2").cast("double") + F.lit(1.0))
                        / (F.col("c1").cast("double") + F.lit(1000.0))
                    )
                ),
                6,
            ).alias("bigram_nll"),
        )
    )


# ---------- character entropy (compression-proxy quality signal) ----------


@query(
    "q_char_entropy",
    oracle="""
    WITH chars AS (
        SELECT doc_id, unnest(string_split(lower(text), '')) AS ch
        FROM documents
    ), freq AS (
        SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
    ), tot AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM freq GROUP BY doc_id
    )
    SELECT f.doc_id, t.n AS n_chars_counted,
           round(-SUM((CAST(c AS DOUBLE) / t.n)
                      * ln(CAST(c AS DOUBLE) / t.n)) / ln(2.0), 6)
               AS char_entropy_bits
    FROM freq f JOIN tot t ON f.doc_id = t.doc_id
    GROUP BY f.doc_id, t.n
    """,
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution entropy in bits — the cheap
    stand-in for a compression-ratio quality gate (low-entropy docs are
    repetitive/boilerplate, near-random entropy flags binary junk;
    Gopher's repetition family measures the same pathology from the
    other end).

    Shape: explode characters (map-side), per-(doc, char) counts with
    map-side combine — the shuffle key space is |docs| × |alphabet|,
    linear in the corpus; entropy folds back per doc in one aggregate.
    Zero joins beyond the per-doc total re-attach; pure Column math."""
    docs = t(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), "")).alias("ch")
    )
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id", F.col("n").alias("n_chars_counted"))
        .agg(
            F.round((-F.sum(p * F.log(p)) / F.log(F.lit(2.0))), 6).alias(
                "char_entropy_bits"
            )
        )
        .select("doc_id", "n_chars_counted", "char_entropy_bits")
    )


# ---------- TF-IDF top terms per document ----------


@query(
    "q_top_terms",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        FROM documents
    ), tf AS (
        SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY doc_id, word
    ), df AS (
        SELECT word, COUNT(*) AS df FROM tf GROUP BY word
    ), nd AS (
        SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf
    ), scored AS (
        SELECT tf.doc_id, tf.word,
               round(tf.tf * ln(CAST(nd.n_docs AS DOUBLE) / df.df), 6)
                   AS tfidf
        FROM tf JOIN df ON tf.word = df.word CROSS JOIN nd
    ), ranked AS (
        SELECT doc_id, word, tfidf,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, word) AS rnk
        FROM scored
    )
    SELECT doc_id, word, tfidf, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — keyword extraction for search
    indexing / topic labeling over the corpus.

    Shape: term frequencies with map-side combine; document frequencies
    from the (doc, word) table (already deduped — no second corpus
    pass); the corpus-size scalar broadcasts (1 row, always bounded);
    the per-doc top-3 window partitions by doc_id — state bounded by
    one document's vocabulary. The df table grows with vocabulary, so
    its join carries NO broadcast hint (AQE sizes it; skew-split
    handles stopwords)."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(X.tokenize("text")).alias("word")
    )
    tf = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    nd = tf.agg(F.countDistinct("doc_id").cast("double").alias("n_docs"))
    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    rnk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word").asc())
    )
    return scored.withColumn("rnk", rnk).filter(F.col("rnk") <= 3)


# ---------- the fused corpus pipeline (gate → dedup → shard) ----------


def _pipeline_oracle() -> str:
    from dbt_foundation_spark.queries.llm import _minhash_portable_ctes

    ngram2 = _ngram_sql(2)
    return rf"""
    WITH RECURSIVE t0 AS (
        SELECT doc_id, lang, text,
               string_split_regex(lower(trim(text)), '\s+') AS tok
        FROM documents
    ), gated AS (
        SELECT doc_id, lang, text, len(tok) AS toks FROM t0
        WHERE {QUALITY_SCORE_SQL} >= 0.5
          AND 1.0 - CAST(len(list_distinct({ngram2})) AS DOUBLE)
              / len({ngram2}) <= 0.30
          AND {_MARKER_HITS_SQL} > 0
    ), keepers AS (
        SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY text
    ), survivors AS (
        SELECT g.* FROM gated g JOIN keepers k ON g.doc_id = k.doc_id
    ), {_minhash_portable_ctes(16, 4, source="survivors")},
    pairs AS (
        SELECT id_a, id_b FROM cand
        JOIN sh sa ON sa.doc_id = cand.id_a
        JOIN sh sb ON sb.doc_id = cand.id_b
        WHERE {_MINHASH_JAC_SQL} >= 0.5
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ), reach(id, lab) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
    ), comp AS (
        SELECT id, MIN(lab) AS component FROM reach GROUP BY id
    ), final AS (
        SELECT s.doc_id, s.toks
        FROM survivors s LEFT JOIN comp c ON c.id = s.doc_id
        WHERE c.id IS NULL OR c.id = c.component
    ), r AS (
        SELECT doc_id, toks,
               row_number() OVER (ORDER BY toks DESC, doc_id % 64, doc_id) AS rn
        FROM final
    ), assigned AS (
        SELECT toks,
               CASE WHEN ((rn - 1) // 8) % 2 = 0
                    THEN (rn - 1) % 8 ELSE 7 - ((rn - 1) % 8)
               END AS shard
        FROM r
    )
    SELECT CAST(shard AS INT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS total_tokens
    FROM assigned GROUP BY shard ORDER BY shard
    """


@query("q_corpus_pipeline", oracle=_pipeline_oracle())
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE fused training-corpus pipeline, end to end in one plan:
    quality/repetition/language gates → exact dedup (min-id keeper per
    identical text) → MinHash-LSH near-dup collapse (portable md5
    signatures, connected components, canonical member survives) →
    serpentine token-balanced assignment onto 8 training shards. The
    DuckDB oracle replays EVERY stage — gate arithmetic, keeper
    aggregation, the full shingle/hash/band/verify/closure chain over
    the gated survivor set, and the shard deal — so any drift anywhere
    in the composed pipeline hash-mismatches.

    Why it matters: the individual stages are oracle-checked alone;
    this query pins their COMPOSITION (each stage consuming the
    previous stage's survivors), which is what a user actually ships.
    Scale shape inherits from its parts: every stage is keyed
    aggregation / banded equi-join / bounded-window rank — nothing
    all-pairs, nothing driver-side, the one global window reads the
    shard histogram."""
    from dbt_foundation_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from dbt_foundation_spark.operators.packing import serpentine_shards

    docs = fan_out(spark, t(spark, sf_dir, "documents"))
    # Gate shape (guide §1.2 "per-task work" + §5 caching criterion,
    # measured at sf0.1): the three gate signals share the same
    # tokenization, and codegen's subexpression elimination DOES share
    # it — but only inside one Project (all four expressions in one
    # select: 0.34 s). Put the same expressions in a Filter (the
    # previous shape) and Catalyst's project-collapse re-expands each
    # alias into the predicate where no CSE applies: 1.7 s, a 5×
    # per-row tax. So: compute the signals ONCE as projected columns,
    # pin (the lineage barrier that stops the filter collapsing back
    # into the project — and `gated` is consumed twice downstream
    # anyway, by the keeper aggregate and the survivor join), then
    # filter on the cheap columns. At 100 TB the pin trades one extra
    # materialization of the corpus slice for re-running the most
    # CPU-expensive per-row chain in the catalog — the §5 trade, taken
    # deliberately (set checkpointDir for the durable tier).
    scored = pin(
        docs.select(
            "doc_id",
            "text",
            X.quality_score("text").alias("_q"),
            X.dup_ngram_ratio("text", 2).alias("_d"),
            X.lang_id("text").alias("_l"),
            X.token_count("text").alias("toks"),
        ),
        eager=False,
    )
    gated = scored.filter(
        (F.col("_q") >= 0.5) & (F.col("_d") <= 0.30) & (F.col("_l") != "und")
    ).select("doc_id", "text", "toks")
    keepers = gated.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    # lazy checkpoint at the stage boundary: the gate + keeper join is
    # consumed by the minhash shingling, every connected-components
    # iteration, and the final canonical filter — materialize it once
    # (the in-plan analog of a pipeline persisting stage outputs)
    survivors = pin(
        gated.join(keepers.select("doc_id"), "doc_id"), eager=False
    )
    pairs = minhash_lsh_pairs(
        survivors, "doc_id", "text",
        num_hashes=16, bands=4, shingle_len=3,
        jaccard_threshold=0.5, portable=True,
    )
    comps = connected_components(pairs, "id_a", "id_b")
    final = pin(
        survivors.join(comps, survivors["doc_id"] == comps["id"], "left")
        .filter(F.col("id").isNull() | (F.col("id") == F.col("comp")))
        .select("doc_id", "toks"),
        eager=False,  # read by shard histogram AND rank
    )
    assigned = serpentine_shards(
        final, id_col="doc_id", cost_col="toks", n_shards=8
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("bigint").alias("total_tokens"),
        )
        .orderBy("shard")
    )


# ---------- deterministic train/test split ----------


@query(
    "q_train_test_split",
    oracle="""
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8)
                     < '33333333'
                THEN 'test' ELSE 'train' END AS split,
           lang, COUNT(*) AS n_docs
    FROM documents GROUP BY split, lang ORDER BY split, lang
    """,
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-stable 80/20 train/test split
    (operators/sampling.train_test_split): membership is a pure
    function of md5(doc_id, salt), so a document NEVER migrates between
    splits across runs, repartitions, or engines — the property that
    keeps eval sets uncontaminated as the corpus is reprocessed. The
    oracle replays the exact hex-threshold predicate; the disjoint ∧
    exhaustive property is pinned in tests/test_scale_ops.py."""
    from dbt_foundation_spark.operators.sampling import train_test_split

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    train, test = train_test_split(docs, "doc_id", test_fraction=0.2)
    both = train.withColumn("split", F.lit("train")).unionByName(
        test.withColumn("split", F.lit("test"))
    )
    return (
        both.groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


# ---------- mean-pool embedding aggregation ----------


@query(
    "q_embedding_meanpool",
    oracle="""
    WITH pos AS (
        SELECT label, unnest(range(0, len(embedding))) AS p,
               unnest(embedding) AS v
        FROM embeddings
    ), agg AS (
        SELECT label, p, COUNT(*) AS n,
               CAST(CAST(round(
                   CAST(CAST(SUM(CAST(v AS DECIMAL(18,8))) AS VARCHAR)
                        AS DOUBLE) / COUNT(*),
               6) AS DECIMAL(12,6)) AS VARCHAR) AS m
        FROM pos GROUP BY label, p
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS dim,
           CAST(MIN(n) AS BIGINT) AS n_members,
           string_agg(m, ',' ORDER BY p) AS mean_csv
    FROM agg GROUP BY label
    """,
)
def q_embedding_meanpool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pool embedding aggregation: the per-group centroid of a
    vector column (chunk embeddings → document embedding, member
    embeddings → cluster centroid — the aggregation every
    retrieval/clustering pipeline runs after chunk-level encoding).

    Scale shape: posexplode to (group, position, value) — map-side —
    then ONE keyed aggregate on (group, position) with map-side
    combine; the element shuffle carries scalars, never whole vectors,
    and no executor ever holds more than one group-position cell.
    Re-assembly sorts each group's 64 positions inside an array —
    bounded by the embedding dim. Sums are DECIMAL-routed so the
    centroid is bit-identical cross-engine; means serialize as
    fixed-point strings (decimal→varchar renders identically in both
    engines, unlike doubles)."""
    emb = t(spark, sf_dir, "embeddings")
    pos = emb.select(
        "label", F.posexplode(V.to_double_array("embedding")).alias("p", "v")
    )
    agg = pos.groupBy("label", "p").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("v").cast("decimal(18,8)")).cast("double") / F.count(F.lit(1)),
            6,
        )
        .cast("decimal(12,6)")
        .cast("string")
        .alias("m"),
    )
    return (
        agg.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("dim"),
            F.min("n").cast("bigint").alias("n_members"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "m"))),
                    lambda s: s["m"],
                ),
                ",",
            ).alias("mean_csv"),
        )
    )


# ---------- temperature-scaled mixture sampling ----------


@query(
    "q_temperature_mix",
    oracle="""
    WITH counts AS (
        SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ), sized AS (
        SELECT source, n, power(CAST(n AS DOUBLE), 0.5) AS wt FROM counts
    ), cap AS (
        SELECT MIN(n / wt) AS c FROM sized
    ), rates AS (
        SELECT source,
               CASE WHEN (cap.c * wt / n) >= 1.0 THEN 'ffffffffff'
                    ELSE lpad(lower(hex(CAST(floor((cap.c * wt / n) * 4294967296.0)
                                             AS BIGINT))), 8, '0')
               END AS thr
        FROM sized, cap
    )
    SELECT d.source, d.doc_id, d.lang
    FROM documents d JOIN rates USING (source)
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 1, 8) < thr
    """,
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling at T=2 over the source domains
    (operators/sampling.temperature_resample): share ∝ n^(1/2), the
    standard multilingual up-weighting of small domains with no
    upsampling. Same content-hash membership machinery as
    q_domain_mix, so the oracle replays acceptance row-for-row —
    including the pow/floor/hex threshold arithmetic."""
    from dbt_foundation_spark.operators.sampling import temperature_resample

    docs = t(spark, sf_dir, "documents").select("source", "doc_id", "lang")
    return temperature_resample(docs, "doc_id", "source", temperature=2.0)
