"""Text-analysis primitives for LLM-data pipelines (SURVEY §2.L D4).

All pure Column expressions — tokenization, n-grams, hashing, language
scoring and quality metrics stay inside whole-stage codegen. At 100 TB a
Python tokenizer UDF would be the pipeline bottleneck; these are not.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Compact per-language marker sets (top function words). Real pipelines
# swap in fastText et al. via mapInPandas (operators/multimodal.py shows
# the plumbing); this marker scorer is the deterministic, JVM-side core.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "los"),
    "fr": ("le", "la", "de", "et", "que", "les", "des"),
    "de": ("der", "die", "das", "und", "zu", "den", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"),
}

_WS = r"\s+"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(col: Column | str) -> Column:
    """Whitespace tokens of the trimmed, lowercased text."""
    return F.split(F.lower(F.trim(_c(col))), _WS)


def token_count(col: Column | str) -> Column:
    return F.array_size(tokenize(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-style token estimate without a vocab: word-chunks plus
    non-alnum symbols each count; long words count ceil(len/4) pieces
    (the ~4-chars-per-token heuristic used for LLM budget estimates)."""
    words = F.split(F.trim(_c(col)), _WS)
    per_word = F.transform(
        words, lambda w: F.ceil(F.length(F.regexp_replace(w, r"[^\w]", "")) / 4)
        + F.length(F.regexp_replace(w, r"[\w]", ""))
    )
    return F.aggregate(per_word, F.lit(0).cast("bigint"), lambda acc, x: acc + x)


def _bind(value: Column, body) -> Column:
    """Evaluate ``value`` ONCE and pass it to ``body`` as a lambda
    variable (a 1-element transform). Any non-lambda-var expression
    inside a higher-order-function lambda is re-evaluated per element —
    binding turns an O(elements × cost(value)) evaluation into
    O(cost(value) + elements)."""
    return F.get(F.transform(F.array(value), body), 0)


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Character n-gram shingles of the normalized text (array<string>).

    NULL text → NULL, same contract as :func:`token_ngrams` (without
    the guard the sequence/greatest index fabrication yields a
    one-element ``[NULL]`` array, whose explode emits a NULL gram that
    co-buckets every NULL-text doc under ``xxhash64(NULL)``)."""

    def build(s: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1)))
        return F.when(
            s.isNull(), F.lit(None).cast("array<string>")
        ).otherwise(F.transform(idx, lambda i: F.substring(s, i, n)))

    return _bind(F.regexp_replace(F.lower(F.trim(_c(col))), _WS, " "), build)


def token_ngrams(
    col: Column | str, n: int = 3, max_tokens: int | None = None
) -> Column:
    """Token n-gram shingles (array<string>, space-joined).

    try_element_at past the end returns NULL and concat_ws drops NULLs,
    so short texts yield one shingle of all their tokens.

    ``max_tokens`` (r10 verdict #2) shingles only the document's FIRST
    ``max_tokens`` whitespace tokens — the giant-document guard for
    signature paths, where one pathological multi-hundred-MB document
    would otherwise materialize its entire shingle array (and its
    explode) inside a single task, an executor-OOM no plan-shape gate
    can see (per-row explode cannot split across tasks). Documents at
    or under the cap shingle identically to ``max_tokens=None``; the
    NULL-text → NULL contract is unchanged (``slice`` propagates
    NULL).

    NULL text → NULL (not ['']): the SQL-natural propagation every
    DuckDB oracle already follows (``string_split_regex(NULL)`` is
    NULL, ``unnest`` then drops the doc), and what simhash's
    aggregation does implicitly.  Without this guard the
    sequence/greatest index fabrication turned NULL into the same
    single empty shingle as the EMPTY text, so a NULL-text doc paired
    at jaccard 1.0 with every empty doc in minhash/containment while
    the oracle replay (and simhash) generated no candidates — a latent
    cross-engine divergence the testdata (no NULL texts) never
    exercised (r9 edge-case probe)."""

    def build(toks: Column) -> Column:
        cnt = F.array_size(toks)
        idx = F.sequence(F.lit(1), F.greatest(cnt - (n - 1), F.lit(1)))
        return F.when(
            toks.isNull(), F.lit(None).cast("array<string>")
        ).otherwise(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.try_element_at(toks, i + F.lit(j)) for j in range(n)]
                ),
            )
        )

    if n < 1:
        raise ValueError(
            f"n={n}: shingle length must be >= 1 — 0-token shingles are "
            "all empty strings, silently matching EVERY document to "
            "every other (r12 param-domain probe)"
        )
    toks = tokenize(col)
    if max_tokens is not None:
        if max_tokens < n:
            raise ValueError(
                f"max_tokens={max_tokens} below shingle length n={n}: "
                "every document would collapse to one partial shingle"
            )
        toks = F.slice(toks, 1, max_tokens)
    return _bind(toks, build)


def md5_hash64(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash via md5 — identical in any
    engine that has md5 (the cross-engine-verifiable alternative to
    xxhash64 for oracle-checked pipelines)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("bigint")


def fast_hash64(col: Column | str) -> Column:
    """xxhash64 (seed 42): deterministic, JVM-native, ~an order of
    magnitude cheaper than md5_hash64 (no hex round-trip). The right
    hash for engine-internal signatures (minhash/simhash banding) that
    no external oracle needs to reproduce."""
    return F.xxhash64(_c(col))


def fingerprint(col: Column | str) -> Column:
    """D4 document fingerprint: md5 of the whitespace-normalized,
    lowercased text (the exact-dup key that survives formatting noise)."""
    normalized = F.regexp_replace(F.lower(F.trim(_c(col))), _WS, " ")
    return F.md5(normalized)


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] | None = None) -> Column:
    toks = tokenize(col)
    sw = F.array(*[F.lit(w) for w in (stopwords or LANG_MARKERS["en"])])
    in_sw = F.filter(toks, lambda t: F.array_contains(sw, t))
    return F.size(in_sw) / F.greatest(F.array_size(toks), F.lit(1))


def punct_ratio(col: Column | str) -> Column:
    c = _c(col)
    n_punct = F.length(F.regexp_replace(c, r"[\w\s]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def uniq_token_ratio(col: Column | str) -> Column:
    toks = tokenize(col)
    return F.size(F.array_distinct(toks)) / F.greatest(F.array_size(toks), F.lit(1))


def dup_ngram_ratio(col: Column | str, n: int = 2) -> Column:
    """Gopher-style repetition signal: fraction of word n-grams that are
    duplicates of an earlier one (0 = all distinct, →1 = the document
    loops). The standard filter for boilerplate/generated text in
    training-data pipelines; pure Column arithmetic over the shingle
    array, no shuffle."""
    grams = token_ngrams(col, n)
    return F.lit(1.0) - F.try_divide(
        F.size(F.array_distinct(grams)), F.size(grams)
    )


def mean_token_length(col: Column | str) -> Column:
    toks = tokenize(col)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return total / F.greatest(F.array_size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic (Gopher/C4-style signals):
    length band, unique-token ratio, mean word length band, punctuation
    share. Deterministic arithmetic — oracle-expressible."""
    c = _c(col)
    n_tok = token_count(c)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 10000), 1.0).otherwise(0.0)
    uniq = uniq_token_ratio(c)
    mean_len = mean_token_length(c)
    word_ok = F.when((mean_len >= 2.0) & (mean_len <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(c) <= 0.3, 1.0).otherwise(0.0)
    return (len_ok + uniq + word_ok + punct_ok) / 4


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Marker-hit count per language (JVM-side; see LANG_MARKERS)."""
    toks = tokenize(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(col: Column | str) -> Column:
    """argmax over lang_scores with deterministic tiebreak (lang asc);
    'und' when no marker hits."""
    scores = lang_scores(col)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    # struct sort compares score first, then lang — desc sort means ties
    # resolve to the lexicographically-last language (deterministic)
    ordered = F.sort_array(pairs, asc=False)
    top = ordered.getItem(0)
    return F.when(top.score > 0, top.lang).otherwise(F.lit("und"))


def chunk_spans(toks: Column, chunk_tokens: int, stride: int) -> Column:
    """Chunk start indices (0-based) covering the token array with the
    given stride: i while i*stride < len."""
    n = F.array_size(toks)
    return F.sequence(F.lit(0), F.floor((n - 1) / F.lit(stride)).cast("int"))
