"""Vector math over array<float|double> columns — JVM-side, no UDFs.

F.zip_with / F.aggregate compile to Catalyst higher-order functions:
the dot product of two 1024-dim embeddings is a tight JVM loop per row,
not a Python round-trip. Accumulation is sequential left-to-right in
array order — deterministic and engine-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_vec(vec: list[float]) -> Column:
    """A literal array<double> column from a Python vector, built as
    ONE parsed SQL expression (r14): the F.lit-per-element form costs a
    Py4J driver roundtrip per element — ~1000+ roundtrips per operation
    for a 16-centroid x 64-dim quantizer or a 16-plane LSH family,
    a measured ~0.5-0.7 s of driver constant on the IVF/embedding hot
    paths. ``repr(float)`` round-trips the exact IEEE double through
    Spark's parser (shortest-unique decimal -> parseDouble), so the
    literal values are bit-identical to F.lit's. Non-finite elements
    (no finite-vector quantizer produces them, but a hand-written
    store could) fall back to the element-wise form -- 'inf'/'nan'
    have no SQL literal."""
    import math

    if all(math.isfinite(x) for x in vec):
        return F.expr("array(" + ", ".join(f"{float(x)!r}D" for x in vec) + ")")
    return F.array(*[F.lit(float(x)) for x in vec])


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_double_array(col: Column | str) -> Column:
    return _c(col).cast("array<double>")


_INF = float("inf")


def finite_or_null(c: Column) -> Column:
    """NULL unless ``c`` is a finite double.

    The dirty-data contract for every vector-derived scalar (cosine,
    dot, distance): a corrupt input (NaN/±Inf element, NULL element,
    dimension mismatch) must surface as NULL — which ranking treats as
    absent (NULLS LAST) and threshold gates fail — never as NaN, which
    Spark ORDERS ABOVE +Inf and compares GREATER than any threshold.
    Without this, one corrupt embedding is the top-1 answer of every
    ANN query and a "near-duplicate" of everything in its candidate
    bucket (probed r10; pinned in tests/test_degenerate.py)."""
    return F.when(~F.isnan(c) & (F.abs(c) != F.lit(_INF)), c)


def is_finite_vector(col: Column | str) -> Column:
    """True iff the array is non-NULL and every element is a finite
    non-NULL double — the admission gate for quantization, index fit,
    and any path where a corrupt vector would otherwise poison shared
    state (centroid means, ANSI int casts) rather than just its own
    row. NULL input → NULL (filters treat it as fail)."""
    arr = to_double_array(col)
    return F.forall(
        arr, lambda x: x.isNotNull() & ~F.isnan(x) & (F.abs(x) != F.lit(_INF))
    )


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y)
    return finite_or_null(F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x))


def norm(a: Column | str) -> Column:
    sq = F.aggregate(
        F.transform(to_double_array(a), lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.sqrt(sq)


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either norm is zero (try_divide)
    or when the result is non-finite — NaN/Inf inputs (corrupt
    embeddings) yield NULL, not NaN, so they can never win a
    descending top-k or pass a ``>= threshold`` near-dup gate
    (see :func:`finite_or_null`).

    Single fused pass: one zip_with + one aggregate carries (x·y, |a|²,
    |b|²) in a struct accumulator — one array traversal per row instead
    of three, and each field sums in array order so results are
    bit-identical to the separate-pass formulation."""
    pairs = F.zip_with(
        to_double_array(a),
        to_double_array(b),
        lambda x, y: F.struct((x * y).alias("xy"), (x * x).alias("xx"), (y * y).alias("yy")),
    )
    acc0 = F.struct(
        F.lit(0.0).alias("d"), F.lit(0.0).alias("na"), F.lit(0.0).alias("nb")
    )
    sums = F.aggregate(
        pairs,
        acc0,
        lambda acc, p: F.struct(
            (acc["d"] + p["xy"]).alias("d"),
            (acc["na"] + p["xx"]).alias("na"),
            (acc["nb"] + p["yy"]).alias("nb"),
        ),
    )
    return finite_or_null(
        F.try_divide(sums["d"], F.sqrt(sums["na"]) * F.sqrt(sums["nb"]))
    )


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: (x - y) * (x - y))
    return finite_or_null(F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)))


def normalize(a: Column | str) -> Column:
    """Unit-normalize (NULL-safe: zero vector → NULL elements; a
    non-finite vector → NULL array, per :func:`is_finite_vector` —
    NaN must not survive into a "normalized" column that downstream
    math assumes is unit-length and finite).

    The norm is bound as a lambda variable (1-element transform) — a
    bare reference inside the per-element lambda would re-run the whole
    norm aggregate per element (O(dim²) per row)."""
    arr = to_double_array(a)
    return F.when(
        is_finite_vector(arr),
        F.get(
            F.transform(
                F.array(norm(a)),
                lambda n: F.transform(arr, lambda x: F.try_divide(x, n)),
            ),
            0,
        ),
    )


def mean(a: Column | str) -> Column:
    arr = to_double_array(a)
    return F.try_divide(
        F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x), F.array_size(arr)
    )


def int8_quantize(col: Column | str) -> Column:
    """Scalar (per-vector min/max) int8-range quantization:
    Struct(lo double, hi double, codes array<int> in [0, 255]).

    code_i = round((x_i − lo) / scale), scale = max((hi − lo)/255, 1e-12)
    — the degenerate constant vector quantizes to all-zero codes instead
    of dividing by zero. Dequantize: x̂_i = lo + code_i · scale.

    This is the storage/compute trade behind every large ANN deployment
    (4× smaller than float32, SIMD-friendly int math): at 100 TB of
    embeddings the quantized copy is what the candidate scan reads, with
    exact re-scoring on the shortlist only. Pure higher-order-function
    expression — lo/scale are bound ONCE through a 1-element transform
    (see :func:`normalize`), so cost is O(dim) per row, and every step
    is plain IEEE double arithmetic any engine reproduces bit-for-bit.

    Non-finite vectors (NaN/Inf/NULL element) quantize to NULL instead
    of aborting the scan: without the :func:`is_finite_vector` gate,
    ``hi`` becomes NaN/Inf, the code cast hits Spark 4's ANSI
    CAST_OVERFLOW, and ONE corrupt row kills the whole job — the same
    abort-vs-NULL contract the r9 dirty-JSON fix pinned for variants.
    """
    arr = to_double_array(col)
    lo = F.array_min(arr)
    hi = F.array_max(arr)
    scale = F.greatest((hi - lo) / F.lit(255.0), F.lit(1e-12))

    def build(b: Column) -> Column:
        return F.struct(
            b["lo"].alias("lo"),
            b["hi"].alias("hi"),
            F.transform(
                arr, lambda x: F.round((x - b["lo"]) / b["s"]).cast("int")
            ).alias("codes"),
        )

    bound = F.array(F.struct(lo.alias("lo"), hi.alias("hi"), scale.alias("s")))
    return F.when(is_finite_vector(arr), F.get(F.transform(bound, build), 0))


def hyperplane_signature(col: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: bit i = sign(v · plane_i),
    packed into a BIGINT bucket id. ``planes`` are fixed (seeded)
    driver-side constants — broadcast as literals, so the whole
    signature is one codegen'd expression. At 100 TB this turns an
    O(n²) similarity join into a bucketed equi-join."""
    v = to_double_array(col)
    bits = []
    for i, plane in enumerate(planes):
        p = lit_vec(plane)
        d = F.aggregate(F.zip_with(v, p, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
        bits.append(F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("bigint")
