"""Python UDTF surface (Spark 3.5+/4 user-defined table functions).

The engine's built-in operators deliberately avoid Python in the hot
path, but a complete engine must still expose the UDTF extension point:
users port row-to-rows logic (parsers, chunkers, un-nesters) that has no
Column-expression form. These are Arrow-batched where Spark supports it
(``useArrow=True``) and registered under stable SQL names so SQL-string
models can LATERAL-join them.

Scale note: a UDTF runs in Python workers — partition-parallel but
off-codegen. Keep them OFF joins' build sides and prefer the Column
formulations (e.g. q_doc_chunks' zero-shuffle slice) when one exists;
the UDTF twin exists for API parity and for logic that genuinely needs
imperative Python.
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="chunk_idx int, chunk_text string", useArrow=True)
class TextChunksUDTF:
    """Overlapping token windows (``size`` tokens, stride ``stride``) —
    the UDTF twin of the Column-based chunker in q_doc_chunks."""

    def eval(self, text: str, size: int, stride: int):  # noqa: D102
        if text is None:
            return
        toks = text.strip().lower().split()
        if not toks:
            yield 0, ""
            return
        i = 0
        while i * stride < len(toks):
            yield i, " ".join(toks[i * stride : i * stride + size])
            i += 1


@udtf(returnType="param string, value string", useArrow=True)
class UrlParamsUDTF:
    """One row per query-string parameter of a URL (order preserved)."""

    def eval(self, url: str):  # noqa: D102
        if url is None or "?" not in url:
            return
        query = url.split("?", 1)[1].split("#", 1)[0]
        for pair in query.split("&"):
            if not pair:
                continue
            k, _, v = pair.partition("=")
            yield k, v


def register_udtfs(spark) -> None:
    """Register the UDTF surface under stable SQL names."""
    spark.udtf.register("text_chunks", TextChunksUDTF)
    spark.udtf.register("url_params", UrlParamsUDTF)
