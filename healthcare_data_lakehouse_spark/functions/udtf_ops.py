"""Python user-defined table functions (Spark 4 UDTF API).

The reference's extensibility surface is an arbitrary Python
``transform_fn: list[dict] -> list[dict]`` registry (reference
``src/etl/etl_manager.py:118-124``) — a row-multiplying transform
(one record in, N records out) has no vectorizable home there. On
Spark the idiomatic port of that shape is a UDTF: ``eval`` yields
any number of output rows per input row, the engine handles
distribution, and SQL callers invoke it like a built-in table
function — including LATERAL-correlated against a table column.

UDTFs are Python-evaluated (Arrow-batched), so they live OUTSIDE the
hot relational path by design, same policy as the multimodal decode
surface: use built-in array/explode functions when semantics allow
(see ``pipeline_rag_chunks`` for the codegen'd chunker twin); reach
for a UDTF only when per-row logic genuinely needs Python.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id: int, chunk: string, n_chars: int")
class ChunkText:
    """Fixed-width character chunker: one row per chunk.

    Lossless: concatenating chunks in chunk_id order reproduces the
    input exactly (the property the test asserts). Null/empty text
    yields no rows — the UDTF contract's row-multiplying semantics
    include zero.
    """

    def eval(self, text: str, size: int):  # noqa: D102
        if not text or size is None or size <= 0:
            return
        for i, start in enumerate(range(0, len(text), size)):
            piece = text[start : start + size]
            yield i, piece, len(piece)


@udtf(returnType="sent_id: int, sentence: string")
class SplitSentences:
    """Terminal-punctuation sentence splitter (., !, ? boundaries).

    The minimal text-segmentation primitive for per-sentence dedup /
    decontamination passes; deliberately heuristic — no model, no
    locale tables — so results are reproducible anywhere.
    """

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        buf = []
        sid = 0
        for ch in text:
            buf.append(ch)
            if ch in ".!?":
                sent = "".join(buf).strip()
                if sent:
                    yield sid, sent
                    sid += 1
                buf = []
        tail = "".join(buf).strip()
        if tail:
            yield sid, tail


def register_udtfs(spark) -> None:
    """Register the UDTFs so SQL can call them as table functions."""
    spark.udtf.register("chunk_text", ChunkText)
    spark.udtf.register("split_sentences", SplitSentences)
