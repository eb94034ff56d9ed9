"""Python UDTF surface (Spark 4): row-multiplying table functions
callable from SQL, including LATERAL-correlated invocation — the
engine's port of the reference's arbitrary ``transform_fn`` registry
for one-to-many record transforms (reference
``src/etl/etl_manager.py:118-124``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_data_lakehouse_spark.functions.udtf_ops import register_udtfs
from healthcare_data_lakehouse_spark.tables import table


def test_chunk_text_lateral_is_lossless(spark, sf_dir):
    register_udtfs(spark)
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.createOrReplaceTempView("udtf_docs")
    chunks = spark.sql("""
        SELECT d.doc_id, c.chunk_id, c.chunk, c.n_chars
        FROM udtf_docs d, LATERAL chunk_text(d.text, 64) c
    """)
    # reassembling chunks in order reproduces every document exactly
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("chunk_id", "chunk")))
                .getField("chunk")
            ).alias("rebuilt"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
    joined = docs.join(rebuilt, "doc_id")
    bad = joined.filter(F.col("text") != F.col("rebuilt")).count()
    assert bad == 0
    # chunk width respected
    assert chunks.filter(F.col("n_chars") > 64).count() == 0
    assert chunks.count() >= docs.count()


def test_split_sentences_covers_text(spark, sf_dir):
    register_udtfs(spark)
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.createOrReplaceTempView("udtf_docs2")
    sents = spark.sql("""
        SELECT d.doc_id, s.sent_id, s.sentence
        FROM udtf_docs2 d, LATERAL split_sentences(d.text) s
    """)
    rows = sents.collect()
    assert rows
    # sentence ids are dense from 0 within each doc
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.sent_id)
    for doc_id, ids in by_doc.items():
        assert sorted(ids) == list(range(len(ids))), doc_id
    # no sentence loses its non-whitespace content
    total_src = (
        docs.select(
            F.sum(F.length(F.regexp_replace("text", r"\s", ""))).alias("n")
        ).first()[0]
    )
    total_sent = (
        sents.select(
            F.sum(F.length(F.regexp_replace("sentence", r"\s", ""))).alias("n")
        ).first()[0]
    )
    assert total_sent == total_src


def test_udtf_empty_and_null_inputs_yield_no_rows(spark):
    register_udtfs(spark)
    spark.sql(
        "SELECT * FROM VALUES (1, ''), (2, CAST(NULL AS STRING)) t(id, txt)"
    ).createOrReplaceTempView("udtf_edge")
    out = spark.sql("""
        SELECT e.id, c.chunk_id
        FROM udtf_edge e, LATERAL chunk_text(e.txt, 8) c
    """)
    assert out.count() == 0
