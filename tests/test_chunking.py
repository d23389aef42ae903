"""Chunking: native vs UDTF equivalence, overlap semantics."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from my_favorite_etl_pipeline_spark.operators.chunking import (
    chunk_documents,
    make_chunk_udtf,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(f"w{i}" for i in range(120))),  # 3 chunks of 50
            Row(doc_id=2, text="only four tokens here"),                # 1 short chunk
            Row(doc_id=3, text=" ".join(f"x{i}" for i in range(50))),   # exactly 1 chunk
        ]
    )


def test_native_chunking(spark):
    out = chunk_documents(_docs(spark), chunk_size=50).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [r.n_tokens for r in sorted(by_doc[1], key=lambda r: r.chunk_idx)] == [50, 50, 20]
    assert by_doc[2][0].chunk_text == "only four tokens here"
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_tokens == 50


def test_overlap_chunking(spark):
    out = chunk_documents(_docs(spark).filter("doc_id = 1"), chunk_size=50, overlap=10).collect()
    rows = sorted(out, key=lambda r: r.chunk_idx)
    # step 40: chunks start at 0/40/80 → 50,50,40 tokens
    assert [r.n_tokens for r in rows] == [50, 50, 40]
    first, second = rows[0].chunk_text.split(" "), rows[1].chunk_text.split(" ")
    assert first[-10:] == second[:10]  # shared overlap region


def test_udtf_matches_native(spark):
    docs = _docs(spark)
    spark.udtf.register("chunk_text_udtf", make_chunk_udtf(chunk_size=50))
    docs.createOrReplaceTempView("chunk_docs_v")
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM chunk_docs_v d, LATERAL chunk_text_udtf(d.text) c
        """
    )
    native = chunk_documents(docs, chunk_size=50)
    assert via_udtf.exceptAll(native).count() == 0
    assert native.exceptAll(via_udtf).count() == 0
