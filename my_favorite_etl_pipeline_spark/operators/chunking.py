"""Document chunking for LLM context windows ([EXT] X4-adjacent).

Splits each document into fixed-size token chunks with overlap — the
standard pre-embedding segmentation step in a training-data/RAG pipeline.

Two implementations with one semantics:

- :func:`chunk_documents` — native: slice the token array with
  sequence+transform, posexplode the chunk array. Stays in codegen, scales
  linearly, and is the production path.
- :func:`ChunkTextUDTF` — the same as a Python UDTF (Spark 4 table
  function): one input row → N output rows from Python. Exists to lock the
  UDTF surface (SURVEY §2.10) and as the template for chunkers that need a
  real tokenizer; the unit test pins it row-identical to the native path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_array(text_col: Column | str, chunk_size: int = 50, overlap: int = 0) -> Column:
    """Array of space-joined token chunks; consecutive chunks share
    ``overlap`` tokens. Pure column expression — no explode yet."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    step = chunk_size - overlap
    toks = tokens(text_col)
    n_chunks = F.greatest(F.ceil((F.size(toks) - F.lit(overlap)) / F.lit(step)), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.array_join(F.slice(toks, i * step + 1, chunk_size), " "),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 50,
    overlap: int = 0,
) -> DataFrame:
    """Native chunker: (doc_id, chunk_idx, chunk_text, n_tokens) per chunk.

    posexplode fans out rows; everything upstream is map-side column work.
    At 100 TB the chunk table is written partitioned by a hash of doc_id so
    downstream embedding jobs co-locate a document's chunks.
    """
    return docs.select(
        F.col(id_col),
        F.posexplode(chunk_array(F.col(text_col), chunk_size, overlap)).alias(
            "chunk_idx", "chunk_text"
        ),
    ).withColumn("n_tokens", F.size(tokens(F.col("chunk_text"))))


def make_chunk_udtf(chunk_size: int = 50, overlap: int = 0):
    """Build the UDTF class (Spark 4 ``@udtf``) for the same chunking.

    Returned class is registered with ``spark.udtf.register`` and used as a
    table function: ``SELECT ... FROM docs, LATERAL chunk_text(text)``.
    """
    from pyspark.sql.functions import udtf

    step = chunk_size - overlap

    @udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
    class ChunkTextUDTF:
        def eval(self, text: str):  # noqa: D102 — UDTF contract method
            if text is None:
                return
            toks = text.split(" ")
            i = 0
            idx = 0
            while True:
                chunk = toks[i : i + chunk_size]
                if not chunk and idx > 0:
                    break
                yield idx, " ".join(chunk), len(chunk)
                idx += 1
                i += step
                if i >= len(toks):
                    break

    return ChunkTextUDTF
