"""Python user-defined TABLE functions (Spark 4 ``pyspark.sql.functions.udtf``).

Completes the engine's Python-extensibility surface: the custom batch
reader (``sources/python_source.py``), streaming reader, and two-phase-
commit writer cover the Data Source API; this module covers the TABLE
FUNCTION API — per-input-row expansion logic too imperative for Catalyst
higher-order functions, executed Arrow-batched on the executors and
invoked from SQL via ``LATERAL``.

The first instance is the document chunker: a byte-for-byte twin of the
pure-Catalyst ``operators.sampling.chunk_documents`` (same canonical
chunk count ``max(1, ceil((n - overlap) / stride))``, same whitespace
tokenization, same short tail), so both execution strategies pin against
the SAME DuckDB oracle (``ORACLE_CHUNKS``). In production the Catalyst
form wins (no Python at all — chunks stream out of the scan stage); the
UDTF form is the template for chunkers Catalyst cannot express (real BPE
tokenizers, sentence segmenters, layout-aware splitters), with the
per-partition batching and schema contract already proven correct.

Scale: a UDTF is a map-side generator — no shuffle is introduced; Arrow
moves rows to Python in columnar batches (``useArrow=True``), and output
flows straight into the next stage. The cost over Catalyst is the Python
round-trip only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.functions import udtf

CHUNK_UDTF_SCHEMA = "doc_id bigint, chunk_idx int, chunk_text string, n_tokens int"


@udtf(returnType=CHUNK_UDTF_SCHEMA, useArrow=True)
class ChunkTokensUDTF:
    """Fixed-token-window chunker with overlap; one input row -> N chunk
    rows. Tokenization replicates Spark's ``split(trim(text), '\\s+')``
    (blank text -> the single '' token, one empty chunk — consistent with
    the Catalyst twin and the oracle)."""

    def eval(self, doc_id, text, chunk_tokens: int, overlap_tokens: int):
        import re

        stride = chunk_tokens - overlap_tokens
        if stride <= 0:
            raise ValueError("overlap_tokens must be smaller than chunk_tokens")
        toks = re.split(r"\s+", (text or "").strip())
        # integer ceil((n - overlap) / stride), min 1 — a tail that fits
        # inside the previous chunk's overlap gets no redundant chunk
        n_chunks = max(1, -(-(len(toks) - overlap_tokens) // stride))
        for i in range(n_chunks):
            sl = toks[i * stride : i * stride + chunk_tokens]
            yield doc_id, i, " ".join(sl), len(sl)


def chunk_documents_udtf(
    df: DataFrame,
    chunk_tokens: int,
    overlap_tokens: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Run the chunker as a SQL LATERAL table function over ``df``."""
    spark = df.sparkSession
    spark.udtf.register("fis_chunk_tokens", ChunkTokensUDTF)
    view = "fis_chunk_udtf_input"
    df.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT c.* FROM {view}, "
        f"LATERAL fis_chunk_tokens({id_col}, {text_col}, "
        f"{int(chunk_tokens)}, {int(overlap_tokens)}) c"
    )
