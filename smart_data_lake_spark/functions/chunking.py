"""Document chunking for LLM training / RAG ingestion.

Splits each document into fixed-size character windows with overlap — the
standard pre-tokenization chunking step of a training-data or embedding
pipeline. Pure Catalyst: strided offsets via `sequence`, window extraction
via `substring`, fan-out via `posexplode` — a narrow rowwise transform with
zero shuffles that scales linearly with corpus bytes on any number of
executors (each output chunk lives on the same partition as its parent doc).

Reference parity: the reference expresses row-fanout transforms through its
generic transformer surface (sdl-core CustomDfTransformer); chunking itself
is a standard public technique (e.g. LangChain's CharacterTextSplitter
semantics: size + overlap, last chunk may be short).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_chars: int = 200,
    overlap: int = 50,
    out_col: str = "chunk_text",
) -> DataFrame:
    """Explode each document into overlapping character windows.

    Adds `chunk_id` (0-based, per document), `chunk_start` (1-based char
    offset, matching SQL substring indexing), `n_chunks`, and `out_col`.
    Every chunk starts at 1 + chunk_id*(chunk_chars-overlap); the final chunk
    may be shorter than chunk_chars; empty documents yield one empty chunk so
    no row is silently dropped.
    """
    if overlap >= chunk_chars:
        raise ValueError(f"overlap ({overlap}) must be < chunk_chars ({chunk_chars})")
    stride = chunk_chars - overlap
    c = F.col(text_col)
    n = F.length(c)
    # last start offset: the largest 1 + k*stride that still begins new text,
    # i.e. k = ceil(max(n - chunk_chars, 0) / stride) -- computed with integer
    # arithmetic so both engines agree exactly
    last_k = F.floor((F.greatest(n - F.lit(chunk_chars), F.lit(0)) + F.lit(stride - 1)) / F.lit(stride))
    starts = F.transform(
        F.sequence(F.lit(0), last_k.cast("int")),
        lambda k: F.lit(1) + k * F.lit(stride),
    )
    exploded = df.select(
        "*", F.posexplode(starts).alias("chunk_id", "chunk_start")
    )
    return exploded.withColumns(
        {
            out_col: F.substring(c, F.col("chunk_start"), F.lit(chunk_chars)),
            "n_chunks": (last_k + 1).cast("int"),
        }
    )
