"""Document chunking: fixed token windows with overlap.

Context-window preparation for embedding / training pipelines: each
document becomes ``ceil(n / stride)``-ish overlapping chunks of at most
``chunk_tokens`` whitespace tokens, keyed ``(doc_id, chunk_idx)`` so
chunk identity is stable across runs and partitions.

Implementation is one ``posexplode`` over a generated start-offset
sequence — per-row array algebra feeding a flatMap-shaped explode:
zero shuffles, scan-speed at 100 TB, and the chunk count per document
is data-derived (no driver round trip). Tail behavior: starts walk
``0, stride, 2·stride, …`` while ``start < n``, so the final chunk may
be short — callers that need full windows filter ``n_tokens`` (kept as
a column for exactly that).

Tokenization is the corpus-wide whitespace contract
(:func:`..operators.text_analysis.ws_tokens`), so chunk boundaries are
consistent with token budgets elsewhere (packing.py, text_ranking.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import ws_tokens


def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 64, stride: int = 48
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_text) — overlapping windows.

    ``stride`` < ``chunk_tokens`` gives ``chunk_tokens - stride``
    tokens of overlap between consecutive chunks. Empty documents
    yield one empty chunk (chunk_idx 0) so no document silently
    disappears from the corpus."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    from ..plans.partitioning import spread

    toked = spread(docs).select("doc_id", ws_tokens().alias("toks"))
    # Start offsets 0, stride, … strictly below n (n>=1 always: the
    # whitespace split of '' is ['']).
    chunks = toked.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - 1, {stride}), "
                f"s -> slice(toks, s + 1, {chunk_tokens}))"
            )
        ).alias("chunk_idx", "chunk_toks"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size("chunk_toks").alias("n_tokens"),
        F.concat_ws(" ", "chunk_toks").alias("chunk_text"),
    )
