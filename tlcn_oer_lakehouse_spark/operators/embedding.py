"""Distributed embedding generation — U10 (elasticsearch_sync.py:357-405)
without the reference's driver funnel.

The reference streamed EVERY row to the driver (``toLocalIterator``) and
ran the E5 model there — its biggest scalability sin (SURVEY §3.3).
Here embedding happens inside executors via an iterator-of-series pandas
UDF: the "model" is initialized once per worker process (the
model-per-executor lifecycle of a real sentence-transformer), rows
arrive as Arrow batches, vectors leave as ``array<double>`` columns.

The model in this container is a deterministic hash embedder (the real
model download is not available offline): dimension i of a text's vector
is ``int(md5(text ':' i)[:8], 16) / 2^32 - 0.5``, L2-normalized.  Every
operation is exact in IEEE-754 (integer, power-of-two division, subtract)
so the same math is replayable in any engine — which keeps the
distributed plumbing oracle-verifiable.  Swapping ``HashEmbedder`` for a
sentence-transformers model changes nothing structurally.

Scale: embarrassingly parallel, zero shuffle, no driver involvement;
batch size is governed by Arrow (`maxRecordsPerBatch`), model load cost
amortizes over the executor lifetime.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class HashEmbedder:
    """Deterministic stand-in for a sentence-transformer: stable across
    processes, exact in any engine.  dim defaults to 16 to keep oracle
    replication cheap; a real model would be 384/768-d."""

    def __init__(self, dim: int = 16) -> None:
        self.dim = dim

    def encode_one(self, text: str) -> list[float]:
        raw = [
            int(hashlib.md5(f"{text}:{i}".encode()).hexdigest()[:8], 16)
            / 4294967296.0
            - 0.5
            for i in range(self.dim)
        ]
        norm = math.sqrt(sum(x * x for x in raw))
        return [x / norm for x in raw] if norm > 0 else raw

    def encode_batch(self, texts: pd.Series) -> pd.Series:
        return texts.map(self.encode_one)

    def encode(self, texts: list[str]):
        """The sentence-transformers batch API (model.encode(sentences) →
        sequence of vectors) so this stand-in is call-compatible with a
        real pretrained model (elasticsearch_sync.py:397 calls exactly
        this surface)."""
        return [self.encode_one(t) for t in texts]


def embed_text_udf(dim: int = 16, model_factory=None):
    """Iterator-of-series pandas UDF with once-per-worker model init.

    ``model_factory`` is a zero-arg callable executed once per Python
    worker process returning any object exposing the sentence-transformers
    surface ``encode(list[str]) -> sequence of float vectors`` (numpy
    arrays accepted).  Default: the deterministic :class:`HashEmbedder`.
    Passing ``lambda: SentenceTransformer("intfloat/multilingual-e5-base")``
    is the production path — nothing else changes.
    """
    factory = model_factory if model_factory is not None else (
        lambda: HashEmbedder(dim)
    )

    @F.pandas_udf("array<double>")
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = factory()  # loaded once per python worker
        for texts in batches:
            vecs = model.encode(texts.fillna("").tolist())
            yield pd.Series([[float(x) for x in v] for v in vecs])

    return _embed


def embed_documents(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 16,
    out_col: str = "embedding",
    model_factory=None,
) -> DataFrame:
    return df.withColumn(
        out_col, embed_text_udf(dim, model_factory)(F.col(text_col))
    )
