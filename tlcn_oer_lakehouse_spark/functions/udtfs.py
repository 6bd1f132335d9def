"""Python table functions (Spark 4 UDTF API) — the SQL-surface adapter
SURVEY §4 names as the one custom-extension candidate worth building: a
table-valued ``chunk_text()`` so SQL users can chunk documents with a
``LATERAL`` join instead of importing the DataFrame operator.

The semantics are byte-identical to the vectorized operator
(operators/chunking.py:token_window_chunks — trailing partial window
included, same normalization), and the DataFrame operator REMAINS the
production path: this module exists for the SQL API surface.  The UDTF
is declared ``useArrow=True`` so rows move in Arrow batches, not
pickled one at a time — the same transfer discipline as every
mapInPandas stage in the repo.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(
    returnType="chunk_order int, chunk_text string, chunk_tokens int",
    useArrow=True,
)
class ChunkTextUdtf:
    """1 row → N chunk rows: 50-token-style sliding windows with the
    trailing partial window kept (the U6 contract; silent tail loss was
    VERDICT r3 bug #4 — the UDTF shares the fixed semantics)."""

    def eval(self, text: str, window: int, stride: int):  # noqa: D102
        if text is None:
            return
        toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        n = len(toks)
        # identical 1-based start formula to the vectorized operator:
        # starts run to n, pruned to those adding new tokens
        starts = [
            s
            for s in range(1, max(1, n) + 1, stride)
            if s == 1 or s - stride + window - 1 < n
        ]
        for order, s in enumerate(starts):
            chunk = toks[s - 1 : s - 1 + window]
            yield order, " ".join(chunk), len(chunk)


def register_udtfs(spark: SparkSession) -> None:
    """Register every table function under its SQL name."""
    spark.udtf.register("chunk_text", ChunkTextUdtf)
