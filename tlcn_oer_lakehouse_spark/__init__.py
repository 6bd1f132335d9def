"""tlcn_oer_lakehouse_spark — a PySpark-native analytics engine.

A clean-room, Spark-first re-design of the capabilities of the reference
OER Lakehouse (``hoangtien94huee/TLCN_OER_Lakehouse``): medallion ETL
(bronze JSON → silver curated tables → gold star schema), hierarchical
document chunking, hybrid lexical+vector retrieval, incremental MERGE
semantics, plus the large-scale training-data operators (dedup families,
ANN similarity search, text analysis, multimodal plumbing) the reference's
domain implies at 100 TB scale.

Everything is expressed with the DataFrame/SQL API so Catalyst owns the
physical plan; Python only runs inside Arrow-batched pandas UDFs on the
genuinely non-relational paths (PDF text, chunking, embeddings).
"""

__version__ = "0.1.0"

from tlcn_oer_lakehouse_spark.session import get_spark  # noqa: F401
