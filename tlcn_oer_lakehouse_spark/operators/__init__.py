from tlcn_oer_lakehouse_spark.operators import dedup, incremental, similarity  # noqa: F401
