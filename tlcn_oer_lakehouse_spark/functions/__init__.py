from tlcn_oer_lakehouse_spark.functions import ids, text, vectors  # noqa: F401
