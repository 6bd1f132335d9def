from tlcn_oer_lakehouse_spark.sources.tables import TESTDATA_TABLES, load_table, load_tables  # noqa: F401
