from searchengine_spark.sources.tables import TESTDATA_TABLES, load_table  # noqa: F401
