"""Multi-format source/sink roundtrips: every supported format carries every
(representable) testdata table bit-for-bit — write from the parquet source,
schema-pinned FAILFAST read back, exact multiset equality both ways."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from searchengine_spark.sources import formats
from searchengine_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _nested(schema):
    return formats._has_nested(schema)


def _roundtrip(spark, tmp_path, name: str, fmt: str):
    src = load_table(spark, SF, name)
    path = os.path.join(str(tmp_path), f"{name}_{fmt}")
    formats.write_format(src, path, fmt)
    back = formats.read_format(spark, path, fmt, src.schema)
    assert back.schema == src.schema
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
@pytest.mark.parametrize("name", ["orders", "events", "documents", "embeddings"])
def test_roundtrip(spark, tmp_path, name, fmt):
    src_schema = load_table(spark, SF, name).schema
    if fmt == "csv" and _nested(src_schema):
        with pytest.raises(ValueError, match="CSV cannot carry nested"):
            formats.write_format(
                load_table(spark, SF, name), os.path.join(str(tmp_path), "x"), fmt
            )
        return
    _roundtrip(spark, tmp_path, name, fmt)


def test_convert_to_parquet_is_query_identical(spark, tmp_path):
    """The ingest-once path: a JSONL-landed documents table converted to
    parquet serves the same aggregate as the parquet original."""
    src = load_table(spark, SF, "documents")
    jdir = os.path.join(str(tmp_path), "docs_json")
    formats.write_format(src, jdir, "json")
    pq = formats.convert_to_parquet(
        spark, jdir, "json", src.schema, os.path.join(str(tmp_path), "docs_pq")
    )
    a = src.agg(F.count("*"), F.sum(F.length("text"))).collect()[0]
    b = pq.agg(F.count("*"), F.sum(F.length("text"))).collect()[0]
    assert tuple(a) == tuple(b)


def test_failfast_on_corrupt_json(spark, tmp_path):
    """A corrupt row fails the read loudly instead of nulling through."""
    path = os.path.join(str(tmp_path), "bad_json")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.json"), "w") as f:
        f.write('{"a": 1, "b": "x"}\n{"a": not-json\n')
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    with pytest.raises(Exception):
        formats.read_format(spark, path, "json", schema).collect()


def test_unknown_format_rejected(spark):
    src = load_table(spark, SF, "orders")
    with pytest.raises(ValueError, match="unsupported format"):
        formats.write_format(src, "/tmp/never", "avro")


def test_catalog_branch_roundtrip(spark, tmp_path):
    """The catalog branch of load_table (tables.py:38): saveAsTable the
    documents table into spark_catalog, re-read via the catalog.db.table
    identifier, and re-run a retrieval gate through it — identical results
    both paths (the production Iceberg path minus the Iceberg jar)."""
    import __spark_entry__ as entrymod

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS cat_test LOCATION '{tmp_path}/warehouse'"
    )
    try:
        src = load_table(spark, SF, "documents")
        src.write.mode("overwrite").saveAsTable("spark_catalog.cat_test.documents")
        via_cat = load_table(spark, "spark_catalog.cat_test", "documents")
        assert via_cat.count() == src.count()
        assert src.exceptAll(via_cat).count() == 0
        assert via_cat.exceptAll(src).count() == 0
        # a gate driven through the catalog identifier instead of the
        # parquet directory returns bit-identical rows
        a = entrymod.queries()["token_stats"](spark, SF).toPandas()
        b = entrymod.queries()["token_stats"](
            spark, "spark_catalog.cat_test"
        ).toPandas()
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        assert a.equals(b)
    finally:
        spark.sql("DROP DATABASE IF EXISTS cat_test CASCADE")
