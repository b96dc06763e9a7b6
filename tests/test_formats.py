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
