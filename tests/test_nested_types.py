"""Nested column kinds: struct flattening (hidden Present leaf preserves
struct nullability), array<bigint>, array<string> — the reference's
Kind::Struct/List subtype model (src/proto.rs:184-203)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from orc_format_spark import pipeline


def _roundtrip(spark, df, key="id"):
    stripes = pipeline.encode_dataframe(df, key, None, sort_keys=[key],
                                        stripe_rows=64)
    return pipeline.decode_dataframe(stripes, schema=df.schema)


def test_struct_roundtrip_with_null_structs(spark):
    df = spark.createDataFrame([
        (1, {"a": 10, "b": "x"}),
        (2, {"a": None, "b": "y"}),
        (3, None),
        (4, {"a": -7, "b": None}),
    ], schema="id long, s struct<a:long,b:string>")
    got = _roundtrip(spark, df).orderBy("id").collect()
    assert got == df.orderBy("id").collect()


def test_array_int_and_string_roundtrip(spark):
    df = spark.createDataFrame([
        (1, [1, 2, 3], ["p", "qq", ""]),
        (2, [], None),
        (3, None, ["z"]),
        (4, [-(10**12), 0, 10**12], ["unicode-é中", "ok"]),
    ], schema="id long, li array<bigint>, ls array<string>")
    got = _roundtrip(spark, df).orderBy("id").collect()
    assert got == df.orderBy("id").collect()


def test_two_structs_and_mixed(spark):
    df = spark.createDataFrame([
        (1, {"x": 1.5}, {"k": "a", "n": 3}, "plain"),
        (2, None, {"k": "b", "n": None}, "text"),
    ], schema=("id long, p struct<x:double>, "
               "q struct<k:string,n:long>, t string"))
    got = _roundtrip(spark, df).orderBy("id").collect()
    assert got == df.orderBy("id").collect()


def test_deep_nesting_raises(spark):
    df = spark.createDataFrame(
        [(1, {"inner": {"x": 1}})],
        schema="id long, s struct<inner:struct<x:long>>")
    with pytest.raises(Exception, match="nests deeper"):
        _roundtrip(spark, df).count()


def test_strided_lists(spark):
    rows = [(i, list(range(i % 5)), [f"w{j}" for j in range(i % 3)])
            for i in range(500)]
    df = spark.createDataFrame(rows, schema="id long, li array<bigint>, ls array<string>")
    stripes = pipeline.encode_dataframe(df, "id", None, sort_keys=["id"],
                                        stripe_rows=500, index_rows=100)
    got = (pipeline.decode_dataframe(stripes, schema=df.schema)
           .orderBy("id").collect())
    assert got == df.orderBy("id").collect()


def test_map_roundtrip(spark):
    df = spark.createDataFrame([
        (1, {"k1": "v1", "k2": "v2"}),
        (2, {}),
        (3, None),
    ], schema="id long, props map<string,string>")
    got = _roundtrip(spark, df).orderBy("id").collect()
    assert got == df.orderBy("id").collect()  # {} and None stay distinct


def test_null_array_elements_raise_clearly(spark):
    df = spark.createDataFrame([(1, ["a", None, "b"])],
                               schema="id long, ls array<string>")
    with pytest.raises(Exception, match="null elements INSIDE"):
        _roundtrip(spark, df).count()
