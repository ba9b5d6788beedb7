"""UDF registration surface (SURVEY §2.11): pandas UDFs usable from SQL and
the DataFrame API, semantics checked against JVM built-ins / pure Python."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.functions.udfs import register_udfs


def test_register_and_call_from_sql(spark):
    names = register_udfs(spark)
    assert {"sigmoid", "luhn_valid"} <= set(names)
    rows = spark.sql(
        "SELECT sigmoid(CAST(id AS DOUBLE) - 2) AS s FROM range(5) ORDER BY id"
    ).collect()
    for r, x in zip(rows, range(-2, 3)):
        assert abs(r.s - 1.0 / (1.0 + math.exp(-x))) < 1e-12


def test_call_udf_dataframe_api(spark):
    register_udfs(spark)
    df = spark.createDataFrame(
        [("79927398713",), ("79927398710",), (None,)], ["imei"]
    ).withColumn("ok", F.call_udf("luhn_valid", F.col("imei")))
    got = {r.imei: r.ok for r in df.collect()}
    assert got["79927398713"] is True  # canonical Luhn-valid number
    assert got["79927398710"] is False
    assert got[None] is None


def test_sigmoid_matches_builtin_expression(spark):
    register_udfs(spark)
    df = spark.range(100).select((F.col("id") / 10.0 - 5.0).alias("x"))
    cmp = df.select(
        F.call_udf("sigmoid", F.col("x")).alias("udf"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("x")))).alias("builtin"),
    )
    bad = cmp.filter(F.abs(F.col("udf") - F.col("builtin")) > 1e-12).count()
    assert bad == 0
