"""Pins the SURVEY §2.10 Python-eval surfaces not already exercised by
queries: scalar pandas_udf (Arrow-batched) and the physical operators
each form lowers to. Policy reminder the tests encode: these are the
fallback path — every oracle-path query must stay Catalyst-native
(asserted by test_plans.py::test_core_queries_avoid_python_row_udfs);
the surfaces here exist for semantics Spark genuinely lacks."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.test_plans import _plan


def test_scalar_pandas_udf_matches_reference_and_is_arrow(spark):
    """Scalar pandas_udf: erf tail probability (no Catalyst builtin for
    erf). Values must match math.erf exactly (same libm underneath) and
    the plan must show Arrow-batched eval, not row-pickled PythonUDF."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("double", PandasUDFType.SCALAR)
    def normal_tail(z):
        return pd.Series(
            [1.0 - 0.5 * (1.0 + math.erf(v / math.sqrt(2.0))) for v in z]
        )

    df = spark.range(100).select(
        (F.col("id") / 10.0 - 5.0).alias("z")
    ).withColumn("p", normal_tail("z"))
    plan = _plan(df)
    assert "ArrowEvalPython" in plan, plan
    for r in df.collect():
        expect = 1.0 - 0.5 * (1.0 + math.erf(r.z / math.sqrt(2.0)))
        assert r.p == expect


def test_grouped_agg_udaf_lowers_to_hash_aggregate_in_pandas(spark):
    """The weighted-median UDAF must plan as a (ObjectHash)Aggregate
    with a single shuffle on the group key — same exchange shape as a
    native aggregate, Python only inside the reduction."""
    from dvmax_spark.registry import all_queries

    df = all_queries()["a_weighted_median_udaf"].fn(
        spark, "/root/testdata/sf0.001"
    )
    plan = _plan(df)
    assert "ArrowAggregatePython" in plan or "AggregateInPandas" in plan, plan
    # one hash exchange on the group key, like any native aggregate
    # (the second exchange is the presentation orderBy's range part)
    assert plan.count("hashpartitioning(") == 1, plan


def test_udtf_lateral_join_matches_expression_chunker(spark):
    """The UDTF chunker and the Catalyst-expression chunker must agree
    byte for byte (same fingerprints, same row set)."""
    from dvmax_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    a = all_queries()["x_doc_chunks"].fn(spark, sf).toPandas()
    b = all_queries()["x_doc_chunks_udtf"].fn(spark, sf).toPandas()
    assert a[["doc_id", "chunk_idx", "chunk_tokens", "chunk_md5"]].equals(
        b[["doc_id", "chunk_idx", "chunk_tokens", "chunk_md5"]]
    )


def test_udtf_and_expression_chunker_agree_on_empty_text(spark):
    """'' splits to one empty token (one chunk with md5('')); only NULL
    text yields zero chunks — pinned for both chunker forms."""
    from dvmax_spark.ext.retrieval import doc_chunks

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "a b")], "doc_id long, text string"
    )
    expr = doc_chunks(df).toPandas()
    assert list(expr["doc_id"]) == [1, 3]
    assert expr.loc[0, "chunk_tokens"] == 1  # the single empty token
    import hashlib

    assert expr.loc[0, "chunk_md5"] == hashlib.md5(b"").hexdigest()
