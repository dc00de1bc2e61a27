"""UDF / UDAF surface (SURVEY.md §2.5): the reference registers scalar UDFs
and UDAFs through its FunctionRegistry (``catalog/FunctionRegistry.scala:19``,
``expression/aggregate/UDAF.scala:248-517``). Here:

- scalar UDFs: Arrow-batched ``pandas_udf`` (the fast path — 10-100× over
  row-at-a-time) and one deliberately row-at-a-time ``F.udf`` on a tiny dim
  to cover the registration API;
- UDAF: ``pandas_udf`` grouped aggregation (median), the modern replacement
  for the reference's MutableAggregationBuffer machinery.

Oracle notes: median interpolates identically in pandas and DuckDB; the
vector-norm UDF rounds before comparison (numpy's pairwise summation vs
sequential sums differ in the last bit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from seccosql_spark.registration import register
from seccosql_spark.session import SeccoSession


@pandas_udf(T.DoubleType())
def _l2_norm(v: pd.Series) -> pd.Series:
    return v.map(lambda arr: float(np.sqrt((np.asarray(arr, dtype="float64") ** 2).sum())))


@register(
    "udf_pandas_vector_norm",
    """SELECT vec_id, round(sqrt(list_dot_product(embedding::DOUBLE[],
                                                  embedding::DOUBLE[])), 6) AS norm
       FROM embeddings""",
)
def udf_pandas_vector_norm(sess: SeccoSession):
    """Arrow-batched scalar pandas UDF over an array<float> column."""
    emb = sess.spark.table("embeddings")
    return sess.from_spark(
        emb.select("vec_id", F.round(_l2_norm("embedding"), 6).alias("norm"))
    )


@pandas_udf(T.DoubleType())
def _median(v: pd.Series) -> float:
    return float(v.median())


@register(
    "udaf_median_price",
    """SELECT o_orderpriority, round(median(o_totalprice), 4) AS med
       FROM orders GROUP BY o_orderpriority""",
)
def udaf_median_price(sess: SeccoSession):
    """Grouped-agg pandas UDAF (median) — exact order-statistic, so the
    oracle matches bit-for-bit (both interpolate the middle pair)."""
    orders = sess.spark.table("orders")
    return sess.from_spark(
        orders.groupBy("o_orderpriority").agg(
            F.round(_median("o_totalprice"), 4).alias("med")
        )
    )


@register(
    "udf_rowwise_registered",
    "SELECT r_regionkey, upper(r_name) || '!' AS shout FROM region",
)
def udf_rowwise_registered(sess: SeccoSession):
    """Row-at-a-time registered UDF (FunctionRegistry.registerFunction
    analog) — kept to a 5-row dimension; the hot path never does this."""
    sess.spark.udf.register("shoutify", lambda s: s.upper() + "!", T.StringType())
    return sess.spark.sql("SELECT r_regionkey, shoutify(r_name) AS shout FROM region")
