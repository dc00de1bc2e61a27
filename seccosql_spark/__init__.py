"""seccosql_spark — a PySpark-native analytics engine with the query surface of
SeccoSQL (reference: H20Zhang/SeccoSQL, surveyed in SURVEY.md).

Design stance (SURVEY.md §7): a thin, typed Python layer over ``pyspark.sql``.
Catalyst/AQE owns analysis, optimization, codegen, shuffle and spill; this
package contributes only what Spark lacks:

- the reference's session / dataframe / graphframe API surface,
- SQL dialect extensions (``WITH RECURSIVE(n)``, ``UNION BYUPDATE``, ``MATCH``),
- GHD-based multiway-join planning above Catalyst,
- graph pattern matching + Pregel-style message passing,
- large-scale training-data pipeline operators (dedup, similarity search,
  text analysis, multimodal columns).

Everything executes as plain Spark DataFrame plans, so it scales with the
cluster by construction.
"""

from seccosql_spark.session import SeccoSession
from seccosql_spark.dataframe import SeccoDataFrame
from seccosql_spark.graph.graphframe import SeccoGraphFrame

__version__ = "0.1.0"

__all__ = ["SeccoSession", "SeccoDataFrame", "SeccoGraphFrame", "__version__"]
