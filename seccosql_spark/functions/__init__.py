"""Engine function surface — the analog of the reference's FunctionRegistry
(``catalog/FunctionRegistry.scala:80-108``, which registers exactly
arithmetic/comparison/boolean ops and min/max/sum/avg/count).

This engine exposes Spark's full ``pyspark.sql.functions`` (a strict
superset of §2.4's list — string/math/date/array/map/json/window functions
the reference lacks entirely) PLUS the engine-specific expression builders
defined by its operators:

- vector math over array columns: ``dot``, ``norm``, ``cosine``
- text expressions: tokenization, marker-hit counting, fingerprints
- dedup building blocks: word/shingle feature sets, minhash signatures,
  simhash, LSH bands

All are Column-level builders (JVM-side, codegen'd) — importable from one
place for users of the engine.
"""

from pyspark.sql import functions as F  # re-export: the full Spark surface

from seccosql_spark.operators.dedup import (
    candidate_pairs,
    exact_jaccard,
    lsh_bands,
    minhash_signatures,
    shingles,
    simhash,
    tokenize_words,
)
from seccosql_spark.operators.similarity import (
    cosine,
    dot,
    hyperplane_signs,
    lsh_hyperplane_bands,
    norm,
)

__all__ = [
    "F",
    "dot",
    "norm",
    "cosine",
    "tokenize_words",
    "shingles",
    "minhash_signatures",
    "lsh_bands",
    "candidate_pairs",
    "exact_jaccard",
    "simhash",
    "hyperplane_signs",
    "lsh_hyperplane_bands",
]
