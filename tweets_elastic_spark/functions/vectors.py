"""Vector math as JVM-side Column expressions (similarity-search support).

All arithmetic is promoted to double BEFORE multiplication (float×float
would lose precision differently than the oracle) and accumulated in array
order, so results are bit-comparable with an engine that does the same.
No Python in the hot path — these are codegen'd SQL higher-order functions;
a vectorized Pandas-UDF variant only pays off once NumPy BLAS beats codegen
on very wide vectors (≫1k dims), which 64-dim fixtures are far from.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def scale(a: Column, s: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double") * s)


def lit_vector(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])
