from tweets_elastic_spark.plans.search import (
    Bool,
    Exists,
    FunctionScore,
    Match,
    MatchAll,
    Nested,
    Range,
    Term,
    search,
)

__all__ = [
    "Bool", "Exists", "FunctionScore", "Match", "MatchAll", "Nested",
    "Range", "Term", "search",
]
