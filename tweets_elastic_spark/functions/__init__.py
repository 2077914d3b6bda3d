from tweets_elastic_spark.functions.analyzers import (
    ANALYZERS,
    analyze,
    materialize_tokens,
)

__all__ = ["ANALYZERS", "analyze", "materialize_tokens"]
