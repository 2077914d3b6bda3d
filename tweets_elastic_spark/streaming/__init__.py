from tweets_elastic_spark.streaming.windows import (
    session_counts,
    sliding_counts,
    tumbling_counts,
)

__all__ = ["session_counts", "sliding_counts", "tumbling_counts"]
