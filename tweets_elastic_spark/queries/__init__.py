"""Named query modules — importing this package registers every query."""

from tweets_elastic_spark.queries import (  # noqa: F401
    relational,
    search_q,
    text,
    windows_q,
)
