"""Named query modules — importing this package registers every query."""

from tweets_elastic_spark.queries import relational, search_q, text  # noqa: F401
