"""Named query modules — importing this package registers every query."""

from tweets_elastic_spark.queries import (  # noqa: F401
    curation_q,
    dedup_q,
    esql_q,
    indexed_q,
    multimodal_q,
    relational,
    search_q,
    text,
    tweetdoc_q,
    windows_q,
)
