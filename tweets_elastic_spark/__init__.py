"""tweets_elastic_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference project kuko6/tweets-elastic (relational denormalization into nested
documents, text-analyzer pipelines, an ES-DSL-like search layer, id-keyed
batched sinks, incremental ingestion), re-expressed Spark-first on the
DataFrame / SQL / Structured Streaming APIs, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) such an engine needs at 100 TB.

Layout:
    session.py            SparkSession factory with scale-aware defaults
    schemas.py            declared StructTypes (strict schemas, SURVEY §1.2)
    sources/              table catalog, fixture synthesis, incremental scans
    operators/            denormalize, dedup, similarity
    functions/            analyzers, text stats, vector math, multimodal
    plans/                search-query layer (ES-DSL analogue → DataFrame plan)
    streaming/            windowed aggs + foreachBatch incremental ingest
    sinks.py              id-keyed writer with quarantine channel
"""

__version__ = "0.1.0"
