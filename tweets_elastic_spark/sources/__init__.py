from tweets_elastic_spark.sources.catalog import load_table, load_tables

__all__ = ["load_table", "load_tables"]
