"""Sources and sinks: parquet testdata tables, the reference's CSV and
nested-JSON inputs, Kafka (batch + streaming) and the single-document
XML sink."""

from kafka_s3_etl_spark.sources.tables import load_table, load_tables, register_views

__all__ = ["load_table", "load_tables", "register_views"]
