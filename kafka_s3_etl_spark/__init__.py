"""kafka_s3_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of the reference project
``ElnazGhasemi/kafka-s3-etl`` (SQL->Kafka and S3 JSON->XML batch
pipelines), re-expressed Spark-first:

* the reference's Airflow DAG + XCom orchestration collapses into lazy
  DataFrame lineage (SURVEY.md section 3.3),
* its single SQL filter query (reference ``src/sql_to_kafka.py:147-151``)
  becomes the flagship typed filter+sort query,
* its Kafka producer (``src/sql_to_kafka.py:171-226``) becomes the Spark
  Kafka sink fed by ``to_json(struct(*))``,
* its JSON->XML document transform (``src/s3_json_to_xml.py:117-221``)
  becomes a deterministic renderer UDF with golden-file parity,

plus a full relational operator surface (joins, aggregates, windows, set
ops, semi-structured), Structured Streaming jobs, and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

Everything here derives from the public Apache Spark / PySpark API and
the reference repo's observable behavior only.
"""

__version__ = "0.1.0"
