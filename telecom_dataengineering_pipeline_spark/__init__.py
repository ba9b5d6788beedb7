"""telecom_dataengineering_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``vibhu1510/telecom-dataengineering-pipeline``
(medallion Bronze→Silver→Gold telecom pipeline: Kafka CDR ingest, Spark
compaction, dbt/Trino transforms, Flink fraud detection, data-quality gates),
plus large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns).

Everything is expressed with the PySpark DataFrame/SQL API so Catalyst +
Tungsten own the physical plan; Python UDFs appear only where semantics
genuinely require them (stateful streaming, multimodal decode stubs).

Layout:
    session       SparkSession factory tuned for both local[.] tests and
                  large-cluster defaults (AQE, Arrow, UTC, parquet nanos).
    sources/      readers/writers/catalog for the driver's parquet tables and
                  telecom fixture generators.
    functions/    scalar column-expression library (Trino-dialect compat,
                  surrogate keys, PII masking, haversine, date spine, ...).
    operators/    relational/dataflow operators (dedup, star joins, rollups,
                  windows, merge/SCD, compaction, incremental filters, ...).
    plans/        pipeline DAG + medallion Bronze→Silver→Gold stages, lineage.
    streaming/    Structured Streaming ingest + stateful fraud detection.
    quality/      data-quality checks and observability monitors.
    llmprep/      training-data ops: dedup (exact/minhash/simhash/jaccard),
                  ANN similarity search, text analysis, multimodal columns.
    queries/      the named query registry exported via /root/repo/__spark_entry__.py
                  (each query paired with a DuckDB oracle SQL string).
"""

__version__ = "0.1.0"
