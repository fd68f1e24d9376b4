"""flink_tpcds_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of the reference Flink/Blink TPC-DS
fork (312223105/flink-tpcds, surveyed in /root/repo/SURVEY.md) as an
idiomatic Spark SQL / DataFrame engine:

- ``session``    — tuned SparkSession factory (AQE, CBO, broadcast,
                   shuffle sizing) mirroring the reference's optimizer
                   posture (TpcDsBatchExecITCase.scala:71-78).
- ``schemas``    — explicit StructType registry + parquet/CSV loaders
                   (the reference's TpcDsSchemaProvider/CsvTableSource2).
- ``functions``  — scalar-function gap layer over FlinkSqlOperatorTable.
- ``operators``  — first-class wrappers for the §2 operator inventory
                   (top-n, dedup, rank, as-of join, interval join, …).
- ``queries``    — the benchmark query corpus (TPC-H-shaped analytics
                   suite + operator battery) with DuckDB oracle SQL.
- ``datapipe``   — beyond-reference LLM-data-pipeline operators
                   (dedup, similarity search, text analysis, multimodal).
- ``streaming``  — Structured Streaming layer (watermarks, windows,
                   streaming dedup / joins / top-n).
"""

__version__ = "0.1.0"
