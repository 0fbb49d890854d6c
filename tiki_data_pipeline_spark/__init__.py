"""tiki_data_pipeline_spark — PySpark-native analytics engine.

A from-scratch re-expression of the query / data-processing
capabilities of the reference pipeline (SeikoP/tiki-data-pipeline,
surveyed in SURVEY.md) as idiomatic PySpark: DataFrame / Spark SQL
first, Catalyst-optimized, Pandas UDFs only where built-ins can't
express the semantics, Structured Streaming for the incremental
paths.

Layout
------
- ``session``    SparkSession builder tuned for local[N] and cluster use
- ``io``         table loaders over the driver-generated parquet tables
- ``functions``  scalar function library (parse/normalize/url/text)
- ``operators``  relational, hierarchy, merge/upsert, CDC, dedup,
                 similarity, text-analysis, multimodal operators
- ``plans``      named queries (the engine's query API) + star builder
- ``streaming``  Structured Streaming variants (windows, stateful dedup)
"""

__version__ = "0.1.0"
