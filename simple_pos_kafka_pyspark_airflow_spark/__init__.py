"""spark_graft — a PySpark-native analytics engine.

A brand-new engine with the query / data-processing capability set of the
reference POS pipeline (``SSSukontachawat/simple-pos-kafka-pyspark-airflow``),
re-expressed Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
Structured Streaming for the Kafka/CDC surface, and Pandas-UDF-backed
operators only where built-ins cannot express the semantics
(LLM-data-pipeline extensions: dedup, similarity search, text analysis,
multimodal columns).

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, shuffle tuning)
- ``schemas``    explicit StructType registry (no inferSchema anywhere)
- ``catalog``    testdata/warehouse table loading
- ``operators``  relational operators: project/filter/join/agg/sort/setops/
                 window/upsert
- ``functions``  scalar/text/vector column-expression builders
- ``sources``    batch + streaming sources and sinks (parquet, csv, kafka)
- ``plans``      the contract-query registry (driver verification surface)
- ``streaming``  structured-streaming pipelines: ingest, CDC, state, windows
- ``llm``        large-scale training-data ops: dedup, simsearch, text,
                 multimodal
"""

__version__ = "0.1.0"
