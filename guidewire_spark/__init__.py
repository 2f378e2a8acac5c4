"""guidewire_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
``databricks-industry-solutions/guidewire`` (reference at /root/reference):

* ``sources/`` — the Guidewire CDA → Delta connector pipeline (manifest
  parsing, incremental discovery, schema inference, Delta transaction-log
  generation, checkpointing) plus a Delta snapshot/time-travel reader.
  Mirrors ``Guidewire.scala`` semantics (cited per-function) but is
  architected for Spark: metadata ops stay driver/thread-side, all data
  movement is declarative DataFrame plans.
* ``operators/`` — the relational query surface the connector's output
  enables (SURVEY.md §2.4) plus LLM-data-pipeline operators (§2.5):
  dedup (exact / MinHash-LSH / SimHash / Jaccard), similarity search,
  text analysis, multimodal column plumbing.
* ``functions/`` — reusable column expressions (vector math, text
  metrics) built from ``pyspark.sql.functions`` so they stay JVM-side.
* ``plans/`` — SparkSession construction tuned for scale (AQE, shuffle
  partitioning) and the table catalog for the test datasets.
* ``streaming/`` — Structured Streaming composition helpers (windowed
  aggregation, watermarking, stateful dedup) over the produced tables.
"""

__version__ = "0.1.0"
