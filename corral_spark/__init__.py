"""corral_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``bcongdon/corral`` (reference at
/root/reference), re-expressed Spark-first.

The reference is a Go MapReduce-on-Lambda framework whose analytic
capability lives in user Map/Reduce functions (reference doc.go:1-16).
This package provides:

* ``corral_spark.session`` — tuned SparkSession builder (AQE, Arrow).
* ``corral_spark.sources`` — table/text/TSV readers and sinks matching
  the reference's I/O conventions (reference job.go:52-63, emitter.go:43).
* ``corral_spark.functions`` — scalar/vector helpers (tokenize, cosine).
* ``corral_spark.operators`` — dedup, similarity search, text analysis,
  multimodal plumbing, as-of join (north-star extensions).
* ``corral_spark.queries`` — the declared query registry: every operator
  from SURVEY.md §2 as a (Spark DataFrame fn, DuckDB oracle SQL) pair.
* ``corral_spark.mapreduce`` — a thin corral-compatible Job/Mapper/
  Reducer facade lowering to RDD flatMap/partitionBy/groupByKey
  (reference mapreduce.go:22-34).
* ``corral_spark.streaming`` — Structured Streaming ops over the
  ``events`` table (windows, sessions, watermarks).
"""

__version__ = "0.1.0"
