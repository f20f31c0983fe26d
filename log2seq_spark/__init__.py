"""log2seq-spark: a PySpark-native parse → enrich → route → aggregate
engine with the query/data-processing capabilities of amulog/log2seq,
re-expressed Spark-first (DataFrame plans + Arrow-vectorized UDFs)."""

__version__ = "0.1.0"
