"""etl_hiscox_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the ``amajety1/etl-hiscox`` reference (medallion-architecture
insurance ETL: ingestion -> bronze -> silver cleaning -> gold aggregates ->
data-quality rules), extended with the operators a large-scale training-data
pipeline needs (dedup, similarity search, text analysis, streaming).

Design principles (see SURVEY.md §4, §7):
- DataFrame/SQL declarative plans; Catalyst does pushdown/pruning/join choice.
- No custom Catalyst rules; no RDDs; Python UDFs only where expressions
  cannot reach (vectorized pandas_udf, Arrow-batched).
- Deterministic operators everywhere an oracle comparison exists.
"""

from etl_hiscox_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
