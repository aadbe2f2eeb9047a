"""botkop_telcotraffic_spark_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
telco-traffic streaming app (botkop/botkop-telcotraffic-spark) on
Spark DataFrame / SQL / Catalyst / Structured Streaming, extended
with large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal column plumbing).

Design rules (enforced throughout):
  * Declare plans with the DataFrame API; let Catalyst/Tungsten pick
    the physical strategy (whole-stage codegen, AQE, broadcast).
  * No row-at-a-time Python UDFs in hot paths. Everything that can be
    a JVM column expression is one; Pandas UDFs only where semantics
    genuinely require Python (none so far).
  * No .collect()-driven operators; every operator is a DataFrame ->
    DataFrame transformation that scales with partitions.
"""

__version__ = "0.1.0"
