"""distributed_mapreduce_spark — PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference engine Ky-Lee-375/Distributed_MapReduce
("MapleJuice": SDFS + maple/juice MapReduce + regex SELECT), plus the
large-scale training-data-pipeline operations (dedup, similarity search,
text analysis, multimodal plumbing, streaming) a 100 TB deployment needs.

Design stance (SURVEY.md §7.1):

- All relational work is declared with the DataFrame/SQL API so Catalyst
  does predicate pushdown, column pruning, join planning and AQE for free.
- The reference's infrastructure (gossip membership, SDFS replication,
  leader scheduling, scp shuffles) maps to Spark *runtime* features and is
  deliberately absent from this codebase.
- Python touches data only through Arrow-batched Pandas UDFs
  (`applyInPandas` / `mapInPandas`) on the MapleJuice generality surface
  and the multimodal stubs; every built-in operator stays JVM-side.
"""

from distributed_mapreduce_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
