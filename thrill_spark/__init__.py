"""thrill_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Thrill (thrill/thrill), re-expressed
Spark-first.

Thrill's single abstraction is the DIA (Distributed Immutable Array), a
lazily-evaluated DAG of ~45 functional operators over an *ordered*
distributed array (reference: thrill/api/dia.hpp:127-141). This package
maps that surface onto the DataFrame/SQL API:

- relational ops (Map/Filter/FlatMap/ReduceByKey/GroupByKey/InnerJoin/
  Union/...) -> native DataFrame transformations (Catalyst optimizes);
- ordered-array ops (Zip/ZipWithIndex/PrefixSum/Window/Sort/Merge/
  ReduceToIndex) -> an explicit ``_idx`` ordering discipline
  (``thrill_spark.ordering``) built on scalable two-phase patterns
  (never a global single-partition window);
- actions (Size/Sum/Min/Max/AllReduce/Gather) -> DataFrame actions;
- plus LLM-data-pipeline extensions the reference lacks: dedup (exact /
  minhash-LSH / simhash / n-gram jaccard), similarity search,
  text analysis, multimodal column plumbing, event-time windows.

Nothing here is a port of the reference's C++ execution engine; the
physical execution (shuffle, spill, codegen, AQE) is Spark's.
"""

from thrill_spark.session import get_spark
from thrill_spark.catalog import load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]

__version__ = "0.1.0"
