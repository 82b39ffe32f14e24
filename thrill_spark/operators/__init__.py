"""DIA operator surface re-expressed as DataFrame transformations.

Each module cites the reference operator it provides parity with; none
of them port the reference's execution machinery — Catalyst/Tungsten
pick the physical strategy.
"""

from thrill_spark.operators.basic import (
    map_rows,
    filter_rows,
    flat_map,
    union_bag,
    bernoulli_sample,
)
from thrill_spark.operators.reduce import (
    reduce_by_key,
    group_by_key,
    hyperloglog,
)
from thrill_spark.operators.join import inner_join, join_dfs, asof_join
from thrill_spark.operators.actions import size, sum_action, min_action, max_action, all_reduce

__all__ = [
    "map_rows",
    "filter_rows",
    "flat_map",
    "union_bag",
    "bernoulli_sample",
    "reduce_by_key",
    "group_by_key",
    "hyperloglog",
    "inner_join",
    "join_dfs",
    "asof_join",
    "size",
    "sum_action",
    "min_action",
    "max_action",
    "all_reduce",
]
