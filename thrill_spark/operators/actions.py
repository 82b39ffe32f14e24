"""Scalar actions / collectives (thrill/api/dia.hpp:503-774).

Thrill's Size/Sum/Min/Max/AllReduce return a value to every worker via
net collectives (net/flow_control_channel.hpp:236-530); in Spark these
are driver-returning DataFrame actions.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def size(df: DataFrame) -> int:
    """Size (thrill/api/size.hpp:28)."""
    return df.count()


def sum_action(df: DataFrame, col: str, initial=0):
    """Sum (thrill/api/sum.hpp)."""
    v = df.agg(F.sum(col)).first()[0]
    return initial + (v if v is not None else 0)


def min_action(df: DataFrame, col: str):
    """Min (thrill/api/min.hpp:67)."""
    return df.agg(F.min(col)).first()[0]


def max_action(df: DataFrame, col: str):
    """Max (thrill/api/max.hpp:67)."""
    return df.agg(F.max(col)).first()[0]


def all_reduce(df: DataFrame, agg: Column):
    """AllReduce (thrill/api/all_reduce.hpp:28): arbitrary associative
    fold expressed as an aggregate expression; every 'worker' seeing the
    result maps to the driver broadcasting it (sc.broadcast) if needed."""
    return df.agg(agg).first()[0]


def gather(df: DataFrame, order_by: Sequence[str | Column] = ()) -> list:
    """Gather/AllGather (thrill/api/gather.hpp:28): collect to driver.
    Only for small results — actions, not transforms."""
    if order_by:
        df = df.orderBy(*[F.col(c) if isinstance(c, str) else c for c in order_by])
    return df.collect()
