"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming at all (SURVEY §2.9) — this is part of
the engine's superset surface: arbitrary per-key state carried across
micro-batches, the Structured Streaming analogue of a Thrill user
writing a stateful reduce in C++.

Pattern notes for scale:
- State lives in the state store, partitioned by key — no driver state,
  no global ordering requirement.
- The update function sees Arrow batches per key (not per row).
- A GroupStateTimeout can evict idle keys (bounded state at 100 TB/day
  key cardinality); kept NoTimeout here for deterministic tests.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id long, n_events long, total double"
_STATE_SCHEMA = "n long, total double"


def _update_running(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total": [total]})


def stream_running_totals(stream: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-key running (count, sum) maintained across micro-batches.

    Emits the updated running totals for every key seen in each batch
    (output mode: update).
    """
    return (
        stream.select(key, "value")
        .groupBy(key)
        .applyInPandasWithState(
            _update_running,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
