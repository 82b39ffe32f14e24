"""Arbitrary stateful streaming on Spark 4's transformWithState API.

The successor to applyInPandasWithState (which streaming/stateful.py
uses): a StatefulProcessor with named, schema'd state variables the
engine checkpoints per key. Thrill has no streaming surface at all;
this is the Spark-native path for custom per-key streaming state
machines (running aggregates, sessionizers, CDC reducers).

RunningCountProcessor keeps one ValueState counter per key and emits
the per-micro-batch delta plus the running total — totals are
correct regardless of how the input is chopped into batches, which is
what the oracle checks (stream ≡ batch).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningCountProcessor(StatefulProcessor):
    """Per-key running row counter: state = one bigint ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("cnt", "cnt bigint")

    def handleInputRows(self, key, rows, timerValues):
        delta = 0
        for pdf in rows:
            delta += len(pdf)
        prev = self._count.get()
        total = (prev[0] if prev is not None else 0) + delta
        self._count.update((total,))
        yield pd.DataFrame(
            {"user_id": [key[0]], "delta": [delta], "running": [total]}
        )

    def close(self) -> None:
        pass


def has_transform_with_state() -> bool:
    """The transformWithState driver worker imports google.protobuf;
    without it the streaming runner crashes at init (observed:
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE -> ImportError
    'cannot import name descriptor from google.protobuf'). Probe once
    so callers can fall back to applyInPandasWithState
    (streaming/stateful.py), which has no such dependency."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False
