"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference accumulates per-capture node/byte counters while it walks a
capture (har2tree.py stats fields); in a continuous-arrival world the same
accumulation is arbitrary keyed state across micro-batches — exactly what
``applyInPandasWithState`` provides beyond built-in windowed aggregation.

``doc_progress`` keeps, per doc_id, the running span count / byte total /
max offset seen so far, and emits the cumulative row each time the doc
receives new spans. State is a fixed-width tuple (no growing collections),
so memory per key is O(1) and the operator scales with the state store,
not the stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_spans", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
        T.StructField("max_offset", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("b", T.LongType()),
        T.StructField("mo", T.LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, b, mo = state.get if state.exists else (0, 0, -1)
    for pdf in pdfs:
        n += len(pdf)
        b += int(pdf["nbytes"].fillna(0).sum())
        if len(pdf):
            mo = max(mo, int(pdf["offset"].max()))
    state.update((n, b, mo))
    yield pd.DataFrame(
        {"doc_id": [key[0]], "n_spans": [n], "total_bytes": [b], "max_offset": [mo]}
    )


def doc_progress(spans: DataFrame) -> DataFrame:
    """Streaming DataFrame of (doc_id, span_idx-ish rows with nbytes,
    offset) -> cumulative per-doc progress rows (update semantics)."""
    return spans.groupBy("doc_id").applyInPandasWithState(
        _update,
        PROGRESS_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
