"""Streaming exact-dedup — a custom stateful operator built on
`applyInPandasWithState` (the training-pipeline face of the batch
`dedup_exact` operator): the first document carrying a given
fingerprint passes through; every later duplicate — in the same or any
later micro-batch — is dropped. State is one tiny record per
fingerprint group and survives restarts via the query checkpoint.

Cross-batch winner semantics: FIRST ARRIVAL wins (append mode cannot
retract an already-emitted row), with lexicographic min(doc_id) as the
deterministic tie-break WITHIN a batch. Output equals the batch
`min(doc_id) GROUP BY fp` only when every duplicate of a fingerprint
lands in one micro-batch — gates that assert that equality must stage
their input as a single file (see stream_dedup_gate).

At 100 TB scale this is the canonical "dedup the firehose" shape: the
stream shuffles once on the fingerprint (the groupBy key), state is
per-key and O(1), and no batch-global structure exists anywhere.
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

DEDUP_OUT_SCHEMA = StructType([
    StructField("fp", StringType()),
    StructField("doc_id", StringType()),
])
DEDUP_STATE_SCHEMA = StructType([
    StructField("seen", LongType()),
])


def _first_seen(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Emit the group's first-ever doc (min doc_id within the batch for
    determinism); afterwards the `seen` state swallows every duplicate."""
    if state.exists:
        # fingerprint already emitted in an earlier batch — drop all
        for _ in pdfs:
            pass
        return iter(())
    best = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        cand = pdf["doc_id"].min()
        best = cand if best is None or cand < best else best
    if best is None:
        return iter(())
    state.update((1,))
    return iter([pd.DataFrame({"fp": [key[0]], "doc_id": [best]})])


def stream_dedup_exact(stream_docs: DataFrame,
                       fp_col: str = "fp",
                       id_col: str = "doc_id") -> DataFrame:
    """stream_docs: STREAMING DataFrame with at least (doc_id, fp).
    Returns the deduped (fp, doc_id) stream — attach writeStream with a
    checkpoint; state recovers on restart."""
    if not stream_docs.isStreaming:
        raise ValueError("stream_docs must be a streaming DataFrame")
    src = stream_docs.select(F.col(fp_col).alias("fp"),
                             F.col(id_col).alias("doc_id"))
    return src.groupBy("fp").applyInPandasWithState(
        _first_seen,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
