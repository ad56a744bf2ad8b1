"""Stateful streaming operators for the ingestion pipeline.

The reference's streaming story is incremental view maintenance
(maintainer.py); a 100 TB *ingestion* pipeline additionally needs
stream-time operators over the arriving feed itself. Spark-first
ladder, per the design rules:

1. Built-in operators where they express the semantics exactly:
   - `streaming_dedup` → `dropDuplicatesWithinWatermark` (keyed state
     with watermark TTL — state size bounded by the watermark horizon,
     not the stream length),
   - `sessionize` → `session_window` aggregation (gap-based session
     assignment is native; state = open sessions only).
2. `applyInPandasWithState` ONLY for what built-ins cannot express:
   `stateful_topk` keeps a per-key running top-k across micro-batches —
   a rank that must SURVIVE batch boundaries, which no built-in
   aggregate exposes incrementally. State per key is k rows (the heap),
   Arrow-batched, grouped by key — the plan shape that scales to any
   key cardinality because state is partitioned by the grouping key.

All three run identically under `trigger(availableNow)` batch-catchup
and continuous micro-batches (exactly-once with checkpointing).
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_dedup", "sessionize", "stateful_topk", "stream_enrich_latest"]


def streaming_dedup(
    stream: DataFrame,
    key_cols: Iterable[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact dedup over an unbounded stream: keep the first arrival of
    each key, drop repeats arriving within the watermark horizon.

    `dropDuplicatesWithinWatermark` bounds the dedup state by event
    time — the 100 TB property plain `dropDuplicates` lacks (its state
    grows with every distinct key forever)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def sessionize(
    stream: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessionization: one output row per (user, session)
    with start/end/event count. Native `session_window` keeps state
    only for OPEN sessions (closed ones emit and evict on watermark)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


_TOPK_STATE = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("scores", T.ArrayType(T.DoubleType())),
    ]
)
_TOPK_OUT = "key string, id long, score double, rank int"


def stateful_topk(stream: DataFrame, k: int = 5) -> DataFrame:
    """Running top-k per key across micro-batches — the custom-stateful
    case: a cross-batch rank no built-in streaming aggregate maintains.

    Input columns: (key string, id long, score double). Each
    micro-batch merges its rows into the key's persisted k-row heap and
    emits the key's CURRENT top-k (update semantics). State is k rows
    per key, partitioned by key — constant per-key memory at any stream
    length."""

    def merge(key: Tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            ids, scores = state.get
            ids, scores = list(ids), list(scores)
        else:
            ids, scores = [], []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["id"])
            scores.extend(float(x) for x in pdf["score"])
        order = sorted(
            range(len(ids)), key=lambda i: (-scores[i], ids[i])
        )[:k]
        ids = [ids[i] for i in order]
        scores = [scores[i] for i in order]
        state.update((ids, scores))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(ids),
                "id": ids,
                "score": scores,
                "rank": list(range(1, len(ids) + 1)),
            }
        )

    return stream.groupBy("key").applyInPandasWithState(
        merge,
        outputStructType=_TOPK_OUT,
        stateStructType=_TOPK_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_ENRICH_OUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("matched_ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)
_ENRICH_STATE = T.StructType(
    [
        T.StructField("sts", T.DoubleType()),  # epoch seconds
        T.StructField("val", T.DoubleType()),
    ]
)


def stream_enrich_latest(stream: DataFrame) -> DataFrame:
    """Streaming twin of `operators/events.asof_join`: enrich each
    arriving event with the latest state value at-or-before its
    timestamp — the classic stream-enrichment join (clicks × latest
    price, reading × latest calibration).

    Input: one stream of tagged rows
    (key string, ts timestamp, kind string in {'state','event'},
    event_id long, value double) — union the two feeds upstream,
    exactly like the batch operator's union-and-carry plan.

    Per key, the persisted state is ONE (ts, value) pair — the latest
    state row seen across all micro-batches. Within a batch, rows
    process in (ts, kind) order with 'state' first on ties, so an
    event at the same timestamp sees that state — the batch twin's
    "at or before" tie rule. An event older than every retained state
    ts emits NULL (single-value state cannot rewind; feed historical
    backfills through the batch asof_join instead). State per key is
    constant-size at any stream length."""

    def enrich(key, pdfs, state: GroupState):
        if state.exists:
            sts, val = state.get
        else:
            sts, val = None, None
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # SQL NULL semantics, mirroring the batch asof_join: a state
        # row with NULL ts can never satisfy "at or before" (and NaT
        # .timestamp() raises), a NULL-value state row would poison
        # the single-value state with NaN, and under SQL equality a
        # NULL key matches nothing — so in the NULL-key group every
        # state row is inert. Drop them; NULL-ts EVENT rows are kept
        # and emit NULL payloads (the batch twin carries NULL there).
        is_state = pdf["kind"] == "state"
        pdf = pdf[
            ~(
                is_state
                & (
                    pdf["ts"].isna()
                    | pdf["value"].isna()
                    | (key[0] is None)
                )
            )
        ]
        null_ts_events = pdf[(pdf["kind"] != "state") & pdf["ts"].isna()]
        pdf = pdf[pdf["ts"].notna()]
        # explicit tie key: state rows first at equal ts, so an event
        # at the state's exact timestamp sees it ("at or before")
        pdf = pdf.assign(
            __tag=(pdf["kind"] != "state").astype(int)
        ).sort_values(["ts", "__tag"], kind="mergesort")
        out = []
        for r in null_ts_events.itertuples(index=False):
            out.append(
                {
                    "key": key[0],
                    "event_id": int(r.event_id),
                    "ts": pd.NaT,
                    "matched_ts": pd.NaT,
                    "value": None,
                }
            )
        for r in pdf.itertuples(index=False):
            ets = r.ts.timestamp()
            if r.kind == "state":
                sts, val = ets, float(r.value)
            else:
                hit = sts is not None and sts <= ets
                out.append(
                    {
                        "key": key[0],
                        "event_id": int(r.event_id),
                        "ts": r.ts,
                        "matched_ts": (
                            pd.Timestamp(sts, unit="s") if hit else pd.NaT
                        ),
                        "value": val if hit else None,
                    }
                )
        if sts is not None:
            state.update((float(sts), float(val)))
        yield pd.DataFrame(
            out, columns=["key", "event_id", "ts", "matched_ts", "value"]
        )

    return stream.groupBy("key").applyInPandasWithState(
        enrich,
        outputStructType=_ENRICH_OUT,
        stateStructType=_ENRICH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
