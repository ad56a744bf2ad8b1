"""Event-stream batch operators: as-of (point-in-time) join and
gap-based sessionization.

Spark has no native ASOF JOIN (kdb/DuckDB/Pandas `merge_asof`
semantics: for each left row, the right row with the greatest
timestamp <= the left timestamp, per key). The naive formulations —
a theta join `l.ts >= r.ts` + argmax, or a per-key crossJoin — are
O(n·m) shuffle explosions. The scalable formulation used here is the
union-and-carry pattern:

    union both sides tagged (right=0, left=1)
    one shuffle: partition by key, sort by (ts, tag, ...)
    carry the latest right-side payload forward with
        last(payload, ignorenulls=True) over rows-unbounded-preceding
    keep only left rows

One shuffle on the join key, linear work, no fan-out — the same plan
holds at 100 TB (AQE splits skewed keys; the window is
rows-bounded so state is O(1) per row). Tag order makes a right row
at exactly the left timestamp visible ("at or before").

Sessionization is the standard lag/cumsum pair: a session break is a
gap > `gap_s` from the previous event of the same key; the running
sum of breaks numbers the sessions. One shuffle on the key; the
streaming twin (native `session_window`) lives in
streaming/stateful.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_s(c):
    # fractional epoch seconds for TIMESTAMP and TIMESTAMP_NTZ alike
    # (NTZ has no direct numeric cast in Spark 4; the LTZ hop cancels
    # out in the differences these operators take)
    return c.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    payload_cols: Sequence[str],
    right_ts_alias: str = "matched_ts",
    tolerance_s: Optional[float] = None,
) -> DataFrame:
    """Point-in-time join: every `left` row gains the `payload_cols`
    of the most recent `right` row with the same key and
    `right.ts <= left.ts` (NULLs when no such row, or when it is
    older than `tolerance_s` seconds). `right` should be unique per
    (key, ts) — pre-aggregate if it is not; among equal timestamps
    the carry picks the last in (ts, tag) order, which is
    engine-dependent, so uniqueness is what makes the result
    well-defined (DuckDB's ASOF JOIN has the same caveat).

    Output: all `left` columns + `right_ts_alias` + `payload_cols`.

    NULL keys follow SQL equality (DuckDB ASOF JOIN semantics): a NULL
    left key never matches — including NULL-key right rows — so those
    left rows keep NULL payloads. (The window partitioning would
    otherwise group NULL with NULL, a semantic no SQL engine shares.)
    NULL-key left rows are routed AROUND the window entirely: on dirty
    data at scale they would all hash to the single NULL partition of
    the key-partitioned window — a skew bomb doing work whose answer
    is known to be NULL — so they get their NULL payloads attached
    narrowly and union back in (plan + behavior pinned in tests).
    """
    lcols = left.columns
    null_left = left.filter(F.col(key_col).isNull()).select(
        *lcols,
        F.lit(None).cast(right.schema[ts_col].dataType).alias(
            right_ts_alias
        ),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in payload_cols],
    )
    left = left.filter(F.col(key_col).isNotNull())
    payload = F.struct(
        F.col(ts_col).alias("__rts"),
        *[F.col(c) for c in payload_cols],
    )
    # SQL comparison semantics for NULLs: a NULL-key or NULL-ts right
    # row can never satisfy `l.k = r.k AND l.ts >= r.ts`; dropping them
    # up front makes the carry agree (left NULL-ts rows sort first in
    # the window, before every surviving right row, so they carry NULL)
    right = right.filter(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    r = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("__tag"),
        payload.alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (key_col, ts_col)],
    )
    l = left.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[F.col(c) for c in lcols if c not in (key_col, ts_col)],
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r.unionByName(l)
        .withColumn("__last", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    matched = F.col("__last")
    if tolerance_s is not None:
        fresh = (
            _epoch_s(F.col(ts_col)) - _epoch_s(matched["__rts"])
        ) <= tolerance_s
        matched = F.when(fresh, matched)
    return carried.select(
        *lcols,
        matched["__rts"].alias(right_ts_alias),
        *[matched[c].alias(c) for c in payload_cols],
    ).unionByName(null_left)


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_s: float,
    order_tiebreak: Optional[str] = None,
) -> DataFrame:
    """Gap-based sessionization: events of a key belong to the same
    session while consecutive gaps are <= `gap_s` seconds. Adds
    `session_seq` (0-based per-key session number). One shuffle on
    the key; `order_tiebreak` (e.g. the event id) makes the order —
    and therefore the numbering — total and deterministic when
    timestamps collide."""
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    gap = _epoch_s(F.col(ts_col)) - F.lag(
        _epoch_s(F.col(ts_col))
    ).over(w)
    brk = F.when(gap > gap_s, F.lit(1)).otherwise(F.lit(0))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_seq", F.sum(brk).over(wsum).cast("long")
    )
