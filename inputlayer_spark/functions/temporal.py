"""Temporal builtins as Column expressions over Unix-ms longs.

Parity targets: `/root/reference/src/temporal_ops.rs` (time_now :14,
time_diff :29, time_add :42, time_sub :55, time_decay :91,
time_decay_linear :122, time_before :139, time_after :145,
time_between :159, within_last :173, intervals_overlap :191,
interval_contains :204, interval_duration :217, point_in_interval :230).

Timestamps are i64 Unix milliseconds throughout, like the reference
(`Value::Timestamp`, src/value/mod.rs:222). `to_ms` converts Spark
timestamp columns into that domain.
"""

from __future__ import annotations

import time

from pyspark.sql import Column
from pyspark.sql import functions as F

_L = "long"


def to_ms(ts: Column) -> Column:
    """Spark timestamp → Unix ms long.

    `unix_micros` over a TIMESTAMP cast handles TIMESTAMP_NTZ too (the
    NTZ→LTZ cast is identity under the engine's UTC session timezone,
    matching DuckDB's epoch_ms on naive timestamps); Spark 4 forbids a
    direct NTZ→DOUBLE cast."""
    return (F.unix_micros(ts.cast("timestamp")) / F.lit(1000)).cast(_L)


def time_now() -> Column:
    """Wall-clock now in ms. Engine injects a fixed clock in tests."""
    return F.lit(int(time.time() * 1000))


def time_diff(t1: Column, t2: Column) -> Column:
    return (t1.cast(_L) - t2.cast(_L)).cast(_L)


def time_add(ts: Column, duration_ms: Column) -> Column:
    return (ts.cast(_L) + duration_ms.cast(_L)).cast(_L)


def time_sub(ts: Column, duration_ms: Column) -> Column:
    return (ts.cast(_L) - duration_ms.cast(_L)).cast(_L)


def time_decay(ts: Column, now: Column, half_life_ms: Column) -> Column:
    """Exponential decay: 0.5 ** (age / half_life), clamped to 1.0 for the
    future, 0/1 for non-positive half-life (temporal_ops.rs:91)."""
    age = now.cast(_L) - ts.cast(_L)
    weight = F.pow(F.lit(0.5), age.cast("double") / half_life_ms.cast("double"))
    return (
        F.when(half_life_ms.cast(_L) <= 0, F.when(ts.cast(_L) >= now.cast(_L), 1.0).otherwise(0.0))
        .when(age <= 0, F.lit(1.0))
        .otherwise(weight)
    )


def time_decay_linear(ts: Column, now: Column, max_age_ms: Column) -> Column:
    """Linear decay to 0 at max_age (temporal_ops.rs:122)."""
    age = now.cast(_L) - ts.cast(_L)
    frac = F.lit(1.0) - age.cast("double") / max_age_ms.cast("double")
    return (
        F.when(max_age_ms.cast(_L) <= 0, F.when(ts.cast(_L) >= now.cast(_L), 1.0).otherwise(0.0))
        .when(age <= 0, F.lit(1.0))
        .otherwise(F.greatest(F.lit(0.0), frac))
    )


def time_before(t1: Column, t2: Column) -> Column:
    return t1.cast(_L) < t2.cast(_L)


def time_after(t1: Column, t2: Column) -> Column:
    return t1.cast(_L) > t2.cast(_L)


def time_between(ts: Column, start: Column, end: Column) -> Column:
    return (ts.cast(_L) >= start.cast(_L)) & (ts.cast(_L) <= end.cast(_L))


def within_last(ts: Column, now: Column, duration_ms: Column) -> Column:
    """ts within [now - duration, now] (temporal_ops.rs:173)."""
    age = now.cast(_L) - ts.cast(_L)
    return (age >= 0) & (age <= duration_ms.cast(_L))


def intervals_overlap(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    return (s1.cast(_L) <= e2.cast(_L)) & (s2.cast(_L) <= e1.cast(_L))


def interval_contains(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    """[s1,e1] fully contains [s2,e2] (temporal_ops.rs:204)."""
    return (s1.cast(_L) <= s2.cast(_L)) & (e2.cast(_L) <= e1.cast(_L))


def interval_duration(start: Column, end: Column) -> Column:
    return (end.cast(_L) - start.cast(_L)).cast(_L)


def point_in_interval(ts: Column, start: Column, end: Column) -> Column:
    return (ts.cast(_L) >= start.cast(_L)) & (ts.cast(_L) <= end.cast(_L))
