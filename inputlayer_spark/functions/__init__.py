"""Builtin function registry: IQL builtin name → Column-expression builder.

Mirrors the closed builtin set of the reference (`BuiltinFunc::parse`,
/root/reference/src/ast/mod.rs:199-267). Every entry takes Column args and
returns a Column; the compiler evaluates IQL `Call` terms through this
table. There is deliberately no UDF mechanism, same as the reference.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import Column
from pyspark.sql import functions as F

from inputlayer_spark.functions import temporal, text, vector

__all__ = ["BUILTINS", "temporal", "text", "vector"]


def _substr(s: Column, start: Column, length: Column) -> Column:
    # IQL substr is 0-based (docs/spec); SQL substring is 1-based.
    return F.substring(s, start.cast("int") + 1, length.cast("int"))


BUILTINS: Dict[str, Callable[..., Column]] = {
    # vector distance
    "euclidean": vector.euclidean,
    "cosine": vector.cosine,
    "dot": vector.dot,
    "manhattan": vector.manhattan,
    "hamming": vector.hamming,
    "euclidean_int8": vector.euclidean_int8,
    "cosine_int8": vector.cosine_int8,
    "dot_int8": vector.dot_int8,
    "manhattan_int8": vector.manhattan_int8,
    # vector algebra
    "normalize": vector.normalize,
    "vec_add": vector.vec_add,
    "vec_scale": vector.vec_scale,
    "vec_dim": vector.vec_dim,
    "vector_norm": vector.vector_norm,
    # quantization
    "quantize_linear": vector.quantize_linear,
    "quantize_symmetric": vector.quantize_symmetric,
    "dequantize": vector.dequantize,
    "dequantize_scaled": vector.dequantize_scaled,
    # LSH (table/bits/probe params arrive as plain ints from the compiler;
    # signatures mirror the reference codegen: lsh_bucket(v, table, bits),
    # lsh_probes(bucket, bits, probes), lsh_multi_probe(v, table, bits,
    # probes) — code_generator/mod.rs:2990-3099)
    "lsh_bucket": lambda v, table=0, bits=16: vector.lsh_bucket(v, _as_int(table), _as_int(bits)),
    "lsh_multi_probe": lambda v, table=0, bits=16, probes=8: vector.lsh_multi_probe(
        v, _as_int(table), _as_int(bits), _as_int(probes)
    ),
    "lsh_probes": lambda b, bits=16, probes=8: vector.lsh_probes(
        b, _as_int(bits), _as_int(probes)
    ),
    # temporal
    "time_now": temporal.time_now,
    "time_diff": temporal.time_diff,
    "time_add": temporal.time_add,
    "time_sub": temporal.time_sub,
    "time_decay": temporal.time_decay,
    "time_decay_linear": temporal.time_decay_linear,
    "time_before": temporal.time_before,
    "time_after": temporal.time_after,
    "time_between": temporal.time_between,
    "within_last": temporal.within_last,
    "intervals_overlap": temporal.intervals_overlap,
    "interval_contains": temporal.interval_contains,
    "interval_duration": temporal.interval_duration,
    "point_in_interval": temporal.point_in_interval,
    # math
    "abs": F.abs,
    "abs_int64": lambda x: F.abs(x.cast("long")),
    "abs_float64": lambda x: F.abs(x.cast("double")),
    "sqrt": F.sqrt,
    "pow": F.pow,
    "log": F.log,
    "exp": F.exp,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "floor": lambda x: F.floor(x).cast("long"),
    "ceil": lambda x: F.ceil(x).cast("long"),
    "sign": lambda x: F.signum(x.cast("double")),
    # conversion
    "to_float": lambda x: x.cast("double"),
    "to_int": lambda x: x.cast("long"),
    # scalar min/max
    "min_val": F.least,
    "max_val": F.greatest,
    # string
    "len": lambda s: F.length(s).cast("long"),
    "upper": F.upper,
    "lower": F.lower,
    "trim": F.trim,
    "substr": _substr,
    "replace": lambda s, find, repl: F.replace(s, find, repl),
    "concat": F.concat,
}


def _as_int(c) -> int:
    """Extract a Python int from a literal Column (LSH table/bit params)."""
    if isinstance(c, int):
        return c
    # Column wrapping lit(n): pull from the expression; compiler passes
    # plain ints for these, this is a defensive fallback.
    try:
        return int(str(c._jc.expr().eval(None)))  # type: ignore[attr-defined]
    except Exception as exc:  # pragma: no cover
        raise ValueError("LSH table/bits parameters must be integer literals") from exc
