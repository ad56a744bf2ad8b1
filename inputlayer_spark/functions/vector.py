"""Vector builtins as Spark Column expressions.

Parity targets (semantics, not code) from the reference
`/root/reference/src/vector_ops.rs`:
  euclidean :87, cosine :139 (returns 1 - similarity, i.e. a distance),
  dot :175, manhattan :194, hamming :232, normalize :390, vec_add :402,
  vec_scale :410, vec_dim :416, vector_norm :381,
  quantize_linear :450 (min-max → [-128,127]), quantize_symmetric :487
  (±max_abs → ±127, zero-preserving), dequantize :535, dequantize_scaled
  :547, int8 distances :562+, lsh_bucket :1038 (sign hash over
  deterministic per-table hyperplanes).

Everything is a JVM-side higher-order-function expression — no Python UDFs
— so whole-stage codegen applies and 100 TB scans stay vectorized.
All arithmetic is done in double precision (elements are cast) so results
match a float64 oracle to ~1e-12 regardless of input being float32.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: Column) -> Column:
    return x.cast("double")


def vec_dim(a: Column) -> Column:
    return F.size(a).cast("long")


def dot(a: Column, b: Column) -> Column:
    """Dot product; infinity on dimension mismatch (vector_ops.rs:175)."""
    raw = F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(F.size(a) != F.size(b), F.lit(float("inf"))).otherwise(raw)


def vector_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: _d(x) * _d(x)), F.lit(0.0), lambda acc, x: acc + x)
    )


def euclidean(a: Column, b: Column) -> Column:
    raw = F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return F.when(F.size(a) != F.size(b), F.lit(float("inf"))).otherwise(raw)


def manhattan(a: Column, b: Column) -> Column:
    raw = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(_d(x) - _d(y))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(F.size(a) != F.size(b), F.lit(float("inf"))).otherwise(raw)


def cosine(a: Column, b: Column) -> Column:
    """Cosine *distance* = 1 − cosine similarity (vector_ops.rs:139).

    Zero-norm input → distance 0.0 ("treat zero vectors as identical",
    vector_ops.rs:158-160); similarity clamped to [-1, 1] before the
    subtraction, as the reference does.
    """
    num = F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)), F.lit(0.0), lambda acc, x: acc + x
    )
    na, nb = vector_norm(a), vector_norm(b)
    sim = F.least(F.greatest(num / (na * nb), F.lit(-1.0)), F.lit(1.0))
    dist = F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(F.lit(1.0) - sim)
    return F.when(F.size(a) != F.size(b), F.lit(float("inf"))).otherwise(dist)


def hamming(a: Column, b: Column) -> Column:
    """Count of differing positions (vector_ops.rs:232)."""
    raw = F.size(F.filter(F.zip_with(a, b, lambda x, y: x != y), lambda t: t)).cast("long")
    return F.when(F.size(a) != F.size(b), F.lit(None).cast("long")).otherwise(raw)


def normalize(a: Column) -> Column:
    n = vector_norm(a)
    return F.when(n == 0.0, a.cast("array<double>")).otherwise(
        F.transform(a, lambda x: _d(x) / n)
    )


def vec_add(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: _d(x) + _d(y))


def vec_scale(a: Column, s: Column) -> Column:
    return F.transform(a, lambda x: _d(x) * _d(s))


# ------------------------------------------------------------ quantization


def quantize_linear(a: Column) -> Column:
    """Min-max quantize to int8: min→-128, max→127 (vector_ops.rs:450)."""
    mn = F.array_min(a).cast("double")
    mx = F.array_max(a).cast("double")
    rng = mx - mn
    return F.when(rng == 0.0, F.transform(a, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(
            a,
            lambda x: F.greatest(
                F.lit(-128.0),
                F.least(F.lit(127.0), F.round((_d(x) - mn) / rng * 255.0 - 128.0)),
            ).cast("tinyint"),
        )
    )


def quantize_symmetric(a: Column) -> Column:
    """Symmetric quantize: ±max_abs → ±127, 0 → 0 (vector_ops.rs:487)."""
    max_abs = F.array_max(F.transform(a, lambda x: F.abs(_d(x))))
    scale = F.lit(127.0) / max_abs
    return F.when(max_abs == 0.0, F.transform(a, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(
            a,
            lambda x: F.greatest(
                F.lit(-127.0), F.least(F.lit(127.0), F.round(_d(x) * scale))
            ).cast("tinyint"),
        )
    )


def dequantize(a: Column) -> Column:
    """int8 → double verbatim (vector_ops.rs:535)."""
    return F.transform(a, lambda x: _d(x))


def dequantize_scaled(a: Column, scale: Column) -> Column:
    return F.transform(a, lambda x: _d(x) * _d(scale))


# int8 distances are the same expressions — elements cast to double anyway.
euclidean_int8 = euclidean
cosine_int8 = cosine
dot_int8 = dot
manhattan_int8 = manhattan


# ------------------------------------------------------------ LSH

# Deterministic random-hyperplane sign hash. The reference caches seeded
# Gaussian hyperplanes per (table, bits, dim) (vector_ops.rs:1038-1097); we
# need the same determinism but JVM-side, so the "plane" coefficients are
# derived from a hash of (table, bit, dim-index) mapped to [-1, 1]. This is
# a valid random-hyperplane family (coordinates iid symmetric around 0) and
# is reproducible in any engine with xxhash64 — including the DuckDB oracle.


def _plane_coeff(table: int, bit: int, j: Column) -> Column:
    h = F.xxhash64(F.lit(int(table)), F.lit(int(bit)), j)
    # map i64 hash → uniform [-1, 1]
    return (h.cast("double") / F.lit(float(2**63))).cast("double")


def lsh_bucket(a: Column, table: int = 0, num_bits: int = 16) -> Column:
    """Sign-hash bucket id in [0, 2^num_bits) (vector_ops.rs:1038)."""
    num_bits = min(int(num_bits), 62)
    acc = F.lit(0).cast("long")
    for bit in range(num_bits):
        proj = F.aggregate(
            F.zip_with(
                a,
                F.transform(F.sequence(F.lit(0), F.size(a) - 1), lambda j: _plane_coeff(table, bit, j)),
                lambda x, p: _d(x) * p,
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        acc = acc + F.when(proj >= 0, F.lit(1 << bit).cast("long")).otherwise(F.lit(0).cast("long"))
    return acc


def lsh_probes(a: Column, table: int = 0, num_bits: int = 16) -> Column:
    """Bucket plus all 1-bit-flip neighbors (multi-probe; vector_ops.rs:1127)."""
    base = lsh_bucket(a, table, num_bits)
    probes = [base] + [base.bitwiseXOR(F.lit(1 << b).cast("long")) for b in range(min(num_bits, 62))]
    return F.array(*probes)


def lsh_multi_probe(a: Column, num_tables: int = 4, num_bits: int = 16) -> Column:
    """One bucket per table (vector_ops.rs:1392)."""
    return F.array(*[lsh_bucket(a, t, num_bits) for t in range(num_tables)])
