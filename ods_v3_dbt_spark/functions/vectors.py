"""Vector/embedding column functions (array<float|double> columns).

JVM-side expression implementations (``zip_with`` + ``aggregate``
fold) for correctness-grade paths, used by the similarity operators.
The throughput path for 100 TB corpora is the Arrow-batched numpy
kernel in ``operators.similarity`` — these expression forms exist so
small/medium paths need no Python at all and so semantics are
SQL-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either norm is 0."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def quantized(col: Column, scale: int = 1000) -> Column:
    """float vector → integer-quantized vector (round(x*scale)).

    Integer inner products are exact in any summation order — the
    declared, engine-portable similarity semantic (the float paths
    differ in last-ulp across engines).
    """
    return F.transform(col.cast("array<double>"), lambda x: F.round(x * scale).cast("bigint"))


def dot_quantized(a: Column, b: Column, scale: int = 1000) -> Column:
    """Exact integer inner product of quantized vectors."""
    return F.aggregate(
        F.zip_with(quantized(a, scale), quantized(b, scale), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def normsq_quantized(a: Column, scale: int = 1000) -> Column:
    """Exact integer squared norm of the quantized vector."""
    return dot_quantized(a, a, scale)


def cosine_ppm_quantized(
    dot_q: Column, normsq_a: Column, normsq_b: Column
) -> Column:
    """Cosine in parts-per-million from exact integer dot/norms.

    ``floor(dot_q * 1e6 / sqrt(na*nb))`` — the only float ops are one
    sqrt/divide over *identical integer inputs* in every engine, so the
    double result is bit-identical (IEEE) and ``floor`` (not round —
    half-up vs half-even traps) lands on the same integer. NULL on
    zero vectors.
    """
    denom = F.sqrt((normsq_a * normsq_b).cast("double"))
    return F.when(
        denom > 0, F.floor(dot_q.cast("double") * 1000000.0 / denom).cast("bigint")
    )
