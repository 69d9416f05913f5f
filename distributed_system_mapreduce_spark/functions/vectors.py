"""Vector expressions over array<float> embedding columns.

Cosine is computed as an explicit left fold with per-element double
casts so the float->double widening and the summation order are
IDENTICAL in Spark (aggregate/zip_with) and DuckDB (list_reduce/
list_transform) — the values are bit-identical, which lets the
oracle gate hash-verify ANN results (normally impossible with
float math).

Random-hyperplane LSH uses +-1 plane weights derived from md5 hex
digits (w[p][j] = +1 iff first hex digit of md5('p:j') >= '8'), the
same deterministic construction on both engines.
"""

from __future__ import annotations

DIM = 64
N_PLANES = 8


def dot_expr(a: str, b: str) -> str:
    """Spark SQL: strict left-fold dot product in double."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def dot_sql(a: str, b: str) -> str:
    """DuckDB twin of dot_expr (list_reduce is the same left fold)."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), "
        f"(acc, x) -> acc + x)"
    )


def dist2_expr(a: str, b: str) -> str:
    """Spark SQL: strict left-fold squared L2 distance in double."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def dist2_sql(a: str, b: str) -> str:
    """DuckDB twin of dist2_expr (same fold, same order)."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
        f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def norm_expr(a: str) -> str:
    return f"sqrt({dot_expr(a, a)})"


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def _plane_weights_expr(p: int) -> str:
    return (
        f"transform(sequence(1, {DIM}), j -> CASE WHEN "
        f"substring(md5(concat('{p}:', CAST(j AS STRING))), 1, 1) >= '8' "
        f"THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)"
    )


def _plane_weights_sql(p: int) -> str:
    return (
        f"list_transform(range(1, {DIM + 1}), j -> CASE WHEN "
        f"substr(md5('{p}:' || j), 1, 1) >= '8' "
        f"THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)"
    )


def lsh_bucket_expr(a: str) -> str:
    """Spark SQL: 8-char sign-bit bucket id from 8 random hyperplanes."""
    bits = [
        f"CASE WHEN {dot_expr(a, _plane_weights_expr(p))} > 0 "
        f"THEN '1' ELSE '0' END"
        for p in range(N_PLANES)
    ]
    return "concat(" + ", ".join(bits) + ")"


def lsh_bucket_sql(a: str) -> str:
    bits = [
        f"CASE WHEN {dot_sql(a, _plane_weights_sql(p))} > 0 "
        f"THEN '1' ELSE '0' END"
        for p in range(N_PLANES)
    ]
    return " || ".join(bits)


# Banded LSH (the minhash-LSH banding recipe applied to hyperplane
# sign sketches): band b's bucket = the sign pattern of planes
# [b*planes_per_band, (b+1)*planes_per_band). A candidate pair needs
# agreement on ALL planes of SOME band — recall rises from the
# single-bucket (1-θ/π)^planes to 1-(1-(1-θ/π)^ppb)^bands, at the cost
# of bands× bucket joins. Tune planes_per_band ~ log2(n/target_bucket)
# as the corpus grows to keep per-band buckets constant-sized.
def lsh_band_bucket_expr(a: str, band: int, planes_per_band: int) -> str:
    bits = [
        f"CASE WHEN {dot_expr(a, _plane_weights_expr(p))} > 0 "
        f"THEN '1' ELSE '0' END"
        for p in range(band * planes_per_band, (band + 1) * planes_per_band)
    ]
    return "concat(" + ", ".join(bits) + ")"


def lsh_band_bucket_sql(a: str, band: int, planes_per_band: int) -> str:
    bits = [
        f"CASE WHEN {dot_sql(a, _plane_weights_sql(p))} > 0 "
        f"THEN '1' ELSE '0' END"
        for p in range(band * planes_per_band, (band + 1) * planes_per_band)
    ]
    return " || ".join(bits)
