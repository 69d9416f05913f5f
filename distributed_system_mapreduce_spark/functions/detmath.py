"""Deterministic cross-engine math beyond +-*/.

libm transcendentals (ln, exp, pow) are NOT correctly rounded and
differ in the last ulp between DuckDB's C libm and the JVM — a direct
`ln()` in an oracle-checked expression is a hash-mismatch time bomb
(the same reason curation7's s-curve threshold uses a nested-sqrt
chain instead of pow()).

`ln_det` is a natural-log APPROXIMATION built only from operations
IEEE 754 requires to be correctly rounded (sqrt, *, -), so both
engines compute bit-identical doubles:

    ln(x) = lim n->inf  2^n * (x^(1/2^n) - 1)

with n = 20 (twenty nested sqrts). Error decomposes as
ln(x)^2 / 2^(n+1) from the series truncation plus 2^(n-53) from the
quantization of x^(1/2^n)-1 near 1.0 — about 5e-5 absolute for
|ln x| <= 10, plenty for importance weights, entropies, and rankings
(document the approximation where used; never use it where the exact
transcendental value matters).
"""

from __future__ import annotations

_N_SQRT = 20
_SCALE = float(1 << _N_SQRT)


def ln_det(x: str) -> str:
    """ln(x) approximation from correctly-rounded ops only; the SAME
    string is valid Spark SQL and DuckDB SQL, so both engines run the
    identical float-op sequence -> bit-identical result."""
    e = f"CAST({x} AS DOUBLE)"
    for _ in range(_N_SQRT):
        e = f"sqrt({e})"
    return f"({_SCALE} * ({e} - 1.0))"
