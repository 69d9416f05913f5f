"""Reusable column-expression builders (text, hashing, vectors).

Everything here is a JVM-side Catalyst expression (functions or
higher-order lambda expressions) — no Python UDFs in hot paths. Each
builder has a DuckDB-SQL twin string used by the oracle gate; the two
are kept textually adjacent so they can't drift.
"""
