"""Text-analysis expressions: tokenization, shingling, quality
features, language scoring, fingerprints.

Portability contract: every Spark expression here has a DuckDB twin
producing bit-identical values — md5 for hashing (identical hex in
both), integer arithmetic for counts, and double arithmetic only in
fixed evaluation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenization — the reference's bufio.ScanWords semantics
# (wc_maple): split on runs of whitespace, drop empties, no case fold.
#
# EXPLICIT whitespace class, not `\s`: Java regex (Spark) counts
# vertical tab 0x0B as \s, RE2 (DuckDB) does NOT — fuzz-caught
# divergence. The explicit class [ \t\n\r\f\v] matches Go's
# unicode.IsSpace ASCII subset (the reference's ScanWords) and
# Python's str.split(), so the exe adapter agrees too. Spark SQL
# string literals process backslash escapes (hence \\t -> regex \t);
# DuckDB's don't. Java has no \v ESCAPE with this meaning (its \v is
# a vertical-whitespace class), so the Spark side spells it \x0B.
_WS_CLASS_EXPR = r"[ \\t\\n\\r\\f\\x0B]"
_WS_CLASS_SQL = r"[ \t\n\r\f\v]"
TOKENS_EXPR = rf"filter(split(text, '{_WS_CLASS_EXPR}+'), t -> t <> '')"
TOKENS_SQL = (f"list_filter(string_split_regex(text, '{_WS_CLASS_SQL}+'), "
              "t -> t <> '')")

# BPE-ish token pattern: letter runs, single digits, single symbols.
BPE_PATTERN_SQL = rf"[A-Za-z]+|[0-9]|[^A-Za-z0-9{_WS_CLASS_SQL[1:-1]}]"
BPE_PATTERN_EXPR = rf"[A-Za-z]+|[0-9]|[^A-Za-z0-9{_WS_CLASS_EXPR[1:-1]}]"

# English-y stopwords present in the synthetic vocab + classic ones.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")


def tokens() -> Column:
    return F.expr(TOKENS_EXPR)


def n_tokens() -> Column:
    return F.expr(f"size({TOKENS_EXPR})")


N_TOKENS_SQL = f"len({TOKENS_SQL})"


def bpe_count() -> Column:
    return F.expr(f"regexp_count(text, '{BPE_PATTERN_EXPR}')")


BPE_COUNT_SQL = f"len(regexp_extract_all(text, '{BPE_PATTERN_SQL}'))"


def stopword_count() -> Column:
    inlist = ", ".join(f"'{w}'" for w in STOPWORDS)
    return F.expr(f"size(filter({TOKENS_EXPR}, t -> t IN ({inlist})))")


_INLIST = ", ".join(f"'{w}'" for w in STOPWORDS)
STOPWORD_COUNT_SQL = f"len(list_filter({TOKENS_SQL}, t -> t IN ({_INLIST})))"


# Word-bigram shingles. IMPORTANT: build them from a *materialized*
# tokens column, never by inlining TOKENS_EXPR — each element_at would
# re-run the regex split, turning shingling O(tokens^2) per doc (a
# measured 10x slowdown on doc_fingerprint at sf0.1).
def shingles_from(tokens_col: str) -> str:
    return (
        f"CASE WHEN size({tokens_col}) < 2 THEN array() "
        f"ELSE transform(sequence(1, size({tokens_col}) - 1), "
        f"i -> concat(element_at({tokens_col}, i), ' ', "
        f"element_at({tokens_col}, i + 1))) END"
    )


SHINGLES_SQL = (
    f"list_transform(range(1, len({TOKENS_SQL})), "
    f"i -> {TOKENS_SQL}[i] || ' ' || {TOKENS_SQL}[i + 1])"
)


