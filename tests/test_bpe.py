"""BPE merge training: exact-rule equality against an independent
pure-Python reference implementation (same tie-break), plus the
monotonicity invariants the distributed loop must preserve."""

from collections import Counter

from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions.text import TOKENS_EXPR
from distributed_system_mapreduce_spark.operators.bpe import (
    EOW,
    N_MERGES,
    bpe_token_count,
    bpe_train_merges,
    bpe_vocab_stats,
)
from distributed_system_mapreduce_spark.tables import load_table
from tests.conftest import SF_DIR


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Sennrich-style BPE on a word frequency dict: count adjacent
    symbol pairs weighted by word count, merge the argmax pair
    (ties: count desc, left asc, right asc), greedy left-to-right
    application."""
    vocab = {w: list(w) + [EOW] for w in word_counts}
    rules = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        rules.append((a, b, n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and syms[i] == a and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return rules


def test_bpe_rules_match_reference_exactly(spark):
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges(spark, SF_DIR)
        .orderBy("merge_rank").collect()
    ]
    wc = {
        r["w"]: r["c"]
        for r in load_table(spark, "documents", SF_DIR)
        .select(F.explode(F.expr(TOKENS_EXPR)).alias("w"))
        .groupBy("w").agg(F.count("*").alias("c")).collect()
    }
    want = [
        (i + 1, a, b, n)
        for i, (a, b, n) in enumerate(_reference_bpe(wc, N_MERGES))
    ]
    assert got == want and len(got) == N_MERGES
    # counts are non-increasing across ranks (greedy argmax)
    counts = [n for (_, _, _, n) in got]
    assert counts == sorted(counts, reverse=True)


def test_bpe_vocab_stats_invariants(spark):
    row = bpe_vocab_stats(spark, SF_DIR).collect()[0]
    # every word still ends in EOW and symbols only shrink:
    # weighted length <= chars + one marker per token occurrence
    docs = load_table(spark, "documents", SF_DIR)
    toks = docs.select(F.explode(F.expr(TOKENS_EXPR)).alias("w"))
    n_tok = toks.count()
    total_chars = toks.agg(
        F.sum(F.length("w")).cast("long").alias("s")).collect()[0]["s"]
    assert row["weighted_symbol_len"] == row["total_symbol_occurrences"]
    assert row["weighted_symbol_len"] <= total_chars + n_tok
    # at least one merge actually fired (strict shrink)
    assert row["weighted_symbol_len"] < total_chars + n_tok
    assert 0 < row["n_symbols"] and row["n_words"] > 0


def test_bpe_token_count_matches_reference_apply(spark):
    got = {
        r["source"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_count(spark, SF_DIR).collect()
    }
    docs = load_table(spark, "documents", SF_DIR)
    rows = docs.select(
        "source", F.explode(F.expr(TOKENS_EXPR)).alias("w")).collect()
    wc = Counter(r["w"] for r in rows)
    rules = _reference_bpe(dict(wc), N_MERGES)
    vocab = {w: list(w) + [EOW] for w in wc}
    for (a, b, _) in rules:
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and syms[i] == a and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    want = {}
    for r in rows:
        nw, nt = want.get(r["source"], (0, 0))
        want[r["source"]] = (nw + 1, nt + len(vocab[r["w"]]))
    assert got == want and got


def test_pair_counts_survives_single_symbol_words(spark):
    """A word merged down to ONE symbol must contribute no pairs and
    no crash: sequence(1, 0) is the DESCENDING [1, 0] in Spark, so an
    unguarded transform would index past the array under ANSI
    element_at (regression guard for the size filter)."""
    import pandas as pd

    from distributed_system_mapreduce_spark.operators.bpe import (
        _merge_round,
        _pair_counts,
        _symbolize,
    )

    words = spark.createDataFrame(
        [("a", 5), ("ab", 2)], "w string, cnt long")
    syms = _symbolize(words)
    m1 = _merge_round(syms, "a", "</w>")   # 'a' -> ['a</w>'] (size 1)
    rows = {r["w"]: r["syms"] for r in m1.collect()}
    assert rows["a"] == ["a</w>"]
    got = {(r["a"], r["b"]): r["n"] for r in _pair_counts(m1).collect()}
    assert got == {("a", "b"): 2, ("b", "</w>"): 2}


def test_bpe_certify_pins_round1_and_monotonicity(spark):
    """bpe_certify's rank-1 row must BE the first learned rule (same
    tie-break, same data), the top-10 must be rank-dense and ordered,
    and the monotonicity flag must hold (it is theorem-guaranteed, so
    FALSE means a training bug)."""
    from distributed_system_mapreduce_spark.operators.bpe import (
        bpe_certify,
        bpe_train_merges,
    )

    rows = bpe_certify(spark, SF_DIR).orderBy("pair_rank").collect()
    assert [r["pair_rank"] for r in rows] == list(range(1, len(rows) + 1))
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["merges_nonincreasing"] for r in rows)
    assert rows[0]["n_rules"] == 8
    r1 = bpe_train_merges(spark, SF_DIR).orderBy("merge_rank").first()
    assert (rows[0]["lhs"], rows[0]["rhs"], rows[0]["pair_count"]) == (
        r1["left"], r1["right"], r1["pair_count"])


def test_char_split_oracle_parity_non_ascii(spark, oracle):
    """BPE_CERTIFY_SQL depends on DuckDB string_split(w, '') agreeing
    character-for-character with Spark split(w, ''). Pin that both
    engines split by Unicode CODE POINT on the hard cases: accented
    Latin (precomposed AND combining-mark forms), Greek, CJK, an
    astral emoji (UTF-16 surrogate pair in the JVM), and Devanagari
    with a dependent vowel sign — a grapheme- or code-unit-based
    splitter diverges on at least one of these."""
    words = ["café", "über", "δοκιμή", "東京タワー", "a😀b",
             "éclair", "नि", "mixédASCII7"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["s"]
           for r in df.selectExpr("w", "split(w, '') AS s").collect()}
    for w in words:
        want = oracle.execute(
            "SELECT string_split(?, '')", [w]).fetchone()[0]
        assert got[w] == want, w
        # and both agree with Python's code-point view
        assert got[w] == list(w), w


def test_bpe_compression_curve_monotone_and_anchored(spark):
    """The curve must be monotone (each merge can only shrink the
    weighted symbol mass), start at chars+EOW per token, keep
    n_token_occurrences constant, and its last point must equal
    bpe_vocab_stats' endpoint."""
    from distributed_system_mapreduce_spark.operators.bpe import (
        N_MERGES,
        bpe_compression_curve,
        bpe_vocab_stats,
    )

    rows = {r["n_merges"]: r for r in
            bpe_compression_curve(spark, SF_DIR).collect()}
    assert sorted(rows) == list(range(N_MERGES + 1))
    lens = [rows[k]["weighted_symbol_len"] for k in sorted(rows)]
    assert lens == sorted(lens, reverse=True)
    assert lens[0] > lens[-1]  # 8 merges on real text must compress
    occs = {rows[k]["n_token_occurrences"] for k in rows}
    assert len(occs) == 1  # merges never change token count
    # k=0: every token costs its chars + the EOW marker
    docs = load_table(spark, "documents", SF_DIR)
    toks = docs.select(F.explode(F.expr(TOKENS_EXPR)).alias("w"))
    want0 = toks.selectExpr("SUM(length(w) + 1) AS s").collect()[0]["s"]
    assert rows[0]["weighted_symbol_len"] == want0
    vs = bpe_vocab_stats(spark, SF_DIR).collect()[0]
    assert rows[N_MERGES]["weighted_symbol_len"] == \
        vs["weighted_symbol_len"]


def test_bpe_curve_degenerate_corpus_matches_oracle(spark, tmp_path):
    """ADVICE r8: a corpus that exhausts the pair table before
    N_MERGES used to emit fewer curve rows than the SQL twin (whose
    empty r{k} rounds carry the encoding through unchanged). The
    padded rounds must now reproduce the oracle row-for-row: exactly
    N_MERGES+1 rows, the tail flat at the exhausted encoding."""
    import duckdb

    from distributed_system_mapreduce_spark.operators.bpe import (
        BPE_COMPRESSION_CURVE_SQL,
        bpe_compression_curve,
    )
    from tests.conftest import normalize

    # single-char tokens: round 1 merges (a,</w>), round 2 (b,</w>),
    # round 3 finds no pairs -> early break with 6 rounds unexecuted
    docs = load_table(spark, "documents", SF_DIR).limit(5).withColumn(
        "text", F.lit("a b a"))
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    sdf = bpe_compression_curve(spark, str(tmp_path))
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) == N_MERGES + 1
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'")
    res = con.sql(BPE_COMPRESSION_CURVE_SQL)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert normalize(sdf.columns, srows) == normalize(dcols, drows)
    # the padded tail is flat (no phantom compression)
    by_k = {r["n_merges"]: r["weighted_symbol_len"]
            for r in sdf.collect()}
    assert len({by_k[k] for k in range(2, N_MERGES + 1)}) == 1
