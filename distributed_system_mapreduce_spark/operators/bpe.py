"""Distributed BPE merge training — tokenizer induction as a Spark
job (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
with Subword Units" — the public byte-pair-encoding recipe every
modern LLM tokenizer descends from).

The classic scaling trick: BPE merges act WITHIN words, so training
runs on the distinct-word FREQUENCY table, not the corpus — the only
corpus-scale pass is the wordcount shuffle (map-side combined);
every merge round is then a pair-count partial agg + an argmax +
a narrow merge map over the (much smaller) word table, with driver
state = one merge rule per round.

Rows-only (no SQL oracle — the iterative merge fold has no tractable
SQL twin); instead tests/test_bpe.py checks EXACT equality of the
learned merge rules against an independent pure-Python BPE reference
on the collected corpus, plus invariants (counts non-increasing,
symbols shrink).

Reference parity: the reference's MapleJuice would express one round
as maple=emit-pairs / juice=sum + a driver argmax (its vote pipeline
shape, mj_exe/maple_vote.go); this is that loop, Spark-native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_system_mapreduce_spark.functions import text as X
from distributed_system_mapreduce_spark.tables import load_table, spread

N_MERGES = 8
EOW = "</w>"  # end-of-word marker, its own symbol (Sennrich)


def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, "documents", sf_dir))
    return (
        docs.select(F.explode(F.expr(X.TOKENS_EXPR)).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    )


def _symbolize(words: DataFrame) -> DataFrame:
    # chars + end-of-word marker; split('', word) yields single chars
    return words.select(
        "w", "cnt",
        F.expr(f"concat(split(w, ''), array('{EOW}'))").alias("syms"),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    # size-1 words carry no pairs — and must be filtered BEFORE the
    # transform: sequence(1, 0) is [1, 0] (a descending range, not
    # empty), so the unguarded expression indexes past the array and
    # throws under ANSI element_at once any word merges to one symbol
    pairs = syms.filter(F.size("syms") > 1).select(
        "cnt",
        F.explode(F.expr(
            "transform(sequence(1, size(syms) - 1), "
            "i -> struct(element_at(syms, i) AS a, "
            "element_at(syms, i + 1) AS b))"
        )).alias("p"),
    )
    return (
        pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("n"))
    )


def _merge_round(syms: DataFrame, a: str, b: str) -> DataFrame:
    """Apply one merge rule: greedy left-to-right non-overlapping
    replacement of adjacent (a, b) with a||b — a JVM fold, no UDF.
    Lambda-bound literals, so corpus symbols never splice into SQL
    text."""
    la, lb = F.lit(a), F.lit(b)

    def step(acc, x):
        merged = (F.size(acc) > 0) \
            & (F.element_at(acc, -1) == la) & (x == lb)
        return F.when(
            merged,
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.concat(la, lb))),
        ).otherwise(F.concat(acc, F.array(x)))

    new = F.aggregate(
        "syms", F.array().cast("array<string>"), step)
    return syms.select("w", "cnt", new.alias("syms"))


def _train(spark: SparkSession, sf_dir: str,
           n_merges: int = N_MERGES):
    """Shared loop: returns (rules, merged symbol table). Per round:
    pair-count partial agg over the word table, ONE argmax row to the
    driver (TakeOrdered under the deterministic (n desc, a asc,
    b asc) tie-break), then the merge fold applied and the table
    localCheckpointed so round N's plan never replays rounds 1..N-1.
    Driver state: the rule list (n_merges rows)."""
    syms = _symbolize(_word_freq(spark, sf_dir)).localCheckpoint()
    rules = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(syms)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        r = top[0]
        rules.append((rank, r["a"], r["b"], int(r["n"])))
        syms = _merge_round(syms, r["a"], r["b"]).localCheckpoint()
    return rules, syms


def bpe_train_merges(spark: SparkSession, sf_dir: str,
                     n_merges: int = N_MERGES) -> DataFrame:
    """Learn the first `n_merges` BPE merge rules over the corpus.
    Output: (merge_rank, left, right, pair_count) — the ordered rule
    table a tokenizer ships. See _train for the round discipline."""
    rules, _ = _train(spark, sf_dir, n_merges)
    return spark.createDataFrame(
        rules, "merge_rank int, left string, right string, "
               "pair_count bigint")


def bpe_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-training census: after the N_MERGES learned rules are
    applied, how long are words in symbols, and how many distinct
    symbols exist — the vocab-size / sequence-length tradeoff curve's
    first point (rows-only, invariant-tested). Shares _train's single
    pass (the merged table IS training's final state — no re-apply)."""
    _, syms = _train(spark, sf_dir)
    ex = syms.select("cnt", F.explode("syms").alias("s"))
    return (
        ex.agg(
            F.countDistinct("s").alias("n_symbols"),
            F.sum("cnt").cast("bigint").alias("total_symbol_occurrences"),
        )
        .crossJoin(F.broadcast(
            syms.agg(
                F.count(F.lit(1)).alias("n_words"),
                F.sum(F.size("syms") * F.col("cnt")).cast("bigint")
                .alias("weighted_symbol_len"),
            )
        ))
        .select("n_words", "n_symbols", "weighted_symbol_len",
                "total_symbol_occurrences")
    )


def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merge table to the corpus and report the
    per-source token budget under the TRAINED tokenizer — the number
    that actually prices a pretraining mixture (whitespace token
    counts over- or under-state it per language/source).

    Apply path at scale: tokenization is word-local, so the corpus
    never re-tokenizes — the word table (already merged as training's
    final state) broadcasts its word -> n_subtokens map onto one
    corpus token pass. Rows-only (train's rules are not
    SQL-derivable); exact-parity tested against the pure-Python
    reference apply."""
    _, syms = _train(spark, sf_dir)
    lens = F.broadcast(
        syms.select("w", F.size("syms").alias("n_sub")))
    docs = spread(load_table(spark, "documents", sf_dir))
    toks = docs.select(
        "source", F.explode(F.expr(X.TOKENS_EXPR)).alias("w"))
    return (
        toks.join(lens, "w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_bpe_tokens"),
        )
    )


def bpe_certify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training promoted into the ORACLE GATE (the kmeans_certify
    / freq_items_certify pattern): the 8-round merge fold has no
    tractable SQL twin, but two anchors do —

    - the ROUND-1 pair-count table is pure SQL (tokenize, char-split
      + end-of-word, adjacent pairs, weighted count): the oracle
      recomputes the top-10 pairs under the training tie-break
      (n DESC, a ASC, b ASC) exactly, which pins the first learned
      rule bit-for-bit;
    - the chosen pair counts are NON-INCREASING across rounds for
      EVERY corpus, by construction: a merge only removes adjacencies
      of existing pairs, and each new adjacency involving the merged
      symbol maps 1:1 onto a pre-merge adjacency of a pair the argmax
      already bounded — so round k+1's max <= round k's count. The
      oracle asserts the flag (and the rule count) as literals; a
      training bug that breaks monotonicity or loses a round flips
      the row and the gate goes red.

    Shape: one extra round-1 pair-count pass next to the full
    training run — certification pays for truth; production ships
    bpe_train_merges alone."""
    from pyspark.sql import Window

    rules, _ = _train(spark, sf_dir)
    nonincr = all(rules[i][3] <= rules[i - 1][3]
                  for i in range(1, len(rules)))
    pc = _pair_counts(_symbolize(_word_freq(spark, sf_dir)))
    order = [F.desc("n"), F.asc("a"), F.asc("b")]
    top = (
        pc.orderBy(*order).limit(10)
        .withColumn("pair_rank",
                    F.row_number().over(Window.orderBy(*order))
                    .cast("int"))
    )
    return top.select(
        "pair_rank",
        F.col("a").alias("lhs"),
        F.col("b").alias("rhs"),
        F.col("n").cast("bigint").alias("pair_count"),
        F.lit(len(rules)).cast("bigint").alias("n_rules"),
        F.lit(bool(nonincr)).alias("merges_nonincreasing"),
    )


BPE_CERTIFY_SQL = f"""
WITH toks AS (
  SELECT unnest({X.TOKENS_SQL}) AS w FROM documents
),
words AS (SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w),
syms AS (
  SELECT cnt, list_append(string_split(w, ''), '{EOW}') AS s
  FROM words
),
pairs AS (
  SELECT cnt, s[i] AS a, s[i + 1] AS b
  FROM syms, unnest(generate_series(1, len(s) - 1)) AS t(i)
  WHERE len(s) > 1
),
pc AS (
  SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS n
  FROM pairs GROUP BY a, b
),
top AS (
  SELECT CAST(row_number() OVER (ORDER BY n DESC, a, b) AS INT)
           AS pair_rank,
         a, b, n
  FROM pc ORDER BY n DESC, a, b LIMIT 10
)
SELECT pair_rank, a AS lhs, b AS rhs, n AS pair_count,
       CAST({N_MERGES} AS BIGINT) AS n_rules,
       TRUE AS merges_nonincreasing
FROM top
"""


QUERIES = {
    "bpe_train_merges": bpe_train_merges,
    "bpe_vocab_stats": bpe_vocab_stats,
    "bpe_token_count": bpe_token_count,
    "bpe_certify": bpe_certify,
}

ORACLES: dict[str, str] = {
    "bpe_certify": BPE_CERTIFY_SQL,
}
