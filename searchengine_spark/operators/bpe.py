"""BPE tokenizer training: learn subword merge rules from corpus word counts.

The tokenizer-training job of a large-scale pipeline (Sennrich et al. 2016
byte-pair encoding, the algorithm behind GPT/Llama vocabularies) in its
count-trained form. The ONLY corpus-scale work is the word-count aggregate
(one map-side-combined groupBy over exploded tokens — linear, skew-free);
every merge iteration then runs over the *vocabulary* table (|distinct
words| rows — ~10^7 even at 100 TB), which is why real BPE trainers
operate on word-frequency tables, not the raw corpus. Per iteration:

1. adjacent symbol pairs per word, weighted by word count (array-side
   behind the Generate barrier — no shuffle beyond one pair aggregate);
2. argmax pair by (total desc, left asc, right asc) — a 1-row driver
   scalar (the kmeans/PageRank loop-scalar pattern);
3. apply the merge to every word's symbol sequence with a literal
   (non-regex) replace over a boundary-safe encoding.

Boundary-safe encoding: each symbol is wrapped as ``|sym|`` and the
wrapped symbols concatenated — ``spark`` → ``|s||p||a||r||k|``. The pair
(l, r) is the literal ``|l||r|`` replaced by ``|lr|``: each side of a
boundary owns its own ``|``, so left-to-right non-overlapping replace (the
shared semantics of Java ``String.replace`` and DuckDB ``replace``) merges
every non-overlapping occurrence — consecutive pairs ``|l||r||l||r|``
both merge, runs ``|a||a||a|`` merge greedily left-to-right, and no
pattern can match inside a symbol ('|' never occurs in one). A
space-delimited encoding misses every second occurrence (the shared
separator is consumed by the previous match).

Determinism: counts are integers, the argmax tie-break is total, so the
merge table is a pure function of the corpus at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchengine_spark.functions.tokenize import TOKEN_SPLIT_RE


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) corpus word frequencies — the one corpus-scale pass."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _wrap_chars(word_col: str) -> F.Column:
    """'spark' → '|s||p||a||r||k|' (the boundary-safe symbol encoding)."""
    return F.regexp_replace(F.col(word_col), "(.)", "|$1|")


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """(left, right, total) adjacent-symbol-pair weights over the vocab."""
    arr = F.split(F.btrim(F.col("seq"), F.lit("|")), r"\|\|")
    # Generate barrier: materialize the symbol array (dedup._token_ngrams
    # pattern) so the transform lambda doesn't re-split per element
    w = seqs.select("n", F.explode(F.array(arr)).alias("syms"))
    s = F.col("syms")
    pairs = F.when(
        F.size(s) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(s) - 1),
            lambda i: F.concat(F.element_at(s, i), F.lit("\t"), F.element_at(s, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        w.select("n", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("n").alias("total"))
        .select(
            F.split(F.col("pair"), "\t").getItem(0).alias("left"),
            F.split(F.col("pair"), "\t").getItem(1).alias("right"),
            "total",
        )
    )


def bpe_train(
    docs: DataFrame, n_merges: int = 6, text_col: str = "text"
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules; returns (merge_id, left, right,
    new_symbol, pair_count) ordered by merge_id. Stops early if the vocab
    runs out of pairs."""
    spark: SparkSession = docs.sparkSession
    base = word_counts(docs, text_col).select(
        "n", _wrap_chars("word").alias("seq")
    )
    # the word-count pass is the only corpus-scale work — pin its result so
    # each merge iteration re-reads the tiny vocab table, not the corpus
    base = base.persist()
    vocab = base
    rules: list[tuple] = []
    try:
        for merge_id in range(n_merges):
            best = (
                _pair_counts(vocab)
                .orderBy(F.desc("total"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            l, r, total = best[0]["left"], best[0]["right"], int(best[0]["total"])
            rules.append((merge_id, l, r, l + r, total))
            vocab = vocab.withColumn(
                "seq", F.replace(F.col("seq"), F.lit(f"|{l}||{r}|"), F.lit(f"|{l}{r}|"))
            )
    finally:
        base.unpersist()
    return spark.createDataFrame(
        rules, "merge_id int, left string, right string, new_symbol string, pair_count long"
    )


def bpe_encode(
    words: DataFrame, rules: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """Apply learned merge rules (in merge order) to segment each word:
    adds a ``pieces`` array column. Same wrap/replace contract as training,
    so training-corpus words segment exactly as the trainer left them."""
    seq = _wrap_chars(word_col)
    for l, r in rules:
        seq = F.replace(seq, F.lit(f"|{l}||{r}|"), F.lit(f"|{l}{r}|"))
    return words.withColumn("pieces", F.split(F.btrim(seq, F.lit("|")), r"\|\|"))


def bpe_fertility(docs: DataFrame, n_merges: int = 6) -> DataFrame:
    """Corpus-weighted tokenizer fertility over the trained BPE: one row of
    (total_words, total_pieces, total_chars, fertility_micros) where
    fertility = pieces per word (the tokens-per-word statistic tokenizer
    papers report; chars-per-token falls out of the same sums). Training
    and segmentation are the gated bpe_train/bpe_encode paths; the stats
    are one map-side-combinable aggregate over the vocabulary table, and
    fertility is an exact integer division (1e6·pieces div words)."""
    rules = bpe_train(docs, n_merges=n_merges).orderBy("merge_id").collect()
    enc = bpe_encode(word_counts(docs), [(r["left"], r["right"]) for r in rules])
    pieces = F.size("pieces").cast("long")
    return enc.agg(
        F.sum("n").cast("long").alias("total_words"),
        F.sum(F.col("n") * pieces).cast("long").alias("total_pieces"),
        F.sum(F.col("n") * F.length("word")).cast("long").alias("total_chars"),
    ).select(
        "total_words",
        "total_pieces",
        "total_chars",
        F.expr("(1000000 * total_pieces) div total_words").alias("fertility_micros"),
    )
