"""Trained text classifier: multinomial Naive Bayes over token counts.

The trained quality/language filter of large-scale training-data pipelines
(the role CCNet's fastText classifier or GPT-3's WebText LR filter plays:
label a slice, train on token statistics, score the rest of the corpus) in
its count-trained form, which is the one that gates exactly:

- **training is pure counting** — one map-side-combined ``groupBy(label,
  token)`` over the train slice (integers, associative, skew-free: the
  model table is bounded by vocab x classes, not by corpus size);
- **scoring is a per-token log-likelihood sum in bigint micros** — each
  token's ``ln((cnt+1)/(total_c+V))`` is rounded to micros BEFORE the sum
  (the unigram_logprob contract), so Spark and the DuckDB oracle agree
  bit-for-bit even though ln() is a libm call on both sides.

Plan shape at 100 TB: two linear token-count aggregates (train counts,
test tf), the model broadcast to the scorer (vocab x classes rows — at
web-scale vocabs swap the broadcast for a shuffle hash join on ``token``;
the code paths are otherwise identical), a constant x|classes| fan-out,
and ONE shuffle keyed by doc for the final per-(doc, class) fold. The
argmax window is per-doc over |classes| rows — never a global window.

Reference parity: the reference has no trained classifier; this is part of
the training-data-pipeline surface (SURVEY.md "beyond the reference" §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from searchengine_spark.functions.tokenize import TOKEN_SPLIT_RE
from searchengine_spark.operators.textstats import LANG_MARKERS

# the synthetic corpus text is label-independent, so the gate seasons each
# doc with its language's marker words (the strip_html / pii_scrub in-query
# seasoning pattern) — overlapping markers across languages ("de", "la",
# "le" appear in several sets) keep the task realistically ambiguous while
# the counts still carry signal. zh extends textstats.LANG_MARKERS with a
# pinyin-particle set.
SEASON_MARKERS: dict[str, list[str]] = {
    **LANG_MARKERS,
    "zh": ["de", "shi", "bu", "le", "wo", "zhe"],
}


def season_lang_markers(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Append ``2 + doc_id % 3`` copies of the doc's language marker phrase
    to its text — deterministic, engine-portable (same concat/repeat tree in
    the DuckDB twin), and a pure map over the scan."""
    phrase = F.lit(None).cast("string")
    for lang in sorted(SEASON_MARKERS):
        phrase = F.when(
            F.col(lang_col) == lang, F.lit(" " + " ".join(SEASON_MARKERS[lang]))
        ).otherwise(phrase)
    reps = (F.lit(2) + F.col(id_col) % 3).cast("int")
    seasoned = F.concat(F.col(text_col), F.repeat(F.coalesce(phrase, F.lit("")), reps))
    return docs.withColumn(text_col, seasoned)


def _tokens(text_col: str) -> Column:
    return F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def nb_train_predict(
    docs: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    train_pred: Column | None = None,
) -> DataFrame:
    """Train multinomial NB on the ``train_pred`` slice (default
    ``doc_id % 10 < 8``), predict the held-out slice.

    Returns one row per held-out doc: ``(doc_id, label_true, label_pred,
    score_micros)`` where score is the winning class's Laplace-smoothed
    log-posterior in bigint micros (per-token micros rounded before the
    sum; ties broken by ascending class label). Docs whose held-out text
    tokenizes to nothing still get a row (prior-only score).
    """
    if train_pred is None:
        train_pred = (F.col(id_col) % 10) < 8

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("label_true"),
        _tokens(text_col).alias("toks"),
        train_pred.alias("is_train"),
    )

    train_toks = base.filter("is_train").select(
        F.col("label_true").alias("cand"), F.explode("toks").alias("token")
    )
    # model: vocab x classes counts — bounded by dictionary size, not corpus
    model = train_toks.groupBy("cand", "token").agg(F.count("*").alias("cnt"))
    class_tot = train_toks.groupBy("cand").agg(F.count("*").alias("total_c"))
    prior_docs = base.filter("is_train").groupBy(F.col("label_true").alias("cand")).agg(
        F.count("*").alias("n_docs_c")
    )
    # 1-row scalars stay in-plan (cross-joined), never an eager collect
    consts = (
        base.filter("is_train")
        .agg(F.count("*").alias("n_train"))
        .crossJoin(train_toks.agg(F.count_distinct("token").alias("v")))
    )
    classes = (
        class_tot.join(prior_docs, "cand")
        .crossJoin(consts)
        .select(
            "cand",
            "total_c",
            "v",
            F.round(
                F.lit(1e6)
                * F.log(F.col("n_docs_c").cast("double") / F.col("n_train").cast("double"))
            )
            .cast("long")
            .alias("prior_micros"),
        )
    )

    test = base.filter(~F.col("is_train"))
    test_tf = (
        test.select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    # per-token log-likelihood in micros, rounded BEFORE the tf-weighted sum
    ll_micros = F.round(
        F.lit(1e6)
        * F.log(
            (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double")
            / (F.col("total_c") + F.col("v")).cast("double")
        )
    ).cast("long")
    tok_sums = (
        test_tf.crossJoin(F.broadcast(classes.select("cand", "total_c", "v")))
        .join(F.broadcast(model), ["cand", "token"], "left")
        .groupBy("doc_id", "cand")
        .agg(F.sum(F.col("tf") * ll_micros).alias("tok_sum"))
    )
    scored = (
        test.select("doc_id", "label_true")
        .crossJoin(F.broadcast(classes.select("cand", "prior_micros")))
        .join(tok_sums, ["doc_id", "cand"], "left")
        .withColumn(
            "score_micros",
            F.col("prior_micros") + F.coalesce(F.col("tok_sum"), F.lit(0).cast("long")),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("score_micros"), F.asc("cand"))
    return (
        scored.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "label_true", F.col("cand").alias("label_pred"), "score_micros")
    )
