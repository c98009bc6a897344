"""Text-analysis operators over the ``documents`` table (SURVEY.md §2.9 X4):
language ID, quality scoring, token counting, document fingerprinting.

Everything is built from JVM-side ``pyspark.sql.functions`` (split /
higher-order array functions / regex) — no Python UDFs. The DuckDB oracle
twins in registry_ops.py are generated from the same constants
(cocktailsdb_spark/constants.py), so results match exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..numeric import qround
from ..tables import spread
from ..constants import (
    BPE_TOKEN_RE,
    FP_MOD,
    FP_POWERS,
    LANG_PRECEDENCE,
    LANG_STOPWORDS,
    QUALITY_W_DIGIT,
    QUALITY_W_LEN,
    QUALITY_W_STOP,
)

def tokens() -> Column:
    """Token array of the `text` column (lazy: needs an active session)."""
    return F.split(F.col("text"), " ")


def _hits(tokens: Column, words: list[str]) -> Column:
    """# tokens (with repeats) that appear in `words` — JVM higher-order fn."""
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(wordset, t)))


def lang_id(docs: DataFrame) -> DataFrame:
    """n-gram/stopword-profile language ID heuristic.

    Score = stopword hits per language; prediction = argmax with fixed
    precedence (constants.LANG_PRECEDENCE) so ties are deterministic.
    """
    scored = docs.select(
        "doc_id",
        "lang",
        *[_hits(tokens(), LANG_STOPWORDS[lg]).alias(f"score_{lg}") for lg in LANG_PRECEDENCE],
    )
    pred = None
    all_scores = [F.col(f"score_{lg}") for lg in LANG_PRECEDENCE]
    for lg in LANG_PRECEDENCE:
        cond = F.col(f"score_{lg}") >= F.greatest(*all_scores)
        pred = F.when(cond, F.lit(lg)) if pred is None else pred.when(cond, F.lit(lg))
    return scored.select(
        "doc_id",
        "lang",
        *[F.col(f"score_{lg}") for lg in LANG_PRECEDENCE],
        pred.alias("pred_lang"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality score: stopword ratio, avg token length, digit-token
    ratio — the standard cheap pre-filters of an LLM data pipeline."""
    n_tokens = F.size(tokens())
    n_chars = F.length("text")
    avg_tok = (n_chars - (n_tokens - F.lit(1))) / n_tokens
    stop_ratio = _hits(tokens(), LANG_STOPWORDS["en"]) / n_tokens
    digit_ratio = F.size(F.filter(tokens(), lambda t: t.rlike("[0-9]"))) / n_tokens
    quality = (
        F.lit(QUALITY_W_STOP) * stop_ratio
        + F.lit(QUALITY_W_LEN) * F.least(avg_tok / 10, F.lit(1.0))
        + F.lit(QUALITY_W_DIGIT) * (F.lit(1.0) - digit_ratio)
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        qround(avg_tok, 4).alias("avg_token_len"),
        qround(stop_ratio, 4).alias("stopword_ratio"),
        qround(digit_ratio, 4).alias("digit_ratio"),
        qround(quality, 4).alias("quality"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count (letter runs,
    digit runs, punctuation singletons)."""
    return docs.select(
        "doc_id",
        F.size(tokens()).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_RE), 0)).alias("bpe_tokens"),
    )


def token_value(tok: Column) -> Column:
    """Small deterministic integer value of a token — shared by the rolling
    fingerprint on both engines (length/first-char/last-char based; every
    piece exists identically in Spark and DuckDB)."""
    first = F.ascii(F.substring(tok, 1, 1))
    last = F.ascii(tok.substr(F.length(tok), F.lit(1)))
    return F.length(tok) * 131 + first * 31 + last


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Rolling polynomial fingerprint over the token stream:
    fp = Σ value(tok_i) · B^(i mod 8)  (mod M), exact integer math."""
    exploded = spread(docs).select("doc_id", F.posexplode(tokens()).alias("pos", "tok"))
    powers = F.array(*[F.lit(p) for p in FP_POWERS])
    # cast to long BEFORE multiplying: value × power ≈ 1e13 overflows int32
    # (and Spark 4's default ANSI mode would raise)
    contrib = (
        token_value(F.col("tok")).cast("long") * F.element_at(powers, F.col("pos") % 8 + 1)
    ) % FP_MOD
    return (
        exploded.groupBy("doc_id")
        .agg((F.sum(contrib) % FP_MOD).alias("fingerprint"))
    )


def md5_prefix_value(tok: Column, n_hex: int = 4, offset: int = 0) -> Column:
    """Integer from n hex chars of md5(token) starting at ``offset`` — md5
    is the hash both engines share. One substring + conv per value (the
    DuckDB twins parse the same chars positionally; values are identical
    for md5's lowercase hex, only the Spark-side expression count shrinks
    from 2n chained ops to 2)."""
    return F.conv(F.substring(F.md5(tok), offset + 1, n_hex), 16, 10).cast("long")


NB_LN_SCALE = 1_000_000.0


def naive_bayes_langid(docs: DataFrame) -> DataFrame:
    """Multinomial Naive Bayes language classifier (McCallum & Nigam
    1998, public) trained on the corpus's own labels, evaluated in-corpus
    as a confusion matrix — the generative counterpart to the stopword
    heuristic (:func:`lang_id`), kNN (`knn_classify_labels`) and logistic
    regression (`logreg_quality_train`) classifier family.

        score(d, l) = ln P(l) + Σ_{t ∈ d} ln P(t | l)
        P(t | l)    = (c(t,l) + 1) / (T_l + V)      (Laplace smoothing)

    Determinism: every ln is quantized to a BIGINT in 1e-6 units at the
    (term, lang) / prior level, so per-doc scores are integer sums —
    summation order cannot matter (corpus.tfidf convention). Argmax ties
    break on lang ascending.

    Scale: the model is V·L quantized log-probs (V = vocab, L = #labels)
    — a broadcast table; the corpus-sized passes are the count aggregate
    and the scoring join, both map-side-combinable. No per-row Python.
    """
    toks = spread(docs).select("doc_id", "lang", F.explode(tokens()).alias("term"))
    # ONE tokenize+explode pass feeds the whole model build: vocab and
    # per-lang totals are exact integer derivations of the (lang, term)
    # count frame (distinct terms / Σc per lang), so materializing that
    # model-sized frame once (localCheckpoint — ≈|V|·L rows) replaces the
    # three separate corpus explodes the old vocab/counts/totals subtrees
    # executed (r14: guide §2.4 share computed frames; exec 2.4→ see
    # OPTIMIZATION_r14.md). The scoring pass below keeps its own explode
    # (different key — per-doc), so the corpus tokenizes twice, not four
    # times.
    counts = toks.groupBy("lang", "term").agg(F.count("*").alias("c")).localCheckpoint()
    vocab = counts.select("term").distinct()
    langs = docs.select("lang").distinct()
    totals = counts.groupBy("lang").agg(F.sum("c").alias("t_l"))
    vsize = vocab.agg(F.count("*").alias("v"))
    # dense smoothed model: every (lang, term) cell, c=0 where unseen
    model = (
        langs.crossJoin(vocab)
        .join(counts, ["lang", "term"], "left")
        .join(F.broadcast(totals), "lang")
        .crossJoin(F.broadcast(vsize))
        .select(
            F.col("lang").alias("model_lang"),
            "term",
            F.floor(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("t_l") + F.col("v")).cast("double")
                )
                * F.lit(NB_LN_SCALE)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("q"),
        )
    )
    n_docs = docs.agg(F.count("*").alias("nd"))
    priors = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("dl"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col("lang").alias("model_lang"),
            F.floor(
                F.log(F.col("dl").cast("double") / F.col("nd").cast("double"))
                * F.lit(NB_LN_SCALE)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("q_prior"),
        )
    )
    doc_scores = (
        toks.join(F.broadcast(model), "term")
        .groupBy("doc_id", "lang", "model_lang")
        .agg(F.sum("q").alias("q_tok"))
        .join(F.broadcast(priors), "model_lang")
        .select(
            "doc_id",
            "lang",
            "model_lang",
            (F.col("q_tok") + F.col("q_prior")).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("model_lang"))
    pred = (
        doc_scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "lang", F.col("model_lang").alias("predicted"))
    )
    return (
        pred.groupBy("lang", "predicted")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("lang", "predicted")
    )
