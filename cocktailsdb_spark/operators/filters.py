"""Document-quality FILTER operators (north_star §X4 extension): the
pre-training hygiene passes an LLM data pipeline runs before anything
touches the model — Gopher-style repetition statistics, PII redaction,
and the deterministic train/valid/test hash split.

All three are pure JVM-side DataFrame programs (regex / higher-order
array functions / windows — no Python in the hot path) with exact DuckDB
twins in registry_ops.py generated from the same constants below.

Scale notes:
- repetition_stats: two shuffles, both keyed by doc_id (gram count, then
  per-doc window) — uniform keys, no skew risk beyond a single giant doc.
- pii_redact: pure narrow map (regexp_replace chain), scales as a scan.
- hash_split: pure narrow map; hash-based (not rand()) so reruns and
  task retries agree row-for-row on any cluster — the property that makes
  the split reproducible across the fleet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..numeric import qround
from ..tables import spread
from .text import md5_prefix_value, tokens

REP_NGRAM = 2

# Java regex and DuckDB's RE2 agree on these (no backreferences, no
# lookaround — RE2 has neither).
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE_RE = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
PII_IP_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

SPLIT_TRAIN = 0.8
SPLIT_VALID = 0.9  # [0.8, 0.9) → valid, rest → test


def grams_with_repeats(tk: Column, n: int = REP_NGRAM) -> Column:
    """All n-gram (word) shingles of a token array WITH repeats —
    :func:`dedup.shingles` deduplicates, which is right for Jaccard but
    wrong for repetition measurement. Same short-doc guard."""
    count = F.size(tk) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
    )
    return F.when(count >= 1, grams).otherwise(F.array().cast("array<string>"))


def repetition_stats(docs: DataFrame, n: int = REP_NGRAM) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``dup_gram_frac`` — fraction of n-grams that are repeats of an
      earlier n-gram in the same doc (1 - distinct/total); the "fraction
      of duplicate n-grams" family of Rae et al. 2021 (Gopher, table A1).
    - ``top_gram`` / ``top_gram_char_frac`` — the most frequent n-gram
      (count-desc, lexical tiebreak) and the fraction of the document's
      characters its occurrences cover; the "fraction of characters in
      the most common n-gram" signal.

    Shape: explode → count per (doc, gram) → one per-doc window. Docs too
    short to have any n-gram drop out (no grams on either engine)."""
    g = spread(docs).select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.explode(grams_with_repeats(tokens(), n)).alias("gram"),
    )
    per_gram = g.groupBy("doc_id", "n_chars", "gram").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("doc_id")
    pick = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("gram"))
    return (
        per_gram.select(
            "doc_id",
            "n_chars",
            "gram",
            "cnt",
            F.sum("cnt").over(w).alias("n_grams"),
            F.count("*").over(w).alias("distinct_grams"),
            F.row_number().over(pick).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("n_grams").cast("int").alias("n_grams"),
            F.col("distinct_grams").cast("int").alias("distinct_grams"),
            qround(1.0 - F.col("distinct_grams") / F.col("n_grams"), 4).alias(
                "dup_gram_frac"
            ),
            F.col("gram").alias("top_gram"),
            qround(F.col("cnt") * F.length("gram") / F.col("n_chars"), 4).alias(
                "top_gram_char_frac"
            ),
        )
    )


def inject_pii(docs: DataFrame) -> DataFrame:
    """Deterministically salt the fixture corpus with synthetic PII so the
    redaction path is exercised (the shared test tables carry none).
    Production callers skip this and hand :func:`pii_redact` raw text."""
    did = F.col("doc_id")
    email = F.when(
        did % 3 == 0,
        F.concat(F.lit(" user"), did.cast("string"), F.lit("@mail.example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(did % 4 == 0, F.lit(" 555-867-5309")).otherwise(F.lit(""))
    ip = F.when(
        did % 5 == 0, F.concat(F.lit(" 10.0.0."), (did % 256).cast("string"))
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id", F.concat(F.col("text"), email, phone, ip).alias("text")
    )


def pii_redact(docs: DataFrame) -> DataFrame:
    """PII scrub: replace emails / US-style phone numbers / IPv4 addresses
    with typed placeholder tags, and count what was removed (the counts
    feed the pipeline's audit log). Chain order matters: emails first
    (their domains contain dots an IP pattern could nibble at)."""
    t = F.col("text")
    n_email = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0))
    n_phone = F.size(F.regexp_extract_all(t, F.lit(PII_PHONE_RE), 0))
    n_ip = F.size(F.regexp_extract_all(t, F.lit(PII_IP_RE), 0))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"), PII_PHONE_RE, "<PHONE>"
        ),
        PII_IP_RE,
        "<IP>",
    )
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        n_email.cast("int").alias("n_emails"),
        n_phone.cast("int").alias("n_phones"),
        n_ip.cast("int").alias("n_ips"),
    )


def hash_split(docs: DataFrame) -> DataFrame:
    """Deterministic train/valid/test assignment: u = uniform(md5(doc_id)),
    split by fixed thresholds. Content-hash (not rand(), not
    monotonically_increasing_id) so the assignment is stable under
    repartitioning, retries, and re-runs — and so a doc keeps its split
    when the corpus is re-ingested."""
    u = md5_prefix_value(F.col("doc_id").cast("string"), 4) / F.lit(float(16**4))
    split = (
        F.when(u < SPLIT_TRAIN, F.lit("train"))
        .when(u < SPLIT_VALID, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return docs.select(
        "doc_id", "lang", qround(u, 6).alias("u"), split.alias("split")
    )


K_ANON_K = 5


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: tuple[str, ...] = ("c_nationkey", "c_mktsegment"),
    k: int = K_ANON_K,
) -> DataFrame:
    """Privacy-governance check: k-anonymity of a table under a set of
    quasi-identifier columns — every row should be indistinguishable from
    at least k−1 others on those columns before release. One
    map-side-combined shuffle on the quasi-identifier key builds the
    equivalence classes; the report aggregates class-size stats (the
    second aggregate runs over class-count rows, never the table).

    Output (single row): min_class_size, n_classes, n_rows,
    n_rows_below_k, pct_below_k — release gate: n_rows_below_k == 0.
    """
    classes = df.groupBy(*quasi_cols).agg(F.count("*").alias("sz"))
    return classes.agg(
        F.min("sz").alias("min_class_size"),
        F.count("*").alias("n_classes"),
        F.sum("sz").alias("n_rows"),
        F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0)).alias(
            "n_rows_below_k"
        ),
        qround(
            F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0)).cast("double")
            / F.sum("sz"),
            6,
        ).alias("pct_below_k"),
    )


DP_EPSILON = 1.0
DP_NOISE_SCALE = 1_000_000.0


def dp_noisy_counts(orders: DataFrame, epsilon: float = DP_EPSILON) -> DataFrame:
    """Differential-privacy-style noisy release of per-(priority, year)
    order counts: Laplace(Δf/ε) noise on each count (Dwork et al. 2006,
    public; Δf = 1 for counting queries). The governance companion to
    the k-anonymity gate — suppression hides small groups, DP noise
    protects every group.

    The noise is DETERMINISTIC here (md5-lane uniform → inverse Laplace
    CDF), which production DP must never do — but an engine test bed
    must: reruns/retries agree row-for-row and the DuckDB twin verifies
    the release end-to-end (the repo's hash-sampling convention,
    operators/corpus.py:stratified_sample). Swapping the md5 lane for a
    secure RNG is a one-line change that doesn't alter the plan.

        u ∈ (−½, ½),  noise = −(1/ε)·sgn(u)·ln(1 − 2|u|)

    ln is the one libm call — quantized to 1e-6 before release (tfidf
    convention). Pure narrow aggregate + map; scales as the count does.
    """
    grp = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").alias("year"),
    ).agg(F.count("*").alias("n"))
    key = F.concat_ws(":", F.col("priority"), F.col("year").cast("string"))
    # +0.5 lane centering keeps u strictly inside (-1/2, 1/2): a zero
    # lane would otherwise put ln(1-2|u|) at ln(0)
    u = (
        (md5_prefix_value(key, 8).cast("double") + F.lit(0.5))
        / F.lit(4294967296.0)
    ) - F.lit(0.5)
    mag = F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    noise = (
        F.when(u >= 0, F.lit(-1.0)).otherwise(F.lit(1.0))
        * mag
        / F.lit(epsilon)
    )
    qnoise = (
        F.floor(noise * F.lit(DP_NOISE_SCALE) + F.lit(0.5)) / F.lit(DP_NOISE_SCALE)
    )
    return (
        grp.select(
            "priority",
            F.col("year").cast("int").alias("year"),
            F.col("n").cast("long").alias("true_count"),
            qround(F.col("n") + qnoise, 4).alias("released_count"),
        )
        .orderBy("priority", "year")
    )


L_DIVERSITY_L = 3
ACCTBAL_BANDS = (0.0, 2500.0, 5000.0, 7500.0)  # sensitive-attribute bands


def l_diversity_report(
    customer: DataFrame,
    quasi_cols: tuple[str, ...] = ("c_nationkey", "c_mktsegment"),
    l_req: int = L_DIVERSITY_L,
) -> DataFrame:
    """Privacy-governance check #2: distinct l-diversity (Machanavajjhala
    et al. 2007, public) — k-anonymity's blind spot is a class where all
    k rows share the SAME sensitive value; this gate requires every
    quasi-identifier class to contain ≥ l distinct sensitive values
    (here: the customer's account-balance band).

    One map-side-combined aggregate on (QI, band) collapses the table to
    class×band rows; a second aggregate on QI counts distinct bands per
    class (exact — the first aggregate already deduped); the report
    reduces the class frame. Nothing in the plan is ever wider than the
    class×band frame, so the gate costs one shuffle at any corpus size.

    Output (single row): min_l, n_classes, n_classes_below_l,
    n_rows_below_l, pct_rows_below_l — release gate: n_classes_below_l
    == 0 (companion to k_anonymity_report / dp_noisy_counts).
    """
    bal = F.col("c_acctbal").cast("double")
    band = (
        F.when(bal < ACCTBAL_BANDS[0], "negative")
        .when(bal < ACCTBAL_BANDS[1], "low")
        .when(bal < ACCTBAL_BANDS[2], "mid")
        .when(bal < ACCTBAL_BANDS[3], "high")
        .otherwise("top")
    )
    cells = customer.groupBy(*quasi_cols, band.alias("band")).agg(
        F.count("*").alias("n")
    )
    classes = cells.groupBy(*quasi_cols).agg(
        F.count("*").alias("l_distinct"), F.sum("n").alias("sz")
    )
    below = F.col("l_distinct") < l_req
    return classes.agg(
        F.min("l_distinct").cast("long").alias("min_l"),
        F.count("*").cast("long").alias("n_classes"),
        F.sum(F.when(below, 1).otherwise(0)).cast("long").alias(
            "n_classes_below_l"
        ),
        F.sum(F.when(below, F.col("sz")).otherwise(0)).cast("long").alias(
            "n_rows_below_l"
        ),
        qround(
            F.sum(F.when(below, F.col("sz")).otherwise(0)).cast("double")
            / F.sum("sz"),
            6,
        ).alias("pct_rows_below_l"),
    )
