"""Training-corpus preparation operators (north_star §X4 extension): the
ops an LLM data pipeline runs between "cleaned documents" and "training
batches" — chunking, vocabulary build, sequence packing, deterministic
stratified sampling, and benchmark decontamination.

All five are pure JVM-side DataFrame programs (split / higher-order array
functions / windows — no Python in the hot path) with exact DuckDB twins
in registry_ops.py. Scale notes per op; none shuffles more than once
except the decontamination candidate join (inverted-index equi-join, the
same shape as the near-dup family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..numeric import dsum, qround
from ..tables import spread
from .dedup import shingles
from .text import md5_prefix_value, tokens

CHUNK_SIZE = 64
CHUNK_STRIDE = 48
PACK_BUDGET = 2048
SAMPLE_RATES = {"en": 1.0, "de": 0.75, "es": 0.5, "fr": 0.5, "zh": 0.25}
DECON_NGRAM = 8


def chunk_documents(
    docs: DataFrame, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Overlapping token-window chunking (context-window prep): chunk c
    starts at token c·stride and carries ≤ ``size`` tokens; every token
    belongs to ≥1 chunk. posexplode over a JVM-computed start sequence —
    the explode multiplies rows ~n/stride ×, which is why ``spread``
    pre-partitions the scan."""
    tk = tokens()
    n = F.size(tk)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    return (
        spread(docs)
        .select("doc_id", "lang", "text", F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            "doc_id",
            "lang",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.concat_ws(" ", F.slice(tokens(), F.col("start"), size)).alias("chunk_text"),
            F.size(F.slice(tokens(), F.col("start"), size)).alias("n_tokens"),
        )
    )


def vocab_top_terms(docs: DataFrame, top_n: int = 1000, min_count: int = 2) -> DataFrame:
    """Vocabulary build: term frequencies over the whole corpus, top-N by
    count with lexical tiebreak. Map-side partial counts make the shuffle
    carry one row per (partition, distinct term), not per token."""
    return (
        spread(docs)
        .select(F.explode(tokens()).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(top_n)
    )


def pack_sequences(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Concat-then-cut sequence packing (GPT-style pretraining batches):
    documents are laid end-to-end in doc_id order; each doc's global token
    offset is the exclusive prefix sum, and its training bin is
    offset // budget. One window over a single global ordering — this is
    the small-corpus / per-shard form; the 100 TB entry is
    :func:`pack_sequences_sharded`, which runs exactly this prefix sum
    under a shard-partitioned window."""
    n_tok = F.size(tokens())
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.coalesce(F.sum(n_tok).over(w), F.lit(0)).alias("start_offset"),
    ).select(
        "doc_id",
        "n_tokens",
        "start_offset",
        (F.col("start_offset") / budget).cast("bigint").alias("bin_id"),
        (F.col("start_offset") % budget).alias("offset_in_bin"),
    )


PACK_SHARDS = 32


def pack_sequences_sharded(
    docs: DataFrame, budget: int = PACK_BUDGET, n_shards: int = PACK_SHARDS
) -> DataFrame:
    """:func:`pack_sequences` at scale: the corpus is split into
    ``n_shards`` deterministic shards (``doc_id % n_shards`` — doc ids
    are dense, so shards balance) and each shard is packed independently
    under ONE hash-partitioned window — no "move all data to a single
    partition" plan anywhere. A training loader consumes
    ``(shard_id, bin_id)`` pairs; bins never cross shards, which is also
    what makes shard-parallel tokenization/writing possible downstream.

    At 100 TB ``n_shards`` rises with the cluster (one shard ≈ one
    writer task); the per-shard plan is byte-for-byte the
    :func:`pack_sequences` prefix sum, which is that form's oracle role.
    """
    n_tok = F.size(tokens())
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(
            F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int").alias("shard_id"),
            "doc_id",
            n_tok.alias("n_tokens"),
        )
        .select(
            "shard_id",
            "doc_id",
            "n_tokens",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("start_offset"),
        )
        .select(
            "shard_id",
            "doc_id",
            "n_tokens",
            "start_offset",
            (F.col("start_offset") / budget).cast("bigint").alias("bin_id"),
            (F.col("start_offset") % budget).alias("offset_in_bin"),
        )
    )


def stratified_sample(
    docs: DataFrame, rates: dict[str, float] | None = None
) -> DataFrame:
    """Deterministic hash-based stratified sampling (corpus mixing): keep a
    doc iff uniform(md5(doc_id)) < rate(lang). Hash sampling (not rand())
    so reruns/retries agree row-for-row on any cluster — the property that
    makes sampled pipelines idempotent. Rows keep no state; scales as a
    pure filter."""
    rates = SAMPLE_RATES if rates is None else rates
    u = md5_prefix_value(F.col("doc_id").cast("string"), 4) / F.lit(float(16**4))
    rate = None
    for lang, r in rates.items():
        rate = (
            F.when(F.col("lang") == lang, F.lit(r))
            if rate is None
            else rate.when(F.col("lang") == lang, F.lit(r))
        )
    return docs.filter(u < rate.otherwise(F.lit(0.0))).select("doc_id", "lang", "source")


UPSAMPLE_WEIGHTS = {"en": 1.0, "de": 1.5, "es": 2.0, "fr": 2.5, "zh": 3.0}


def weighted_resample(
    docs: DataFrame, weights: dict[str, float] | None = None
) -> DataFrame:
    """Deterministic weighted replication (the UPSAMPLING half of corpus
    mixing; :func:`stratified_sample` is the downsampling half): a doc with
    weight w appears floor(w) times, plus one more iff
    uniform(md5(doc_id)) < frac(w) — so expected copies = w exactly, with
    no rand() (reruns/retries agree row-for-row). explode(sequence) emits
    the copies with a copy_no for downstream shard assignment; rows with
    zero copies drop out. Pure narrow transform — scales as a map."""
    weights = UPSAMPLE_WEIGHTS if weights is None else weights
    u = md5_prefix_value(F.col("doc_id").cast("string"), 4) / F.lit(float(16**4))
    wt = None
    for lang, w in weights.items():
        wt = (
            F.when(F.col("lang") == lang, F.lit(w))
            if wt is None
            else wt.when(F.col("lang") == lang, F.lit(w))
        )
    wt = wt.otherwise(F.lit(0.0))
    n_copies = (
        F.floor(wt) + F.when(u < wt - F.floor(wt), F.lit(1)).otherwise(F.lit(0))
    ).cast("int")
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1), n_copies)
    ).otherwise(F.array().cast("array<int>"))
    return docs.select(
        "doc_id", "lang", F.explode(copies).alias("copy_no")
    )


TFIDF_TOP_K = 5


def tfidf_top_terms(docs: DataFrame, top_k: int = TFIDF_TOP_K) -> DataFrame:
    """TF-IDF keyword extraction: top-k terms per document by
    tf · (ln((N+1)/(df+1)) + 1), smoothed sklearn-style.

    One explode feeds BOTH frequencies: tf = count per (doc, term), and
    df = count of docs per term derived from the tf aggregate itself (a
    second aggregation over already-reduced rows — no second scan of the
    corpus). N arrives as a broadcast scalar cross join. df is
    vocabulary-sized, so at 100 TB the tf⋈df join broadcasts the df side.
    Ranking follows the repo's oracle convention: order by the ROUNDED
    score (qround 4dp on both engines) with the term as unique tiebreak,
    so cross-engine libm drift in ln() cannot reorder rows."""
    tf = (
        spread(docs)
        .select("doc_id", F.explode(tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("int").alias("tf"),
            F.col("df").cast("int").alias("df"),
            qround(
                F.col("tf") * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1), 4
            ).alias("tfidf"),
        )
    )
    pick = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.select(
            "doc_id", "term", "tf", "df", "tfidf", F.row_number().over(pick).alias("rank")
        )
        .filter(F.col("rank") <= top_k)
        .select("doc_id", "term", "tf", "df", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


MIXTURE_TARGETS = {"en": 0.40, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}


def mixture_weights(
    docs: DataFrame, targets: dict[str, float] | None = None
) -> DataFrame:
    """Corpus-mixing weight computation: measure the ACTUAL per-language
    token share, then derive the replication weight that moves the corpus
    to a TARGET mixture (weight = target_share / actual_share). The output
    feeds :func:`weighted_resample` — measure → weigh → resample is the
    standard domain-mixing loop of a pretraining pipeline.

    Token counts aggregate as exact BIGINTs (one map-side-combined
    shuffle on the handful of mixture keys); the corpus total arrives as
    a broadcast scalar, never a global window. Shares/weights are single
    same-order IEEE expressions on both engines (cast-to-double before
    any arithmetic) + qround, so the oracle is value-exact. Languages
    missing from ``targets`` get weight 0 (excluded from the mix)."""
    targets = MIXTURE_TARGETS if targets is None else targets
    per = (
        spread(docs)
        .select("lang", F.size(tokens()).alias("n"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n").alias("n_tokens"))
    )
    tot = per.agg(F.sum("n_tokens").alias("total"))
    tgt = None
    for lang, t in targets.items():
        tgt = (
            F.when(F.col("lang") == lang, F.lit(float(t)))
            if tgt is None
            else tgt.when(F.col("lang") == lang, F.lit(float(t)))
        )
    tgt = tgt.otherwise(F.lit(0.0))
    totd = F.col("total").cast("double")
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        qround(F.col("n_tokens").cast("double") / totd, 6).alias("share"),
        tgt.alias("target_share"),
        qround(tgt * totd / F.col("n_tokens").cast("double"), 4).alias("weight"),
    )


BIGRAM_TOP_N = 50


def bigram_counts(docs: DataFrame, top_n: int = BIGRAM_TOP_N) -> DataFrame:
    """Count-based LM statistics: corpus-wide bigram frequencies, top-N by
    count with lexical tiebreak. Adjacent-pair construction is a JVM
    higher-order transform over the token array (no self-join, no Python);
    the groupBy combines map-side so the shuffle carries one row per
    (partition, distinct bigram); the global top-N is a TakeOrdered
    bounded heap, not a full sort."""
    tk = tokens()
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(tk) - 1),
        lambda i: F.concat_ws(" ", F.element_at(tk, i), F.element_at(tk, i + 1)),
    )
    return (
        spread(docs)
        .filter(F.size(tk) >= 2)
        .select(F.explode(pairs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(top_n)
    )


def decontaminate(
    docs: DataFrame, n: int = DECON_NGRAM, bench_mod: int = 25
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing ≥1 ``n``-gram
    with the benchmark set (here: doc_id % bench_mod == 0 stands in for the
    eval suite). Candidate generation is an inverted-index equi-join on the
    shingle — identical shape to the near-dup family, no cross join; the
    benchmark side is tiny, so at scale it broadcast-joins. Output: each
    contaminated doc with how many benchmark docs it collides with."""
    sh = spread(docs).select(
        "doc_id", F.explode(shingles(tokens(), n)).alias("shingle")
    )
    bench = sh.filter(F.col("doc_id") % bench_mod == 0).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    train = sh.filter(F.col("doc_id") % bench_mod != 0)
    return (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("bench_id").alias("n_bench_hits"))
    )


LM_SMOOTH = 0.5


def unigram_logprob_score(
    docs: DataFrame, smooth: float = LM_SMOOTH, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Perplexity-proxy quality scoring (the CCNet-style LM filter): train
    a smoothed unigram LM on the corpus itself, then score each document
    by its mean token log-probability — low scores flag gibberish /
    boilerplate / wrong-language text.

    p(t) = (count(t) + smooth) / (total + smooth·|V|), score(d) =
    Σ ln p(t_i) / |d|. ONE explode feeds both the LM counts and the
    per-doc sums; the vocabulary aggregate is broadcast back (vocab ≪
    corpus — same shape as tfidf). Per-token ln p is quantized to 6 dp
    and summed in integer space, so the cross-engine mean is exact; the
    final mean divides once and qrounds 4 dp.

    ``carry`` names doc-constant columns (e.g. lang) to ride the token
    pass through the per-doc aggregate — callers that need them then skip
    a doc-sized join-back (ccnet_quality_buckets saves a sort-merge join
    this way)."""
    tok = spread(docs).select(
        "doc_id", *carry, F.explode(tokens()).alias("term")
    )
    counts = tok.groupBy("term").agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("vocab")
    )
    p = (F.col("cnt") + F.lit(smooth)) / (
        F.col("total") + F.lit(smooth) * F.col("vocab")
    )
    q = F.floor(F.log(p) * 1e6 + F.lit(0.5)).cast("long")
    return (
        tok.join(F.broadcast(counts), "term")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id", *carry)
        .agg(F.sum(q).alias("qs"), F.count("*").alias("n_tokens"))
        .select(
            "doc_id",
            *carry,
            F.col("n_tokens").cast("int").alias("n_tokens"),
            qround(F.col("qs") / 1e6 / F.col("n_tokens"), 4).alias("mean_logprob"),
        )
    )


BPE_MERGES = 4


def _merge_fold(syms, a: str, b: str):
    """Apply one BPE merge (a,b)→ab to a symbol array with the standard
    left-to-right greedy single pass, as a JVM array fold: the merged
    symbol ab differs from a, so an occurrence consumed by a merge cannot
    chain into the next one — exactly BPE's non-overlap rule. The DuckDB
    twin runs the same fold with a space-joined string accumulator
    (list_reduce pins the accumulator to the element type); symbols are
    space-free so the delimited forms are equivalent."""
    a_lit, b_lit, ab_lit = F.lit(a), F.lit(b), F.lit(a + b)

    def step(acc, x):
        do = (F.element_at(acc, -1) == a_lit) & (x == b_lit)
        return F.when(
            do,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(ab_lit)),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        F.slice(syms, 2, F.size(syms)),
        F.array(F.element_at(syms, 1)),
        step,
    )


def _bpe_train(docs: DataFrame, n_merges: int):
    """Shared BPE training loop: returns (merge list, final vocab frame
    with the original word kept alongside its symbol list) — the merge
    table feeds :func:`bpe_merges`, the trained vocab feeds
    :func:`bpe_encode`."""
    w = F.col("w")
    chars = F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: F.substring(w, i, 1)
    )
    words = (
        spread(docs)
        .select(F.explode(tokens()).alias("w"))
        .filter(F.length(w) >= 1)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select("w", chars.alias("syms"), "freq")
        .localCheckpoint()
    )
    merges = []
    for rank in range(1, n_merges + 1):
        # filter BEFORE building the pair index: F.sequence(1, 0) yields
        # [1, 0] (inferred step -1), and element_at(syms, 0) is an ANSI
        # error — same guard as dedup.shingles
        pairs = words.filter(F.size("syms") >= 2).select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("syms"), i).alias("a"),
                        F.element_at(F.col("syms"), i + F.lit(1)).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        merges.append((rank, row["a"], row["b"], int(row["cnt"])))
        words = words.select(
            "w",
            _merge_fold(F.col("syms"), row["a"], row["b"]).alias("syms"),
            "freq",
        ).localCheckpoint()
    return merges, words


def bpe_merges(docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Learn a BPE merge table from the corpus — the tokenizer-training
    primitive: start from character symbols per distinct word (weighted
    by corpus frequency), then repeatedly (1) count adjacent symbol
    pairs, (2) take the most frequent pair (count desc, pair lexicographic
    tiebreak), (3) merge it everywhere, ``n_merges`` times.

    Output: (merge_rank, lhs, rhs, pair_count) — the merge table in
    learned order, pair_count as counted at selection time.

    Scale shape per round: ONE map-side-combined shuffle on the pair key
    (pairs explode from the vocab table, which is distinct-word-sized,
    not corpus-sized — the classic BPE-trainer factorization), a 1-row
    argmax collect (control plane, like the watermark reads), and a
    narrow vocab-sized fold to apply the merge. The vocab frame is
    localCheckpoint'd per round so plan depth stays flat in n_merges.
    At 100 TB the vocab is ~10⁸ distinct words — still the small side by
    3-4 orders of magnitude."""
    merges, _ = _bpe_train(docs, n_merges)
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, pair_count long"
    )


def bpe_encode(docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Tokenize the corpus with the learned merge table: each word's
    final symbol list after training IS its subword encoding, so encoding
    is ONE equi-join of the exploded corpus tokens against the trained
    vocab — the apply half of the tokenizer story.

    Output: (doc_id, n_words, n_subwords, subword_ratio) per document —
    the fertility metric (subwords per word) every tokenizer report
    tracks.

    Scale shape: the vocab side is distinct-word-sized; the join is a
    plain equi-join on the word (broadcast when the vocab fits, shuffle
    otherwise — at 10⁸ vocab entries Spark picks the shuffle form), then
    one groupBy on doc_id."""
    _, vocab = _bpe_train(docs, n_merges)
    enc = vocab.select("w", F.size("syms").alias("n_sub"))
    tok = (
        spread(docs)
        .select("doc_id", F.explode(tokens()).alias("w"))
        .filter(F.length("w") >= 1)
    )
    return (
        tok.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
            qround(
                F.sum("n_sub").cast("double") / F.count("*"), 4
            ).alias("subword_ratio"),
        )
    )


SAMPLE_N = 200


def uniform_sample_n(docs: DataFrame, n: int = SAMPLE_N) -> DataFrame:
    """Exact-size uniform sample: keep the n documents with the LOWEST
    md5(doc_id) — the distributed, deterministic equivalent of reservoir
    sampling (hash order statistics give every row equal inclusion
    probability; reruns and retries agree row-for-row, which rand()-based
    reservoirs cannot promise). Complements stratified_sample (rate-based)
    with an exact-count contract.

    Scale shape: TakeOrderedAndProject — each partition keeps its local
    top-n by the hash, the driver merges n·n_partitions candidate rows;
    no full sort, no global shuffle of the table."""
    u = md5_prefix_value(F.col("doc_id").cast("string"), 8)
    return (
        docs.select("doc_id", "lang", "source", u.alias("sample_key"))
        .orderBy(F.asc("sample_key"), F.asc("doc_id"))
        .limit(n)
    )


HH_CAPACITY = 200


def _mg_candidates(batches):
    """Per-partition Misra–Gries summary over whitespace tokens: at most
    HH_CAPACITY live counters regardless of vocabulary size. Batch form:
    exact vectorized value_counts per Arrow batch merged into the capped
    summary; when the summary overflows, subtract the (capacity+1)-th
    largest weight from every counter and drop the non-positive ones —
    the classic MG decrement, batched. Guarantee preserved: a term with
    true partition count > N_p/capacity ends with a positive counter."""
    import pandas as pd

    summary: dict[str, int] = {}
    for pdf in batches:
        counts = (
            pdf["text"].dropna().str.split(" ").explode().value_counts()
        )
        for t, c in counts.items():
            summary[t] = summary.get(t, 0) + int(c)
        if len(summary) > HH_CAPACITY:
            d = sorted(summary.values(), reverse=True)[HH_CAPACITY]
            summary = {t: v - d for t, v in summary.items() if v > d}
    yield pd.DataFrame({"term": sorted(summary)})


def heavy_hitters(docs: DataFrame, k: int = 25, capacity: int = HH_CAPACITY) -> DataFrame:
    """EXACT top-k frequent tokens with bounded-memory candidate
    generation — the two-pass heavy-hitter pattern (Misra–Gries summaries
    per partition, then an exact recount of candidates only).

    Why not plain explode+groupBy (vocab_top_terms)? That shuffle carries
    one row per (partition, distinct term) — fine until the vocabulary
    itself is shuffle-sized (web-scale n-grams, URLs, user agents). Here
    phase 1 holds ≤ `capacity` counters per partition (MG guarantee: any
    term with partition count > N_p/capacity survives; counts summing
    across partitions, any term with GLOBAL count > N/capacity survives
    in at least one summary — in particular every true heavy hitter).
    Phase 2 recounts ONLY the ≤ capacity×partitions candidates via a
    broadcast semi-join on the token stream, so the exact aggregate's key
    space is bounded by construction, not by the data. The result is
    provably the exact top-k whenever the kth count exceeds N/capacity
    (pinned for the fixture in tests/test_corpus.py).

    Output: (term, n), count-desc then term for determinism.
    """
    cand = spread(docs).mapInPandas(_mg_candidates, "term string")
    return (
        docs.select(F.explode(tokens()).alias("term"))
        .join(F.broadcast(cand.dropDuplicates(["term"])), "term")
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(k)
    )


def ccnet_quality_buckets(docs: DataFrame, smooth: float = LM_SMOOTH) -> DataFrame:
    """CCNet-style per-language quality bucketing (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data" — public): score every document with the corpus-trained LM
    (:func:`unigram_logprob_score` is the perplexity proxy), then split
    each language into equal head / middle / tail tertiles — head is the
    highest-logprob (lowest-perplexity) third, the slice a pretraining
    mix keeps or upsamples.

    Tertile assignment is POSITIONAL (row_number within lang over the
    total order (mean_logprob, doc_id), bucket by integer arithmetic
    rn*3 vs n) — no float quantile thresholds, so both engines cut in
    exactly the same place even with ties. Exactness costs one per-lang
    sort window over the scored (doc-sized, not token-sized) frame;
    production CCNet fits the two cutoff scores on a bounded sample and
    applies them as a narrow map — this operator is the exact-verify twin
    of that plan, and its cutoffs are recoverable from the output
    (min/max score per bucket).

    Output: (lang, bucket, n_docs, min_score, max_score), ≤ 3 rows per
    language.
    """
    with_lang = unigram_logprob_score(docs, smooth, carry=("lang",))
    w = Window.partitionBy("lang").orderBy("mean_logprob", "doc_id")
    ranked = with_lang.select(
        "lang",
        "mean_logprob",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("lang")).alias("n"),
    )
    bucket = (
        F.when(F.col("rn") * 3 <= F.col("n"), F.lit("tail"))
        .when(F.col("rn") * 3 <= F.col("n") * 2, F.lit("middle"))
        .otherwise(F.lit("head"))
    )
    return (
        ranked.select("lang", bucket.alias("bucket"), "mean_logprob")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("mean_logprob").alias("min_score"),
            F.max("mean_logprob").alias("max_score"),
        )
    )


PMI_MIN_COUNT = 5
PMI_TOP_N = 40


def pmi_collocations(
    docs: DataFrame, min_count: int = PMI_MIN_COUNT, top_n: int = PMI_TOP_N
) -> DataFrame:
    """Collocation mining by pointwise mutual information (Church & Hanks
    1990 — public): the adjacent token pairs that co-occur far more than
    their unigram frequencies predict. PMI(a,b) =
    ln( p(a,b) / (p(a)·p(b)) ) with p from corpus counts; a min-count
    floor suppresses the classic rare-pair PMI blow-up.

    Scale shape: pair construction is the same JVM higher-order transform
    as :func:`bigram_counts` (no self-join, no Python); pair counts are
    the one data-sized map-side-combined shuffle; unigram counts are
    vocabulary-sized and broadcast onto the pair aggregate twice (left
    and right term); the two corpus totals arrive as one broadcast scalar
    row. Top-N is a TakeOrdered bounded heap over the ROUNDED score with
    (term_a, term_b) as the unique tiebreak — cross-engine libm drift in
    ln() cannot reorder rows (same convention as tfidf_top_terms).
    """
    tk = tokens()
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(tk) - 1),
        lambda i: F.struct(
            F.element_at(tk, i).alias("term_a"),
            F.element_at(tk, i + 1).alias("term_b"),
        ),
    )
    base = spread(docs)
    pair_counts = (
        base.filter(F.size(tk) >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.term_a", "p.term_b")
        .groupBy("term_a", "term_b")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    uni = (
        base.select(F.explode(tk).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n_term"))
    )
    totals = uni.agg(F.sum("n_term").alias("n_uni"))
    # total adjacent pairs = sum over docs of (len-1) = unigram total minus
    # the count of docs that actually tokenize — a NULL-text doc yields
    # zero tokens, so counting it here would undercount the denominator
    # and shift every PMI by a constant (round-5 advisor finding). split()
    # gives every NON-null doc ≥1 token (empty text → ['']), so
    # "text IS NOT NULL" is exactly the Σ max(len-1, 0) identity.
    n_docs = base.agg(
        F.sum(F.col("text").isNotNull().cast("long")).alias("n_docs")
    )
    ua = uni.select(F.col("term").alias("term_a"), F.col("n_term").alias("n_a"))
    ub = uni.select(F.col("term").alias("term_b"), F.col("n_term").alias("n_b"))
    nu = F.col("n_uni").cast("double")
    nb = (F.col("n_uni") - F.col("n_docs")).cast("double")
    pmi = F.log(
        (F.col("n_pair").cast("double") * nu * nu)
        / (nb * F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    return (
        pair_counts.join(F.broadcast(ua), "term_a")
        .join(F.broadcast(ub), "term_b")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            F.col("n_pair").cast("int").alias("n_pair"),
            qround(pmi, 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("term_a"), F.asc("term_b"))
        .limit(top_n)
    )


SOURCE_CAP = 500


def source_cap(docs: DataFrame, cap: int = SOURCE_CAP) -> DataFrame:
    """Per-source document cap — the "max N pages per domain" guard every
    web-corpus pipeline applies so no single site dominates the mix
    (Common Crawl-derived corpora cap per registered domain; ``source``
    plays that role here). Keeps the ``cap`` docs with the LOWEST
    md5(doc_id) per source — a deterministic uniform choice, not
    first-crawled bias; reruns and retries agree row-for-row.

    Scale shape: two-phase top-N. Phase 1 pre-truncates WITHIN each
    (source, salt) bucket — 16-way salted windows, so a million-doc hot
    domain sorts as 16 independent ~cap-bounded streams instead of one
    hot partition. Phase 2 ranks the surviving ≤16·cap rows per source —
    the global winners are necessarily inside their salt bucket's local
    top-cap, so the result is bit-identical to the naive single window
    the DuckDB twin runs. The phase-2 input is cap-bounded per source,
    never data-sized.
    """
    u = md5_prefix_value(F.col("doc_id").cast("string"), 8)
    salted = docs.select(
        "doc_id", "lang", "source", u.alias("sample_key"),
        (F.col("doc_id") % 16).alias("salt"),
    )
    w1 = Window.partitionBy("source", "salt").orderBy("sample_key", "doc_id")
    pre = (
        salted.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= cap)
        .drop("rn1", "salt")
    )
    w2 = Window.partitionBy("source").orderBy("sample_key", "doc_id")
    return (
        pre.withColumn("rank_in_source", F.row_number().over(w2))
        .filter(F.col("rank_in_source") <= cap)
        .select(
            "doc_id", "lang", "source",
            F.col("rank_in_source").cast("int").alias("rank_in_source"),
        )
    )


DRIFT_BASELINE_SOURCE = "src0"
DRIFT_SMOOTH = 0.5
DRIFT_TOP_N = 20
_DRIFT_SCALE = int(1e9)


def corpus_drift_kl(
    docs: DataFrame,
    baseline_source: str = DRIFT_BASELINE_SOURCE,
    smooth: float = DRIFT_SMOOTH,
    top_n: int = DRIFT_TOP_N,
) -> DataFrame:
    """Corpus drift detection: KL divergence between the incoming corpus
    P (every source except ``baseline_source``) and the baseline corpus Q
    (the reference slice), with the top contributing terms — the check a
    training pipeline runs before folding a new crawl into the mix, so a
    topical/language shift is a number with named culprits, not a
    surprise at eval time.

    KL(P‖Q) = Σ_t p_t ln(p_t/q_t) over the UNION vocabulary with
    add-``smooth`` smoothing (so q_t is never 0). ONE token pass computes
    both sides' counts as conditional aggregates on the same groupBy;
    corpus totals broadcast back. Per-term contributions are quantized to
    1e-9 and the TOTAL row sums those integers — order-insensitive, so
    both engines report the identical divergence (same recipe as
    unigram_logprob_score). Output: top_n terms by |contribution| plus a
    '<TOTAL>' row carrying the full KL.
    """
    is_base = F.col("source") == baseline_source
    tok = spread(docs).select(is_base.alias("b"), F.explode(tokens()).alias("term"))
    counts = tok.groupBy("term").agg(
        F.sum(F.when(~F.col("b"), 1).otherwise(0)).alias("c_in"),
        F.sum(F.when(F.col("b"), 1).otherwise(0)).alias("c_ref"),
    )
    totals = counts.agg(
        F.sum("c_in").alias("t_in"),
        F.sum("c_ref").alias("t_ref"),
        F.count("*").alias("vocab"),
    )
    p = (F.col("c_in") + F.lit(smooth)) / (
        F.col("t_in") + F.lit(smooth) * F.col("vocab")
    )
    q = (F.col("c_ref") + F.lit(smooth)) / (
        F.col("t_ref") + F.lit(smooth) * F.col("vocab")
    )
    contrib_q = F.floor(
        p * F.log(p / q) * F.lit(float(_DRIFT_SCALE)) + F.lit(0.5)
    ).cast("long")
    scored = counts.crossJoin(F.broadcast(totals)).select(
        "term",
        F.col("c_in").cast("long").alias("c_in"),
        F.col("c_ref").cast("long").alias("c_ref"),
        contrib_q.alias("cq"),
    )
    top = (
        scored.orderBy(F.abs(F.col("cq")).desc(), F.asc("term"))
        .limit(top_n)
        .select(
            "term", "c_in", "c_ref",
            (F.col("cq") / F.lit(float(_DRIFT_SCALE))).alias("kl_contrib"),
        )
    )
    total = scored.agg(
        (F.sum("cq") / F.lit(float(_DRIFT_SCALE))).alias("kl_contrib")
    ).select(
        F.lit("<TOTAL>").alias("term"),
        F.lit(None).cast("long").alias("c_in"),
        F.lit(None).cast("long").alias("c_ref"),
        "kl_contrib",
    )
    return top.unionByName(total)


WS_SAMPLE_N = 200


def weighted_sample_topn(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    n: int = WS_SAMPLE_N,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement by the Efraimidis–Spirakis
    one-pass reservoir scheme (Efraimidis & Spirakis 2006 — public): each
    row draws u ~ U(0,1) and the sample is the top-n rows by u^(1/w).
    This is THE distributed weighted sampler — order statistics make it
    a TakeOrdered bounded heap, no per-group state, restart-safe.

    Determinism recipe: u comes from md5(doc_id) (as in
    uniform_sample_n), and the sort key is the MONOTONE-equivalent
    ln(u)/w instead of u^(1/w) — ln is correctly rounded in both
    engines, pow is the one libm call with real cross-platform drift.
    Ordering uses the qround'd key with doc_id tiebreak (repo oracle
    convention). Zero-weight languages never sample (key → -inf guarded
    out by a filter).
    """
    weights = UPSAMPLE_WEIGHTS if weights is None else weights
    u = (md5_prefix_value(F.col("doc_id").cast("string"), 8) + 1) / F.lit(
        float(16**8)
    )
    wt = None
    for lang, wv in weights.items():
        wt = (
            F.when(F.col("lang") == lang, F.lit(float(wv)))
            if wt is None
            else wt.when(F.col("lang") == lang, F.lit(float(wv)))
        )
    wt = wt.otherwise(F.lit(0.0))
    # guard the division itself: ln(u)/0.0 is ±Inf/NaN, and while the w > 0
    # filter drops those rows today, the expression must stay well-defined
    # even if evaluation order ever changes (qround before filter)
    key = F.when(wt > 0, qround(F.log(u) / wt, 9))
    return (
        docs.select("doc_id", "lang", "source", wt.alias("w"), key.alias("es_key"))
        .filter(F.col("w") > 0)
        .orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(n)
    )


DSIR_BUCKETS = 1024
DSIR_SMOOTH = 0.5
DSIR_TARGET_LANG = "en"
DSIR_TOP_N = 300


def dsir_importance(
    docs: DataFrame,
    target_lang: str = DSIR_TARGET_LANG,
    n_buckets: int = DSIR_BUCKETS,
    smooth: float = DSIR_SMOOTH,
    top_n: int = DSIR_TOP_N,
) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, "Data Selection for Language Models via Importance Resampling" —
    public): represent each document as a bag of HASHED BIGRAM features,
    fit smoothed categorical distributions over the hash buckets for the
    TARGET slice (here: ``lang = target_lang``) and for the RAW corpus,
    and score every document by its log importance weight
    Σ_b c_doc(b)·(ln p̂_target(b) − ln p̂_raw(b)). Top-weighted docs are the
    ones to up-sample when aiming the corpus at the target distribution.

    Scale shape: TWO corpus passes, which is the floor for this operator —
    the bucket distributions must be fully fitted before any document can
    be scored (same as the reference method's fit-then-score split). Each
    pass explodes bigrams into a per-(doc, bucket) count; the fit pass
    re-aggregates that reduced frame down to the BOUNDED bucket table
    (n_buckets rows — it cannot grow with data), which broadcasts back
    onto the score pass, so every shuffle after the explode carries
    (doc × bucket)-bounded rows, never gram-sized ones. Buckets come from
    md5 (the hash both engines share); 16^4 is divisible by n_buckets, so
    the modulo is unbiased. Per-element log-ratios are quantized to integer
    micro-units and summed exactly (order-insensitive on both engines); the
    final score qrounds at 6 dp with doc_id as the unique tiebreak.
    """
    assert (16 ** 4) % n_buckets == 0, "n_buckets must divide 16^4"
    tk = tokens()
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tk) - 1),
        lambda i: F.concat_ws(" ", F.element_at(tk, i), F.element_at(tk, i + 1)),
    )
    base = spread(docs).filter(F.size(tk) >= 2)
    per_db = (
        base.select("doc_id", "lang", F.explode(grams).alias("g"))
        .select(
            "doc_id",
            "lang",
            (md5_prefix_value(F.col("g"), 4) % n_buckets).alias("b"),
        )
        .groupBy("doc_id", "lang", "b")
        .agg(F.count("*").alias("c"))
    )
    stats = per_db.groupBy("b").agg(
        F.sum("c").alias("n_raw"),
        F.sum(F.when(F.col("lang") == target_lang, F.col("c")).otherwise(F.lit(0))).alias("n_tgt"),
    )
    totals = stats.agg(
        F.sum("n_raw").alias("t_raw"), F.sum("n_tgt").alias("t_tgt")
    )
    sB = F.lit(smooth) * F.lit(float(n_buckets))
    lr = F.log(
        (F.col("n_tgt") + F.lit(smooth)) / (F.col("t_tgt") + sB)
    ) - F.log((F.col("n_raw") + F.lit(smooth)) / (F.col("t_raw") + sB))
    ratio = (
        stats.crossJoin(F.broadcast(totals))
        .select("b", F.floor(lr * 1e6 + F.lit(0.5)).cast("long").alias("lr_q"))
    )
    return (
        per_db.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("c") * F.col("lr_q")).alias("qs"),
            F.sum("c").alias("n_grams"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("int").alias("n_grams"),
            qround(F.col("qs") / 1e6, 6).alias("dsir_logratio"),
        )
        .orderBy(F.desc("dsir_logratio"), F.asc("doc_id"))
        .limit(top_n)
    )


LOGREG_LR = 0.5
LOGREG_ITERS = 5
LOGREG_LABEL_LANG = "en"
LOGREG_FEATURES = ("bias", "f_tokens", "f_chars", "f_ttr")


def _q6(x: float) -> float:
    """floor(x·1e6 + 0.5)/1e6 with plain IEEE double ops — the same
    primitive sequence the oracle SQL runs, so driver-side weight updates
    are bit-identical across engines (numeric.qround's contract)."""
    import math

    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


def logreg_quality_train(
    docs: DataFrame,
    lr: float = LOGREG_LR,
    iters: int = LOGREG_ITERS,
    label_lang: str = LOGREG_LABEL_LANG,
) -> DataFrame:
    """Distributed logistic-regression training (quality-classifier
    shape: predict ``lang == label_lang`` from document statistics) via
    full-batch gradient descent — each iteration is ONE map-side-combined
    aggregate over the feature frame; the 4-weight model lives on the
    driver (control plane, like pagerank's convergence scalar) and is
    folded back in as literals. Features: bias, tokens/100, chars/1000,
    type-token ratio (docs must be non-empty — fixture min dl is 10).

    Cross-engine exactness (pagerank's template, registry_geo docstring
    conventions): per-row gradient contributions are quantized to 1e-6
    and summed as BIGINT (order-free); each weight update runs the same
    IEEE op sequence in Python and SQL and is re-quantized to the 1e-6
    grid, so after T iterations the weights — and the sign-based
    predictions — are bit-identical to the DuckDB twin. exp() is the one
    libm call; sub-ulp engine differences sit ~10 orders below the
    quantization step.

    Output: one row per feature with the learned weight, plus corpus
    metrics (n_docs, n_pos, n_correct under the final model — prediction
    is sign(w·x), no exp needed).

    Scale: the feature frame is localCheckpointed once and re-aggregated
    per iteration (T tiny-result jobs, no shuffle growth, no lineage
    growth); nothing per-doc ever reaches the driver."""
    feats = docs.select(
        (F.col("lang") == label_lang).cast("int").alias("y"),
        F.lit(1.0).alias("f0"),
        (F.size(tokens()) / F.lit(100.0)).alias("f1"),
        (F.col("n_chars") / F.lit(1000.0)).alias("f2"),
        (
            F.size(F.array_distinct(tokens())).cast("double")
            / F.size(tokens()).cast("double")
        ).alias("f3"),
    ).localCheckpoint()
    nf = len(LOGREG_FEATURES)
    w = [0.0] * nf
    n_docs = None
    for _ in range(iters):
        z = sum(F.lit(w[j]) * F.col(f"f{j}") for j in range(nf))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - F.col("y")
        row = feats.agg(
            *[
                F.sum(
                    F.floor((err * F.col(f"f{j}")) * 1e6 + F.lit(0.5)).cast("long")
                ).alias(f"q{j}")
                for j in range(nf)
            ],
            F.count("*").alias("n"),
        ).first()
        n_docs = int(row["n"])
        w = [
            _q6(w[j] - lr * ((int(row[f"q{j}"]) / 1000000.0) / n_docs))
            for j in range(nf)
        ]
    zf = sum(F.lit(w[j]) * F.col(f"f{j}") for j in range(nf))
    pred = (zf >= 0).cast("int")
    metrics = feats.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum((pred == F.col("y")).cast("int")).cast("long").alias("n_correct"),
    )
    spark = docs.sparkSession
    weights = spark.createDataFrame(
        [(name, w[j]) for j, name in enumerate(LOGREG_FEATURES)],
        "feature string, weight double",
    )
    return weights.crossJoin(F.broadcast(metrics)).select(
        "feature", "weight", "n_docs", "n_pos", "n_correct"
    )


KEYNESS_FOCUS_LANG = "en"
KEYNESS_MIN_COUNT = 10
KEYNESS_TOP_N = 30


def keyness_terms(
    docs: DataFrame,
    focus_lang: str = KEYNESS_FOCUS_LANG,
    min_count: int = KEYNESS_MIN_COUNT,
    top_n: int = KEYNESS_TOP_N,
) -> DataFrame:
    """Corpus keyness: which terms are characteristically over/under-used
    in the focus sub-corpus (lang == focus_lang) vs the rest — Dunning's
    log-likelihood G² (Dunning 1993, "Accurate Methods for the
    Statistics of Surprise and Coincidence", public), the standard
    corpus-linguistics keyness statistic (χ² misbehaves on rare terms):

        G² = 2·( a·ln(a/E_a) + b·ln(b/E_b) ),  E_a = (a+b)·A/(A+B)

    with a/b the term's token count in focus/reference and A/B the
    sub-corpus token totals. Zero cells contribute 0 (the limit of
    x·ln x). ``direction`` is +1 when the focus over-uses the term
    (exact integer cross-product a·B > b·A — no float ratio).

    Scale shape: ONE token explode + ONE map-side-combined shuffle on
    the term computing both sides' counts conditionally; totals are a
    broadcast scalar; rounded-G² TakeOrdered with the term as tiebreak.
    ln() is the one libm call; the 1e-6 qround pin sits far above
    sub-ulp engine drift (the logreg exp() argument).
    """
    is_focus = F.col("lang") == focus_lang
    toks = spread(docs).select(
        is_focus.alias("f"), F.explode(tokens()).alias("term")
    )
    counts = toks.groupBy("term").agg(
        F.sum(F.when(F.col("f"), 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("f"), 0).otherwise(1)).cast("long").alias("b"),
    )
    totals = counts.agg(
        F.sum("a").cast("long").alias("ta"), F.sum("b").cast("long").alias("tb")
    )
    a, b = F.col("a").cast("double"), F.col("b").cast("double")
    ta, tb = F.col("ta").cast("double"), F.col("tb").cast("double")
    tot = ta + tb
    ea = (a + b) * (ta / tot)
    eb = (a + b) * (tb / tot)
    term_a = F.when(F.col("a") > 0, a * F.log(a / ea)).otherwise(F.lit(0.0))
    term_b = F.when(F.col("b") > 0, b * F.log(b / eb)).otherwise(F.lit(0.0))
    g2 = F.lit(2.0) * (term_a + term_b)
    direction = F.when(
        F.col("a") * F.col("tb") > F.col("b") * F.col("ta"), 1
    ).otherwise(-1)
    return (
        counts.filter((F.col("a") + F.col("b")) >= min_count)
        .crossJoin(F.broadcast(totals))
        .select(
            "term",
            F.col("a").alias("n_focus"),
            F.col("b").alias("n_ref"),
            qround(g2, 6).alias("g2"),
            direction.cast("int").alias("direction"),
        )
        .orderBy(F.desc("g2"), F.asc("term"))
        .limit(top_n)
    )


ZIPF_TOP_V = 1000


def zipf_fit(docs: DataFrame, top_v: int = ZIPF_TOP_V) -> DataFrame:
    """Zipf's-law fit of the corpus vocabulary: OLS of ln(frequency) on
    ln(rank) over the top-V terms — the standard sanity probe that a
    text corpus has natural-language token statistics (synthetic or
    template-heavy corpora show a visibly non-Zipfian slope; natural
    text sits near −1).

    Scale shape: one token explode + ONE map-side-combined term count
    (data-sized), then TakeOrdered truncation to the top-V frame
    (deterministic freq-desc/term-asc tiebreak) — ranks, logs and the
    OLS moments all run on the V-row bounded frame, never on the
    vocabulary at large. ln() is the one libm call; moments are exact
    decimal sums over V rows and the closed-form slope/intercept/r²
    run identical IEEE shapes in both engines, qround-pinned.

    Output: one row (n_terms, slope, intercept, r2).
    """
    counts = (
        spread(docs)
        .select(F.explode(tokens()).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(top_v)
    )
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    xy = counts.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    m = xy.agg(
        F.count("*").cast("double").alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / vx
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = (cov * cov) / (vx * vy)
    return m.select(
        n.cast("long").alias("n_terms"),
        qround(slope, 6).alias("slope"),
        qround(intercept, 6).alias("intercept"),
        qround(r2, 6).alias("r2"),
    )


CM_D = 4  # sketch depth (hash rows)
CM_W = 2048  # sketch width (buckets per row)
CM_TOP_K = 20


def _cm_cells(term: Column, d: int = CM_D, w: int = CM_W) -> Column:
    """Array of (row, bucket) sketch cells for a term. Row r's hash is 8
    hex chars of md5 at offset 8·r — four independent 32-bit lanes from
    ONE md5 per term, mod the row width (the shared-hash convention of
    dedup.simhash; md5 is the hash both engines agree on)."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (md5_prefix_value(term, 8, offset=8 * r) % w).alias("bucket"),
            )
            for r in range(d)
        ]
    )


def count_min_heavy(docs: DataFrame, k: int = CM_TOP_K) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005, public) readout:
    build a d×w sketch of corpus term frequencies, then report the exact
    top-k terms with their sketch estimates and overestimation error.

        est(t) = min_r sketch[r][hash_r(t)]   with   est(t) ≥ exact(t)

    The sketch is the 100 TB story: its size is d·w counters regardless
    of corpus size, it's a pure additive aggregate (map-side partial
    combine does almost all the work; the shuffle carries ≤ d·w rows per
    map partition), and sketches from disjoint corpus shards merge by
    cell-wise +. The exact counts exist here only to pin the estimate's
    one-sided error; integer math end-to-end, so the DuckDB twin is
    bit-exact.
    """
    tc = (
        spread(docs)
        .select(F.explode(tokens()).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    cells = tc.select(
        "n", F.explode(_cm_cells(F.col("term"))).alias("cell")
    ).select(F.col("cell.r").alias("r"), F.col("cell.bucket").alias("bucket"), "n")
    sketch = cells.groupBy("r", "bucket").agg(F.sum("n").alias("bn"))
    topk = tc.orderBy(F.desc("n"), F.asc("term")).limit(k)
    probes = topk.select(
        "term", "n", F.explode(_cm_cells(F.col("term"))).alias("cell")
    ).select("term", "n", F.col("cell.r").alias("r"), F.col("cell.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("term", "n")
        .agg(F.min("bn").alias("est"))
        .select(
            "term",
            F.col("n").cast("long").alias("exact_count"),
            F.col("est").cast("long").alias("cm_estimate"),
            (F.col("est") - F.col("n")).cast("long").alias("overestimate"),
        )
        .orderBy(F.desc("exact_count"), F.asc("term"))
    )


STUMP_LABEL_LANG = "en"
STUMP_GRID = 2  # threshold grid: qround(feature, 2)


def decision_stump_train(docs: DataFrame, label_lang: str = STUMP_LABEL_LANG) -> DataFrame:
    """Decision-stump training by histogram split finding — the
    one-level form of distributed tree learning (PLANET, Panda et al.
    2009; XGBoost's hist method — both public). Same task and features
    as :func:`logreg_quality_train` (predict ``lang == label_lang`` from
    tokens/100, chars/1000, type-token ratio), different model family.

    Candidate thresholds are the 1e-2-quantized feature values
    (histogram bins — the trick that makes tree training scale: split
    stats per (feature, bin), never per row). For every candidate
    "f ≤ t": weighted Gini impurity of the two sides from CUMULATIVE
    (n, n_pos) along the bin axis — one window PARTITIONED BY feature
    over the bin histogram, then a global argmin on the candidate frame
    (features × bins — tiny). Ties break (feature, threshold) ascending.

    Output: the chosen split with side stats and the stump's training
    accuracy (majority class per side). Exact: counts are integers,
    every ratio is qround'ed on both engines.
    """
    base = docs.select(
        (F.col("lang") == label_lang).cast("int").alias("y"),
        qround(F.size(tokens()) / F.lit(100.0), STUMP_GRID).alias("f1"),
        qround(F.col("n_chars") / F.lit(1000.0), STUMP_GRID).alias("f2"),
        qround(
            F.size(F.array_distinct(tokens())).cast("double")
            / F.size(tokens()).cast("double"),
            STUMP_GRID,
        ).alias("f3"),
    )
    long = base.select(
        "y",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(f).alias("feature"), F.col(f).alias("bin"))
                    for f in ("f1", "f2", "f3")
                ]
            )
        ).alias("fb"),
    ).select(F.col("fb.feature").alias("feature"), F.col("fb.bin").alias("bin"), "y")
    # null-bin guard (ADVICE r8): a NULL feature value (e.g. null text)
    # would sort NULLS FIRST in Spark's cumulative window but NULLS LAST
    # in DuckDB's, shifting every split stat between engines — drop null
    # bins from the histogram identically on both sides instead (a stump
    # cannot split on "f ≤ NULL" anyway)
    hist = (
        long.filter(F.col("bin").isNotNull())
        .groupBy("feature", "bin")
        .agg(F.count("*").alias("n"), F.sum("y").alias("pos"))
    )
    wcum = (
        Window.partitionBy("feature")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("feature")
    cand = (
        hist.withColumn("nl", F.sum("n").over(wcum))
        .withColumn("pl", F.sum("pos").over(wcum))
        .withColumn("nt", F.sum("n").over(wtot))
        .withColumn("pt", F.sum("pos").over(wtot))
        .filter(F.col("nl") < F.col("nt"))  # right side must be non-empty
    )
    nl, pl = F.col("nl").cast("double"), F.col("pl").cast("double")
    nt, pt = F.col("nt").cast("double"), F.col("pt").cast("double")
    nr, pr = nt - nl, pt - pl

    def gini(p: Column, n: Column) -> Column:
        a = p / n
        b = (n - p) / n
        return F.lit(1.0) - a * a - b * b

    weighted = (nl / nt) * gini(pl, nl) + (nr / nt) * gini(pr, nr)
    scored = cand.withColumn("g", qround(weighted, 6))
    w_pick = Window.orderBy(F.asc("g"), F.asc("feature"), F.asc("bin"))
    maj_l = F.greatest(pl, nl - pl)
    maj_r = F.greatest(pr, nr - pr)
    return (
        scored.withColumn("rk", F.row_number().over(w_pick))
        .filter(F.col("rk") == 1)
        .select(
            "feature",
            F.col("bin").alias("threshold"),
            F.col("g").alias("gini_weighted"),
            F.col("nl").cast("long").alias("n_left"),
            (F.col("nt") - F.col("nl")).cast("long").alias("n_right"),
            F.col("pl").cast("long").alias("pos_left"),
            (F.col("pt") - F.col("pl")).cast("long").alias("pos_right"),
            qround((maj_l + maj_r) / nt, 6).alias("train_accuracy"),
        )
    )


CV_FOLDS = 5


def stump_cross_validation(
    docs: DataFrame, label_lang: str = STUMP_LABEL_LANG, n_folds: int = CV_FOLDS
) -> DataFrame:
    """k-fold cross-validation of :func:`decision_stump_train` — the
    methodology layer (train accuracy alone overstates any model):
    deterministic md5-hash folds, per-fold training on the OTHER k−1
    folds, held-out accuracy per fold plus the pooled '*' row.

    The whole CV runs from ONE corpus pass: the (fold, feature, bin)
    histogram. Training stats for held-out fold f are (total − fold f)
    — no per-fold rescans; held-out evaluation reads fold f's slice of
    the SAME histogram (a stump's predictions depend only on the bin,
    so per-bin (n, pos) suffices to score it exactly). The k model
    searches are windows PARTITIONED BY (fold, feature) over the
    k×features×bins grid — tiny, and exactly the PLANET trick again.

    Majority votes break ties toward class 0; split candidates and Gini
    ordering follow decision_stump_train's conventions.
    """
    base = docs.select(
        (md5_prefix_value(F.col("doc_id").cast("string"), 8) % n_folds).alias("fold"),
        (F.col("lang") == label_lang).cast("int").alias("y"),
        qround(F.size(tokens()) / F.lit(100.0), STUMP_GRID).alias("f1"),
        qround(F.col("n_chars") / F.lit(1000.0), STUMP_GRID).alias("f2"),
        qround(
            F.size(F.array_distinct(tokens())).cast("double")
            / F.size(tokens()).cast("double"),
            STUMP_GRID,
        ).alias("f3"),
    )
    long = base.select(
        "fold",
        "y",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(f).alias("feature"), F.col(f).alias("bin"))
                    for f in ("f1", "f2", "f3")
                ]
            )
        ).alias("fb"),
    ).select("fold", F.col("fb.feature").alias("feature"), F.col("fb.bin").alias("bin"), "y")
    # null-bin guard — same engine-ordering rationale as decision_stump_train
    hist = (
        long.filter(F.col("bin").isNotNull())
        .groupBy("fold", "feature", "bin")
        .agg(F.count("*").alias("n"), F.sum("y").alias("pos"))
    )
    folds = docs.sparkSession.range(n_folds).select(F.col("id").cast("int").alias("fold_out"))
    # training histogram for each held-out fold: every fold's rows except its own
    train = (
        hist.crossJoin(F.broadcast(folds))
        .filter(F.col("fold") != F.col("fold_out"))
        .groupBy("fold_out", "feature", "bin")
        .agg(F.sum("n").alias("n"), F.sum("pos").alias("pos"))
    )
    wcum = (
        Window.partitionBy("fold_out", "feature")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("fold_out", "feature")
    cand = (
        train.withColumn("nl", F.sum("n").over(wcum))
        .withColumn("pl", F.sum("pos").over(wcum))
        .withColumn("nt", F.sum("n").over(wtot))
        .withColumn("pt", F.sum("pos").over(wtot))
        .filter(F.col("nl") < F.col("nt"))
    )
    nl, pl = F.col("nl").cast("double"), F.col("pl").cast("double")
    nt, pt = F.col("nt").cast("double"), F.col("pt").cast("double")
    nr, pr = nt - nl, pt - pl
    gini = (nl / nt) * (
        F.lit(1.0) - (pl / nl) * (pl / nl) - ((nl - pl) / nl) * ((nl - pl) / nl)
    ) + (nr / nt) * (
        F.lit(1.0) - (pr / nr) * (pr / nr) - ((nr - pr) / nr) * ((nr - pr) / nr)
    )
    w_pick = Window.partitionBy("fold_out").orderBy(
        F.asc("g"), F.asc("feature"), F.asc("bin")
    )
    model = (
        cand.withColumn("g", qround(gini, 6))
        .withColumn("rk", F.row_number().over(w_pick))
        .filter(F.col("rk") == 1)
        .select(
            "fold_out",
            "feature",
            F.col("bin").alias("threshold"),
            (pl * 2 > nl).cast("int").alias("left_class"),
            (pr * 2 > nr).cast("int").alias("right_class"),
        )
    )
    h = hist.select(
        "fold",
        F.col("feature").alias("h_feature"),
        F.col("bin").alias("h_bin"),
        "n",
        "pos",
    )
    test = h.join(
        F.broadcast(model),
        (F.col("fold") == F.col("fold_out"))
        & (F.col("h_feature") == F.col("feature")),
    ).select(
        "fold_out",
        "n",
        "pos",
        (F.col("h_bin") <= F.col("threshold")).alias("left_side"),
        "left_class",
        "right_class",
        "feature",
        "threshold",
    )
    cls = F.when(F.col("left_side"), F.col("left_class")).otherwise(F.col("right_class"))
    correct = F.when(cls == 1, F.col("pos")).otherwise(F.col("n") - F.col("pos"))
    per_fold = test.groupBy("fold_out", "feature", "threshold").agg(
        F.sum("n").cast("long").alias("test_n"),
        F.sum(correct).cast("long").alias("test_correct"),
    )
    overall = per_fold.agg(
        F.sum("test_n").cast("long").alias("test_n"),
        F.sum("test_correct").cast("long").alias("test_correct"),
    ).select(
        F.lit(-1).alias("fold_out"),
        F.lit("*").alias("feature"),
        F.lit(None).cast("double").alias("threshold"),
        "test_n",
        "test_correct",
    )
    return (
        per_fold.unionByName(overall)
        .select(
            F.col("fold_out").cast("int").alias("fold"),
            "feature",
            "threshold",
            "test_n",
            "test_correct",
            qround(
                F.col("test_correct").cast("double") / F.col("test_n").cast("double"), 6
            ).alias("test_accuracy"),
        )
        .orderBy("fold")
    )


# taxonomy lexicon for dictionary tagging: category -> member terms (the
# fixtures' synthetic vocabulary; a production run broadcasts a real
# topic/PII/compliance lexicon the same way)
TAG_LEXICON = {
    "exec": ("join", "hash", "scan", "merge", "sort", "agg"),
    "streaming": ("stream", "window", "batch", "watermark"),
    "storage": ("table", "column", "row", "part", "parquet"),
    "ml": ("vector", "model", "train", "embed"),
}


def keyword_tagging(docs: DataFrame) -> DataFrame:
    """Dictionary/taxonomy tagging — the lexicon-matching stage of every
    topic/PII/compliance pipeline: match each document's tokens against
    a category→terms lexicon and report per-category corpus coverage
    (documents tagged, total hits, share of corpus).

    The lexicon is BROADCAST (it is always tiny next to the corpus), so
    the plan is one token explode + broadcast hash join + two-level
    aggregate — the per-(doc, category) partial collapses the hit stream
    before the category rollup, so the final shuffle carries at most
    |docs|·|categories| rows, and countDistinct is exact without a
    second pass over tokens.
    """
    from ..tables import spread

    spark = docs.sparkSession
    lex = spark.createDataFrame(
        [(t, c) for c, terms in TAG_LEXICON.items() for t in terms],
        "term string, category string",
    )
    n_docs_total = docs.agg(F.count("*").alias("n_docs_total"))
    tok = spread(docs).select("doc_id", F.explode(tokens()).alias("term"))
    per_doc = (
        tok.join(F.broadcast(lex), "term")
        .groupBy("doc_id", "category")
        .agg(F.count("*").alias("hits"))
    )
    return (
        per_doc.groupBy("category")
        .agg(
            F.count("*").cast("long").alias("n_docs_tagged"),
            F.sum("hits").cast("long").alias("n_hits"),
        )
        .crossJoin(F.broadcast(n_docs_total))
        .select(
            "category",
            "n_docs_tagged",
            "n_hits",
            qround(
                F.col("n_docs_tagged").cast("double")
                / F.col("n_docs_total").cast("double"),
                6,
            ).alias("doc_share"),
        )
        .orderBy("category")
    )


def bigram_cross_entropy(docs: DataFrame) -> DataFrame:
    """Per-language bigram-LM cross-entropy — the perplexity-style
    corpus quality/fit metric one level up from
    :func:`unigram_logprob_score`: train an add-one-smoothed bigram LM
    on the whole corpus, score every bigram occurrence by
    −ln p(w₂|w₁) = −ln((c(w₁w₂)+1)/(c(w₁)+V)), and report the mean per
    language (higher = the language's word order is less predictable
    from the corpus-wide model — the wrong-language/gibberish signal).

    Bigrams come straight off the token ARRAY (zip with its own tail —
    no positional window, no second explode); the one fact-sized shuffle
    is the map-side-combined (lang, w1, w2) count aggregate — the score
    join then runs over the reduced count frames, with unigram counts
    and V broadcast. The
    per-occurrence ln is quantized to 1e-6 and summed in integer space
    (unigram_logprob_score's engine-exactness convention), so the means
    are bit-identical across engines.
    """
    from ..tables import spread

    toks = tokens()
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w2"),
    )
    big = spread(docs).select(
        "lang", F.explode(pairs).alias("p")
    ).select("lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # ONE pairs-explode pass: every occurrence of a (lang, w1, w2) bigram
    # carries the same quantized −ln p (p depends only on c12, c1, V), so
    # the per-occurrence integer sum Σq equals Σ n·q over the distinct
    # (lang, w1, w2) counts exactly (longs). Aggregating FIRST and joining
    # the reduced frames replaces the old shape — pairs explode executed
    # three times (bcnt, the score join's probe side, and again per
    # consumer) with the raw occurrence stream shuffled through the join —
    # with one map-side-combined count aggregate + reduced-size joins
    # (guide §2.3 aggregate before you shuffle; r14, see
    # OPTIMIZATION_r14.md). The unigram frame is likewise materialized
    # once (vocab-sized) for its two consumers (c1 join + V scalar).
    bigc = (
        big.groupBy("lang", "w1", "w2").agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    uni = (
        spread(docs).select(F.explode(toks).alias("t")).groupBy("t").agg(
            F.count("*").alias("c1")
        )
        .localCheckpoint()
    )
    vocab = uni.agg(F.count("*").alias("v"))
    bcnt = bigc.groupBy("w1", "w2").agg(F.sum("n").alias("c12"))
    p = (F.col("c12") + 1).cast("double") / (
        F.col("c1") + F.col("v")
    ).cast("double")
    q = F.floor(-F.log(p) * 1e6 + F.lit(0.5)).cast("long")
    return (
        bigc.join(bcnt, ["w1", "w2"])
        .join(F.broadcast(uni.withColumnRenamed("t", "w1")), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("lang")
        .agg(
            F.sum(q * F.col("n")).alias("qs"),
            F.sum("n").alias("n_bigrams"),
        )
        .select(
            "lang",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            qround(F.col("qs") / 1e6 / F.col("n_bigrams"), 4).alias(
                "cross_entropy_nats"
            ),
        )
        .orderBy("lang")
    )


SG_WINDOW = 2     # skip-gram half-window
SG_NEGATIVES = 2  # negatives per positive pair
SG_PANEL = (1, 2, 3)  # docs whose pairs the entry emits (plan is corpus-wide)


def negative_sampling_pairs(
    docs: DataFrame,
    window: int = SG_WINDOW,
    k_neg: int = SG_NEGATIVES,
    panel: tuple[int, ...] = SG_PANEL,
) -> DataFrame:
    """Word2vec-style skip-gram training pairs with deterministic
    negative sampling (Mikolov et al. 2013, public) — the data-prep
    stage of embedding training at corpus scale: for every (center,
    context) pair within ±window, emit the positive plus ``k_neg``
    negatives drawn by hashing the pair's coordinates into the vocab
    index (md5 mod |V| — the test-bed stand-in for unigram^0.75
    sampling; the PLUMBING — vocab indexing, pair generation, negative
    join — is the production shape).

    The VOCAB INDEX is corpus-wide: terms ranked (count desc, term) —
    vocab-sized, the standard dictionary build. Pair generation is
    lead() over each document's token positions (one doc-keyed window,
    no self-join); the emitted frame is restricted to a fixed doc PANEL
    so the entry's output is bounded while the plan stays corpus-
    general. Long format (one row per emitted label) keeps every cell
    scalar for the oracle.
    """
    from ..tables import spread
    from .text import md5_prefix_value

    toks_all = spread(docs).select(
        "doc_id", F.posexplode(tokens()).alias("pos", "term")
    )
    vocab = (
        toks_all.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .select(
            "term",
            (
                F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("term"))) - 1
            ).alias("vidx"),
        )
    )
    v_size = vocab.agg(F.count("*").alias("v"))
    tok = toks_all.filter(F.col("doc_id").isin(list(panel)))
    w = Window.partitionBy("doc_id").orderBy("pos")
    rows = []
    for off in range(1, window + 1):
        ctx = F.lead("term", off).over(w)
        rows.append(
            tok.select(
                "doc_id",
                "pos",
                F.lit(off).alias("offset"),
                F.col("term").alias("center"),
                ctx.alias("partner"),
            ).filter(F.col("partner").isNotNull())
        )
    pos_pairs = rows[0]
    for r in rows[1:]:
        pos_pairs = pos_pairs.unionByName(r)
    # symmetric skip-gram: each window pair trains both directions
    sym = pos_pairs.unionByName(
        pos_pairs.select(
            "doc_id",
            (F.col("pos") + F.col("offset")).alias("pos"),
            (-F.col("offset")).alias("offset"),
            F.col("partner").alias("center"),
            F.col("center").alias("partner"),
        )
    )
    positives = sym.select(
        "doc_id", "pos", "offset", "center", "partner",
        F.lit("pos").alias("label"),
    )
    negs = None
    for j in range(1, k_neg + 1):
        key = F.concat_ws(
            ":",
            F.col("doc_id").cast("string"),
            F.col("pos").cast("string"),
            F.col("offset").cast("string"),
            F.lit(str(j)),
        )
        n = (
            sym.crossJoin(F.broadcast(v_size))
            .select(
                "doc_id", "pos", "offset", "center",
                (md5_prefix_value(key, 8) % F.col("v")).alias("vidx"),
                F.lit(f"neg{j}").alias("label"),
            )
            .join(F.broadcast(vocab), "vidx")
            .select(
                "doc_id", "pos", "offset", "center",
                F.col("term").alias("partner"), "label",
            )
        )
        negs = n if negs is None else negs.unionByName(n)
    return positives.unionByName(negs).orderBy(
        "doc_id", "pos", "offset", "label"
    )


HEAPS_CHECKPOINTS = 10


def heaps_law_fit(docs: DataFrame) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (Heaps 1978, public): V(N) ≈ k·N^β
    — how fast the vocabulary grows as the corpus streams in, THE
    capacity-planning statistic for tokenizer/vocab design (zipf_fit is
    the frequency-rank twin; this is the growth-curve lens).

    Checkpoints are doc-id prefixes c_j = (max_id·j) DIV 10 (integer
    arithmetic, engine-identical). V(c) needs only each term's FIRST
    document — one vocab-sized min-aggregate, after which all ten
    checkpoint counts come from ONE pass of conditional sums over the
    term frame (never ten scans); N(c) likewise from per-doc token
    counts without any explode. The 10-point frame fits log V = log k +
    β·log N by exact OLS: each ln is quantized to 1e-8 first (the libm
    lane convention — never finer than the DECIMAL sum scale, or the
    engines' cast tie-breaking diverges), sums are order-insensitive
    DECIMAL(38,8).

    Output (single row): n_points, heaps_beta, heaps_k, vocab_total,
    tokens_total.
    """
    terms = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    first = terms.groupBy("term").agg(F.min("doc_id").alias("first"))
    mx = F.broadcast(docs.agg(F.max("doc_id").alias("mx")))
    J = HEAPS_CHECKPOINTS
    v_row = first.crossJoin(mx).agg(
        F.count("*").cast("long").alias("vocab_total"),
        *[
            F.sum(
                F.when(F.col("first") < F.expr(f"(mx * {j}) DIV {J}"), 1).otherwise(0)
            )
            .cast("double")
            .alias(f"v{j}")
            for j in range(1, J + 1)
        ],
    )
    dt = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("nt")
    )
    n_row = dt.crossJoin(mx).agg(
        F.sum("nt").cast("long").alias("tokens_total"),
        *[
            F.sum(
                F.when(F.col("doc_id") < F.expr(f"(mx * {j}) DIV {J}"), F.col("nt"))
                .otherwise(0)
            )
            .cast("double")
            .alias(f"n{j}")
            for j in range(1, J + 1)
        ],
    )
    stack_args = ", ".join(
        f"{j}, v{j}, n{j}" for j in range(1, J + 1)
    )
    pts = (
        v_row.crossJoin(n_row)
        .select(
            "vocab_total",
            "tokens_total",
            F.expr(f"stack({J}, {stack_args}) AS (j, v, n)"),
        )
        .where((F.col("v") > 0) & (F.col("n") > 0))
        .select(
            "vocab_total",
            "tokens_total",
            qround(F.log(F.col("n")), 8).alias("x"),
            qround(F.log(F.col("v")), 8).alias("y"),
        )
    )
    from .relational import DEC38

    r = pts.agg(
        F.count("*").cast("double").alias("np"),
        F.first("vocab_total").alias("vocab_total"),
        F.first("tokens_total").alias("tokens_total"),
        F.sum(F.col("x").cast(DEC38)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(DEC38)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(DEC38)).cast("double").alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(DEC38)).cast("double").alias("sxy"),
    )
    np_ = F.col("np")
    beta = (F.col("sxy") - F.col("sx") * F.col("sy") / np_) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / np_
    )
    intercept = (F.col("sy") - beta * F.col("sx")) / np_
    return r.select(
        np_.cast("long").alias("n_points"),
        qround(beta, 6).alias("heaps_beta"),
        qround(F.exp(intercept), 4).alias("heaps_k"),
        "vocab_total",
        "tokens_total",
    )


def ngram_novelty_rate(docs: DataFrame, n: int = 3) -> DataFrame:
    """Per-source n-gram novelty: for each document, the fraction of its
    distinct n-grams whose FIRST corpus appearance (by doc_id order) is
    this document — the memorization/staleness lens on a training
    corpus: a stream whose novelty rate collapses is re-feeding the
    model what it already saw (duplicate_spans finds the copies; this
    scores the trend).

    One explode builds the (doc, gram) frame; one vocab-sized
    min-aggregate finds each gram's first document; the novelty join is
    gram-keyed and co-partitioned with the aggregate (no broadcast of a
    data-sized side). Per-doc rates reduce to one row per source.
    Integer counts everywhere; the only division is the final exact
    ratio, qround-pinned.
    """
    from .dedup import shingles

    # spread(): the shingle explode multiplies rows ~tokens× — on the
    # single-row-group scan it otherwise runs as ONE task
    grams = spread(docs.select("doc_id", "source", "text")).select(
        "doc_id",
        "source",
        F.explode(shingles(F.split(F.col("text"), " "), n)).alias("g"),
    )
    first = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(first, "g")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_grams").cast("long").alias("n_grams"),
        F.sum("n_novel").cast("long").alias("n_novel"),
        qround(
            F.sum("n_novel").cast("double") / F.sum("n_grams").cast("double"), 6
        ).alias("novelty_rate"),
    )


SUBSAMPLE_T = 1e-4  # word2vec subsampling threshold (Mikolov 2013, public)


def frequent_token_subsample(docs: DataFrame, t: float = SUBSAMPLE_T) -> DataFrame:
    """word2vec-style frequent-token subsampling (Mikolov et al. 2013,
    public): each token OCCURRENCE survives with probability
    p(w) = min(1, √(t/f(w)) + t/f(w)) — high-frequency glue words are
    aggressively dropped, the long tail kept — the standard
    token-budget shaper before embedding training.

    Deterministic: the keep draw is the engine-shared md5 lane on
    (doc_id, position), so reruns and the DuckDB twin agree row-for-row
    (the stratified_sample convention). One posexplode pass builds the
    (doc, pos, term) stream; term frequencies come from one vocab-sized
    aggregate joined back term-keyed (co-partitioned, no broadcast of a
    data-sized side). Output (single row): token/vocab counts before and
    after, kept rate.
    """
    from .text import md5_prefix_value

    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term"),
    )
    tf = toks.groupBy("term").agg(F.count("*").alias("c"))
    tot = F.broadcast(tf.agg(F.sum("c").cast("double").alias("nt")))
    rates = tf.crossJoin(tot).select(
        "term",
        "c",
        F.least(
            F.lit(1.0),
            F.sqrt(F.lit(t) * F.col("nt") / F.col("c"))
            + F.lit(t) * F.col("nt") / F.col("c"),
        ).alias("p_keep"),
    )
    u = (
        md5_prefix_value(
            F.concat_ws(
                ":", F.col("doc_id").cast("string"), F.col("pos").cast("string")
            ),
            8,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    kept = toks.withColumn("u", u).join(rates, "term").withColumn(
        "keep", F.col("u") < F.col("p_keep")
    )
    return kept.agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        qround(
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("kept_rate"),
        F.countDistinct("term").cast("long").alias("vocab_before"),
        F.countDistinct(F.when(F.col("keep"), F.col("term")))
        .cast("long")
        .alias("vocab_after"),
    )


def adaboost_two_stumps(docs: DataFrame, label_lang: str = STUMP_LABEL_LANG) -> DataFrame:
    """Two rounds of AdaBoost over histogram decision stumps (Freund &
    Schapire 1997, public) on the stump task (predict ``lang`` from the
    three text features) — the BOOSTING shape of distributed tree
    learning next to decision_stump_train (single tree) and
    stump_cross_validation (evaluation).

    The classic exp-reweighting is EXACT here: after round 1 with m
    misclassified of n, every correct row's weight is e^{−α} and every
    wrong row's e^{+α}, a ratio of e^{2α} = (1−ε)/ε = (n−m)/m — a
    RATIONAL. Scaling all weights by m makes round 2's histogram
    weights the integers (correct → m, wrong → n−m); weighted Gini is
    scale-invariant, so the round-2 split search runs on pure integer
    split stats in DECIMAL(38,0) lanes — no float weight ever exists.
    α's are the only logs (½·ln((n−m)/m), quantized 1e-6, engine-shared
    lane) and enter ONLY the final vote, which compares quantized
    values identically on both engines.

    Three row-frame passes (histogram₁ → classify+weighted histogram₂ →
    ensemble vote), each map-side-combined; candidate frames are
    (feature × 1e-2 bins), schema-bounded. Output (single row): both
    rounds' splits/errors/α's and the round-1 vs ensemble train
    accuracy.
    """
    # tokenize ONCE per row instead of three times — the same token
    # array feeds f1 and f3 (identical values, ~3× less regex work per
    # row; guide §1.2 per-task-work step). NO spread() here: the r14
    # final-bench A/B (quiet box, interleaved variants ×3 reps) read
    # ~2.7 s with the fan-out vs ~2.1 s without — the round-robin
    # shuffle of the token arrays into the checkpoint costs more than
    # the three light histogram passes save.
    tk = F.col("tk")
    base = (
        docs.select("lang", "n_chars", tokens().alias("tk"))
        .select(
            (F.col("lang") == label_lang).cast("int").alias("y"),
            qround(F.size(tk) / F.lit(100.0), STUMP_GRID).alias("f1"),
            qround(F.col("n_chars") / F.lit(1000.0), STUMP_GRID).alias("f2"),
            qround(
                F.size(F.array_distinct(tk)).cast("double")
                / F.size(tk).cast("double"),
                STUMP_GRID,
            ).alias("f3"),
        )
        .localCheckpoint()
    )
    feats = ("f1", "f2", "f3")
    big = "decimal(38,0)"

    def stump(rows: DataFrame, w: Column) -> DataFrame:
        """Weighted histogram stump: returns a 1-row frame with
        (feature, threshold, pred_left, pred_right) — weights must be
        integer-valued Columns."""
        long = rows.select(
            "y",
            w.alias("w"),
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(f).alias("feature"), F.col(f).alias("bin"))
                        for f in feats
                    ]
                )
            ).alias("fb"),
        ).select(
            F.col("fb.feature").alias("feature"),
            F.col("fb.bin").alias("bin"),
            "y",
            "w",
        )
        hist = (
            long.filter(F.col("bin").isNotNull())
            .groupBy("feature", "bin")
            .agg(
                F.sum(F.col("w").cast(big)).alias("n"),
                F.sum((F.col("w") * F.col("y")).cast(big)).alias("pos"),
            )
        )
        wcum = (
            Window.partitionBy("feature")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wtot = Window.partitionBy("feature")
        cand = (
            hist.withColumn("nl", F.sum("n").over(wcum))
            .withColumn("pl", F.sum("pos").over(wcum))
            .withColumn("nt", F.sum("n").over(wtot))
            .withColumn("pt", F.sum("pos").over(wtot))
            .filter(F.col("nl") < F.col("nt"))
        )
        nl, pl = F.col("nl").cast("double"), F.col("pl").cast("double")
        nt, pt = F.col("nt").cast("double"), F.col("pt").cast("double")
        nr, pr = nt - nl, pt - pl

        def gini(p: Column, n_: Column) -> Column:
            a = p / n_
            b = (n_ - p) / n_
            return F.lit(1.0) - a * a - b * b

        weighted = (nl / nt) * gini(pl, nl) + (nr / nt) * gini(pr, nr)
        w_pick = Window.orderBy(
            F.asc(qround(weighted, 6)), F.asc("feature"), F.asc("bin")
        )
        return (
            cand.withColumn("rk", F.row_number().over(w_pick))
            .filter(F.col("rk") == 1)
            .select(
                "feature",
                F.col("bin").alias("threshold"),
                # majority per side; weight ties predict 1 (>= on ints)
                (F.lit(2) * F.col("pl") >= F.col("nl"))
                .cast("int")
                .alias("pred_left"),
                (
                    F.lit(2) * (F.col("pt") - F.col("pl"))
                    >= (F.col("nt") - F.col("nl"))
                )
                .cast("int")
                .alias("pred_right"),
            )
        )

    def h_of(split_prefix: str) -> Column:
        f = F.col(f"{split_prefix}_feature")
        t = F.col(f"{split_prefix}_threshold")
        v = (
            F.when(f == "f1", F.col("f1"))
            .when(f == "f2", F.col("f2"))
            .otherwise(F.col("f3"))
        )
        # NULL feature value goes RIGHT on both engines (v <= t is
        # NULL -> otherwise branch)
        return F.when(v <= t, F.col(f"{split_prefix}_pred_left")).otherwise(
            F.col(f"{split_prefix}_pred_right")
        )

    s1 = F.broadcast(
        stump(base, F.lit(1)).select(
            F.col("feature").alias("s1_feature"),
            F.col("threshold").alias("s1_threshold"),
            F.col("pred_left").alias("s1_pred_left"),
            F.col("pred_right").alias("s1_pred_right"),
        )
    )
    scored1 = base.crossJoin(s1).withColumn(
        "correct1", (h_of("s1") == F.col("y")).cast("int")
    ).localCheckpoint()
    err1 = F.broadcast(
        scored1.agg(
            F.count("*").alias("n"),
            F.sum(F.lit(1) - F.col("correct1")).alias("m"),
        )
    )
    # round-2 integer weights: correct -> m, wrong -> n - m
    w2frame = scored1.crossJoin(err1).select(
        "y",
        "f1",
        "f2",
        "f3",
        F.when(F.col("correct1") == 1, F.col("m"))
        .otherwise(F.col("n") - F.col("m"))
        .alias("w2"),
        "n",
        "m",
        "s1_feature",
        "s1_threshold",
        "s1_pred_left",
        "s1_pred_right",
        "correct1",
    )
    s2 = F.broadcast(
        stump(w2frame, F.col("w2")).select(
            F.col("feature").alias("s2_feature"),
            F.col("threshold").alias("s2_threshold"),
            F.col("pred_left").alias("s2_pred_left"),
            F.col("pred_right").alias("s2_pred_right"),
        )
    )
    voted = w2frame.crossJoin(s2)
    n, m = F.col("n").cast("double"), F.col("m").cast("double")
    alpha1 = qround(F.lit(0.5) * F.log((n - m) / m), 6)
    # round-2 weighted error: Σ w over wrong2 / Σ w — integers
    h2 = h_of("s2")
    wrong2w = F.sum(
        F.when(h2 != F.col("y"), F.col("w2")).otherwise(F.lit(0)).cast(big)
    ).cast("double")
    totw = F.sum(F.col("w2").cast(big)).cast("double")
    agg = voted.agg(
        F.max("n").alias("n"),
        F.max("m").alias("m"),
        F.first("s1_feature").alias("r1_feature"),
        F.first("s1_threshold").alias("r1_threshold"),
        F.first("s2_feature").alias("r2_feature"),
        F.first("s2_threshold").alias("r2_threshold"),
        wrong2w.alias("w2_wrong"),
        totw.alias("w2_tot"),
        F.sum("correct1").alias("c1"),
        # ensemble vote needs alphas — compute after via the scalar frame;
        # here collect the four vote-bucket counts (h1, h2, y) suffice:
        # vote value is monotone in (h1, h2) given fixed alphas
        F.sum(
            F.when((h_of("s1") == 1) & (h2 == 1) & (F.col("y") == 1), 1).otherwise(0)
        ).alias("b111"),
        F.sum(
            F.when((h_of("s1") == 1) & (h2 == 1) & (F.col("y") == 0), 1).otherwise(0)
        ).alias("b110"),
        F.sum(
            F.when((h_of("s1") == 1) & (h2 == 0) & (F.col("y") == 1), 1).otherwise(0)
        ).alias("b101"),
        F.sum(
            F.when((h_of("s1") == 1) & (h2 == 0) & (F.col("y") == 0), 1).otherwise(0)
        ).alias("b100"),
        F.sum(
            F.when((h_of("s1") == 0) & (h2 == 1) & (F.col("y") == 1), 1).otherwise(0)
        ).alias("b011"),
        F.sum(
            F.when((h_of("s1") == 0) & (h2 == 1) & (F.col("y") == 0), 1).otherwise(0)
        ).alias("b010"),
        F.sum(
            F.when((h_of("s1") == 0) & (h2 == 0) & (F.col("y") == 1), 1).otherwise(0)
        ).alias("b001"),
        F.sum(
            F.when((h_of("s1") == 0) & (h2 == 0) & (F.col("y") == 0), 1).otherwise(0)
        ).alias("b000"),
    )
    eps1 = m / n
    eps2 = F.col("w2_wrong") / F.col("w2_tot")
    a1 = qround(F.lit(0.5) * F.log((F.lit(1.0) - eps1) / eps1), 6)
    a2 = qround(F.lit(0.5) * F.log((F.lit(1.0) - eps2) / eps2), 6)
    # ensemble prediction per (h1, h2): sign of a1*(2h1-1) + a2*(2h2-1);
    # ties predict 1 (>= 0), identical on both engines over quantized a's
    def pred(h1: int, h2: int) -> Column:
        v = a1 * F.lit(float(2 * h1 - 1)) + a2 * F.lit(float(2 * h2 - 1))
        return (v >= 0).cast("int")

    correct_ens = (
        F.when(pred(1, 1) == 1, F.col("b111")).otherwise(F.col("b110"))
        + F.when(pred(1, 0) == 1, F.col("b101")).otherwise(F.col("b100"))
        + F.when(pred(0, 1) == 1, F.col("b011")).otherwise(F.col("b010"))
        + F.when(pred(0, 0) == 1, F.col("b001")).otherwise(F.col("b000"))
    )
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        "r1_feature",
        qround(F.col("r1_threshold"), 2).alias("r1_threshold"),
        qround(eps1, 6).alias("r1_error"),
        a1.alias("alpha1"),
        "r2_feature",
        qround(F.col("r2_threshold"), 2).alias("r2_threshold"),
        qround(eps2, 6).alias("r2_error"),
        a2.alias("alpha2"),
        qround(F.col("c1").cast("double") / F.col("n"), 6).alias(
            "train_acc_round1"
        ),
        qround(correct_ens.cast("double") / F.col("n"), 6).alias(
            "train_acc_ensemble"
        ),
    )
