"""Corpus-level text modeling operators: n-gram language-model scoring
(the CCNet-style perplexity quality gate) and BPE merge-pair counting
(the tokenizer trainer's inner loop) as reusable building blocks over
arbitrary (key, text) DataFrames.

Design for 100 TB: the LM's count tables are bounded by observed
vocabulary, broadcast for map-only corpus scoring; BPE counting collapses
the corpus to its word-frequency table first so pair tallies cost
O(vocab × word-length), independent of corpus size. Zero UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from utils_spark.functions import word_tokens


def _bigram_structs(toks_col: str):
    """array<struct<w1,w2>> of adjacent token pairs; empty for <2 tokens
    (sequence() DESCENDS when end < start, hence the explicit guard)."""
    idx = F.when(
        F.size(toks_col) >= 2, F.sequence(F.lit(1), F.size(toks_col) - 1)
    ).otherwise(F.expr("array()").cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(F.col(toks_col), i).alias("w1"),
            F.element_at(F.col(toks_col), i + 1).alias("w2"),
        ),
    )


def bigram_lm_scores(
    df: DataFrame,
    key_col: str,
    text_col: str,
    ref: DataFrame,
    smoothing_k: float = 0.5,
) -> DataFrame:
    """Score every document of ``df`` under an add-k-smoothed bigram word
    LM trained on ``ref`` (a DataFrame exposing ``text_col`` — the
    in-domain reference corpus):  P(w2 | w1) = (c(w1,w2) + k) /
    (c(w1) + k·V).  Returns (key, n_bigrams, cross_entropy, perplexity)
    for documents with ≥ 2 tokens; cross-entropy is the mean −ln P over
    the document's bigrams (lower = more in-domain — the CCNet filter
    signal). Rounded to 6dp for cross-engine-stable comparisons.

    Scale shape: the model (unigram + bigram counts + vocab size) is two
    map-side-combined aggregations over the reference, bounded by
    vocabulary — it broadcasts, so corpus scoring is map-only plus one
    per-key combine. If the model outgrows broadcast, drop the hints: the
    joins fall back to bigram-keyed shuffles of corpus-token volume."""
    toks = word_tokens(text_col)
    doc = df.select(F.col(key_col), toks.alias("__toks"))
    reft = ref.select(toks.alias("__toks"))
    uni = (
        reft.select(F.explode("__toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("__uni_c"))
    )
    vocab = uni.agg(F.count("*").cast("double").alias("__v"))
    bi = (
        reft.select(F.explode(_bigram_structs("__toks")).alias("bg"))
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("__bi_c"))
    )
    docbi = doc.select(
        key_col, F.explode(_bigram_structs("__toks")).alias("bg")
    ).select(key_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    lp = F.log(
        (F.coalesce(F.col("__bi_c"), F.lit(0)) + smoothing_k)
        / (F.coalesce(F.col("__uni_c"), F.lit(0)) + smoothing_k * F.col("__v"))
    )
    ce = -F.avg("__lp")
    return (
        docbi.join(F.broadcast(bi), ["w1", "w2"], "left")
        .join(F.broadcast(uni), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(key_col, lp.alias("__lp"))
        .groupBy(key_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(ce, 6).alias("cross_entropy"),
            F.round(F.exp(ce), 6).alias("perplexity"),
        )
    )


def bpe_pair_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Adjacent character-pair counts over the corpus, weighted by word
    occurrence — the counting round of BPE tokenizer training. Returns
    (pair, pair_count); the caller ranks/limits (TakeOrdered) and applies
    the chosen merge.

    Scale shape: the corpus collapses to its WORD FREQUENCY TABLE first
    (the classic BPE-trainer trick — pair counting is then O(vocab ×
    word-length) regardless of corpus size), then one bounded pair
    aggregation (≤ alphabet² keys)."""
    words = (
        df.select(F.explode(word_tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    idx = F.when(
        F.length("w") >= 2, F.sequence(F.lit(1), F.length("w") - 1)
    ).otherwise(F.expr("array()").cast("array<int>"))
    pair_rows = words.select(
        "n",
        F.explode(F.transform(idx, lambda i: F.col("w").substr(i, F.lit(2)))).alias("pair"),
    )
    return pair_rows.groupBy("pair").agg(F.sum("n").cast("long").alias("pair_count"))


def bpe_train(df: DataFrame, text_col: str, n_merges: int = 8, return_vocab: bool = False):
    """FULL iterative BPE tokenizer training (Sennrich et al. 2016, the
    public neural-MT subword recipe): collapse the corpus to its word
    frequency table once, then repeat ``n_merges`` rounds of
    count-adjacent-pairs → pick argmax (count desc, pair asc — fully
    deterministic) → greedily merge that pair left-to-right in every
    word's token sequence. Returns the learned merge table
    (merge_round, left_tok, right_tok, pair_count) — the artifact a BPE
    tokenizer ships; with ``return_vocab=True`` also returns the final
    word→token-array vocabulary table, the broadcastable dictionary the
    APPLY side joins against to encode a corpus map-only.

    Scale shape: after the one corpus-sized shuffle that builds the word
    frequency table, EVERY round is O(vocab × word-length) regardless of
    corpus size — a bounded pair aggregation plus a 1-row argmax collect
    (the same driver-scalar pattern as the Louvain convergence probe).
    The merge itself is a JVM-side array fold (`aggregate`), no UDF; the
    vocab table's lineage is cut each round so plans stay flat.

    The fold implements exact greedy BPE merge semantics: scanning left
    to right, an occurrence is merged iff the accumulator's last token is
    `left` and the current token is `right` — consumed tokens can't
    re-match (e.g. "aaa" with (a,a) → [aa, a]), and merged tokens only
    match rules addressed to them ((a,b) never re-fires on "ab").
    """
    from utils_spark.plans import cut_lineage

    sess = df.sparkSession
    sep = "\x1f"
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")), lambda i: F.col("w").substr(i, F.lit(1))
    )
    words = (
        df.select(F.explode(word_tokens(text_col)).alias("w"))
        .filter(~F.col("w").contains(sep))  # sentinel guard (oracle twin)
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .select("w", chars.alias("toks"), "n")
    )
    words = cut_lineage(words)
    merges = []
    for rnd in range(1, n_merges + 1):
        pair_idx = F.when(
            F.size("toks") >= 2, F.sequence(F.lit(1), F.size("toks") - 1)
        ).otherwise(F.expr("array()").cast("array<int>"))
        pairs = words.select(
            "n",
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("l"),
                        F.element_at("toks", i + F.lit(1)).alias("r"),
                    ),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt = best[0].l, best[0].r, best[0].cnt
        merges.append((rnd, l, r, cnt))
        merged = l + r
        fold = F.aggregate(
            F.col("toks"),
            F.expr("CAST(array() AS array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(l))
                & (x == F.lit(r)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        words = cut_lineage(words.select("w", fold.alias("toks"), "n"))
    merges_df = sess.createDataFrame(
        merges, "merge_round int, left_tok string, right_tok string, pair_count long"
    )
    if return_vocab:
        return merges_df, words.select("w", "toks")
    return merges_df


def _trigram_structs(toks_col: str):
    """array<struct<w1,w2,w3>> of adjacent token triples (empty for <3)."""
    idx = F.when(
        F.size(toks_col) >= 3, F.sequence(F.lit(1), F.size(toks_col) - 2)
    ).otherwise(F.expr("array()").cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(F.col(toks_col), i).alias("w1"),
            F.element_at(F.col(toks_col), i + 1).alias("w2"),
            F.element_at(F.col(toks_col), i + 2).alias("w3"),
        ),
    )


def trigram_backoff_scores(
    df: DataFrame,
    key_col: str,
    text_col: str,
    ref: DataFrame,
    alpha: float = 0.4,
) -> DataFrame:
    """Score documents under a trigram LM with STUPID BACKOFF (Brants et
    al. 2007 "Large Language Models in Machine Translation" — the
    published web-scale recipe: no normalization, a fixed ``alpha``
    back-off factor, chosen there precisely because it needs only count
    tables and scales to trillions of tokens):

        S(w3|w1w2) = c(w1w2w3)/c(w1w2)          if c(w1w2w3) > 0
                   = α·c(w2w3)/c(w2)            elif c(w2w3) > 0
                   = α²·c(w3)/N                  otherwise

    Returns (key, n_trigrams, mean_neg_log_score) for docs with ≥3
    tokens; lower = more in-domain (same filter signal as the bigram
    CCNet gate, one order higher with graceful degradation on unseen
    n-grams). OOV w3 (zero unigram count) is floored to 1/N so the log
    stays finite — documented engine-side choice, mirrored in oracles.

    Scale shape: three count tables bounded by observed vocabulary,
    broadcast; corpus scoring is map-only joins plus one per-key combine.
    Drop the broadcast hints if the model outgrows driver memory — the
    joins fall back to n-gram-keyed shuffles."""
    toks = word_tokens(text_col)
    reft = ref.select(toks.alias("__toks"))
    uni = reft.select(F.explode("__toks").alias("u1")).groupBy("u1").agg(
        F.count("*").alias("__c1")
    )
    n_tokens = uni.agg(F.sum("__c1").cast("double").alias("__n"))
    bi = (
        reft.select(F.explode(_bigram_structs("__toks")).alias("bg"))
        .groupBy(F.col("bg.w1").alias("b1"), F.col("bg.w2").alias("b2"))
        .agg(F.count("*").alias("__c2"))
    )
    tri = (
        reft.select(F.explode(_trigram_structs("__toks")).alias("tg"))
        .groupBy(
            F.col("tg.w1").alias("t1"), F.col("tg.w2").alias("t2"), F.col("tg.w3").alias("t3")
        )
        .agg(F.count("*").alias("__c3"))
    )
    doc = (
        df.select(key_col, toks.alias("__toks"))
        .select(key_col, F.explode(_trigram_structs("__toks")).alias("tg"))
        .select(
            key_col,
            F.col("tg.w1").alias("w1"),
            F.col("tg.w2").alias("w2"),
            F.col("tg.w3").alias("w3"),
        )
    )
    joined = (
        doc.join(
            F.broadcast(tri),
            (F.col("w1") == F.col("t1")) & (F.col("w2") == F.col("t2")) & (F.col("w3") == F.col("t3")),
            "left",
        )
        .join(
            F.broadcast(bi.withColumnRenamed("b1", "h1").withColumnRenamed("b2", "h2")),
            (F.col("w1") == F.col("h1")) & (F.col("w2") == F.col("h2")),
            "left",
        )
        .join(
            F.broadcast(
                bi.select(F.col("b1").alias("g2"), F.col("b2").alias("g3"), F.col("__c2").alias("__c2b"))
            ),
            (F.col("w2") == F.col("g2")) & (F.col("w3") == F.col("g3")),
            "left",
        )
        .join(F.broadcast(uni.withColumnRenamed("u1", "m2")), F.col("w2") == F.col("m2"), "left")
        .join(
            F.broadcast(uni.select(F.col("u1").alias("m3"), F.col("__c1").alias("__c1w3"))),
            F.col("w3") == F.col("m3"),
            "left",
        )
        .crossJoin(F.broadcast(n_tokens))
    )
    score = (
        F.when(
            F.col("__c3").isNotNull(), F.col("__c3") / F.col("__c2")
        )
        .when(
            F.col("__c2b").isNotNull(), alpha * F.col("__c2b") / F.col("__c1")
        )
        .otherwise(
            alpha * alpha * F.greatest(F.coalesce("__c1w3", F.lit(0.0)), F.lit(1.0)) / F.col("__n")
        )
    )
    return (
        joined.select(key_col, (-F.log(score)).alias("__nl"))
        .groupBy(key_col)
        .agg(
            F.count("*").cast("long").alias("n_trigrams"),
            F.round(F.avg("__nl"), 6).alias("mean_neg_log_score"),
        )
    )
