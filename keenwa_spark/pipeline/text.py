"""Text analysis operators: quality stats, language-ID, token counts,
content fingerprints.

Everything is built-in/higher-order SQL functions — string ops, regex,
array lambdas — running in whole-stage codegen. No Python UDFs: at
100 TB a row-at-a-time Python UDF on a text column is the single worst
thing a pipeline can do (serialize every string across the JVM/Python
boundary); these expressions never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from keenwa_spark.pipeline.dedup import normalized_text
from keenwa_spark.pipeline.hashing import spark_hash64

#: BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

#: stopword marker sets for the language-ID heuristic. Real deployments
#: swap in per-language profiles; the mechanism (marker-hit scoring with
#: deterministic argmax) is what the operator provides.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
}


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality-scoring features: char/word counts, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio."""
    norm = normalized_text(text_col)
    words = f"split({norm}, ' ')"
    stop_list = "', '".join(LANG_MARKERS["en"])
    return df.select(
        F.col(id_col),
        F.expr(f"CAST(char_length({text_col}) AS BIGINT)").alias("n_chars"),
        F.expr(f"CAST(size({words}) AS BIGINT)").alias("n_words"),
        F.expr(
            f"CAST(char_length(regexp_replace({norm}, ' ', '')) AS DOUBLE)"
            f" / size({words})"
        ).alias("mean_word_len"),
        F.expr(
            f"CAST(char_length(regexp_replace({text_col}, '[a-zA-Z0-9\\\\s]', '')) AS DOUBLE)"
            f" / char_length({text_col})"
        ).alias("punct_ratio"),
        F.expr(
            f"CAST(size(filter({words}, w -> w IN ('{stop_list}'))) AS DOUBLE)"
            f" / size({words})"
        ).alias("stopword_ratio"),
        F.expr(
            f"CAST(char_length(regexp_replace({text_col}, '[^A-Z]', '')) AS DOUBLE)"
            f" / char_length({text_col})"
        ).alias("upper_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language-ID heuristic with a deterministic argmax
    (score desc, then language code asc). Accuracy is proportional to
    marker-profile quality — on synthetic single-vocabulary corpora it
    degenerates to a stable constant, which is the point of testing
    the mechanism, not the profile."""
    norm = normalized_text(text_col)
    words = f"split({norm}, ' ')"
    score_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        lst = "', '".join(markers)
        score_cols.append(
            F.expr(f"CAST(size(filter({words}, w -> w IN ('{lst}'))) AS BIGINT)").alias(
                f"score_{lang}"
            )
        )
    scored = df.select(F.col(id_col), *score_cols)
    langs = sorted(LANG_MARKERS)
    # deterministic argmax: highest score wins; ties -> alphabetical
    best = "CASE " + " ".join(
        f"WHEN score_{l} >= GREATEST({', '.join('score_' + m for m in langs if m != l)}) THEN '{l}'"
        for l in langs
    ) + " END"
    return scored.select(
        id_col,
        *[f"score_{l}" for l in langs],
        F.expr(best).alias("pred_lang"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + unique
    token count — the standard size features for training-data
    budgeting."""
    norm = normalized_text(text_col)
    return df.select(
        F.col(id_col),
        F.expr(f"CAST(size(split({norm}, ' ')) AS BIGINT)").alias("ws_tokens"),
        F.expr(
            f"CAST(size(regexp_extract_all({norm}, '{TOKEN_RE}', 0)) AS BIGINT)"
        ).alias("bpe_ish_tokens"),
        F.expr(
            f"CAST(size(array_distinct(split({norm}, ' '))) AS BIGINT)"
        ).alias("uniq_words"),
    )


#: PII patterns — kept to syntax valid AND equivalent in both Java
#: regex (Spark) and RE2 (DuckDB): character classes, bounded repeats,
#: word boundaries; no lookaround, no backrefs.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9() -]{7,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII scrubbing for training corpora: replace emails / phone-like
    digit runs / IPv4 addresses with typed placeholder tags and count
    each category. Pure regex map in codegen — zero shuffle, no Python;
    patterns restricted to the Java-regex/RE2 common subset so the
    redaction is exactly replayable by the DuckDB oracle.

    Redaction order matters (an email never contains a phone match, but
    an IPv4 would also phone-match): email -> ipv4 -> phone, counts
    taken BEFORE any replacement except for phone, which is counted on
    the ipv4-redacted text so addresses aren't double-counted."""
    # column-API only: regex literals never pass through the SQL parser
    # (whose string-escape rules would corrupt \b and \. sequences)
    email, phone, ipv4 = PII_PATTERNS["email"], PII_PATTERNS["phone"], PII_PATTERNS["ipv4"]
    t = F.col(text_col)
    no_email = F.regexp_replace(t, email, "<EMAIL>")
    no_ip = F.regexp_replace(no_email, ipv4, "<IP>")

    def count(col, pat):
        return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast("bigint")

    return df.select(
        F.col(id_col),
        F.regexp_replace(no_ip, phone, "<PHONE>").alias("redacted"),
        count(t, email).alias("n_emails"),
        count(t, ipv4).alias("n_ips"),
        count(no_ip, phone).alias("n_phones"),
    )


def text_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive positional content fingerprint: sum over word
    positions of hash64(word) * position, mod P. Unlike a bag-of-words
    digest, word REORDERING changes the fingerprint; unlike md5 of the
    full text, it is incrementally computable per partition (the inner
    transform+fold runs in codegen)."""
    norm = normalized_text(text_col)
    words = f"split({norm}, ' ')"
    h = spark_hash64("x")
    # Modular fold (ADVICE r02): terms are hash(<2^32) * position, so an
    # un-modded running sum overflows BIGINT beyond ~65k words — Spark
    # would wrap silently while DuckDB raises, breaking the cross-engine
    # claim exactly at scale. Reducing each term AND the accumulator
    # mod P keeps every intermediate < 2^33; the result is identical
    # (modular arithmetic commutes with the fold).
    p = 4294967311
    return df.select(
        F.col(id_col),
        F.expr(
            f"aggregate(transform({words}, (x, i) -> ({h} * (i + 1)) % {p}), "
            f"CAST(0 AS BIGINT), (acc, v) -> (acc + v) % {p})"
        ).alias("fingerprint"),
        F.expr("md5(" + normalized_text(text_col) + ")").alias("content_md5"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition signals (Gopher-style repetition
    filters): duplicate bigram/trigram fraction and the share of bigram
    occurrences taken by the single most frequent bigram.

    Shape: build both n-gram arrays in ONE projection (each array
    expression evaluated exactly once — a first draft that re-inlined
    the n-gram constructor inside nested lambdas made Catalyst's
    expression tree explode and codegen compile for tens of seconds),
    explode to (doc, gram-kind, gram) rows, then a two-level aggregate:
    per-gram occurrence counts, re-aggregated to per-doc totals /
    distinct counts / max-count. Two doc-keyed shuffles of n-gram-sized
    rows — the same robust plan at 100 TB, with map-side combine doing
    the heavy lifting; no O(distinct x total) per-row lambda scans.

    Docs too short for a bigram (or trigram) keep ratio 0.0 via the
    left join back to the id spine.

    Complements quality_signals' word-level distinct_word_ratio with
    the n-gram-level repetition the Gopher paper actually gates on.
    """
    norm = normalized_text(text_col)
    w = f"split({norm}, ' ')"
    # sequence(1, n) with n < 1 would COUNT DOWN (Spark auto-negates
    # the step) — guard short docs to an empty array instead
    bi = (
        f"CASE WHEN size({w}) >= 2 THEN transform(sequence(1, size({w}) - 1), "
        f"i -> concat(element_at({w}, i), ' ', element_at({w}, i + 1))) "
        f"ELSE array() END"
    )
    tri = (
        f"CASE WHEN size({w}) >= 3 THEN transform(sequence(1, size({w}) - 2), "
        f"i -> concat(element_at({w}, i), ' ', element_at({w}, i + 1), ' ', "
        f"element_at({w}, i + 2))) ELSE array() END"
    )
    grams = df.selectExpr(
        id_col,
        f"concat(transform(({bi}), x -> struct('bi' AS g, x AS gram)), "
        f"transform(({tri}), x -> struct('tri' AS g, x AS gram))) AS gs",
    ).select(F.col(id_col), F.explode("gs").alias("e"))
    per_gram = grams.groupBy(
        F.col(id_col), F.col("e.g").alias("g"), F.col("e.gram").alias("gram")
    ).agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum(F.when(F.col("g") == "bi", F.col("c")).otherwise(0)).alias("n_bi"),
        F.sum(F.when(F.col("g") == "bi", 1).otherwise(0)).alias("d_bi"),
        F.max(F.when(F.col("g") == "bi", F.col("c")).otherwise(0)).alias("m_bi"),
        F.sum(F.when(F.col("g") == "tri", F.col("c")).otherwise(0)).alias("n_tri"),
        F.sum(F.when(F.col("g") == "tri", 1).otherwise(0)).alias("d_tri"),
    )
    spine = df.select(F.col(id_col))
    joined = spine.join(per_doc, on=id_col, how="left")

    def ratio(n: str, d: str) -> F.Column:
        return F.when(
            F.col(n) > 0,
            1.0 - F.col(d).cast("double") / F.col(n),
        ).otherwise(F.lit(0.0))

    return joined.select(
        F.col(id_col),
        ratio("n_bi", "d_bi").alias("dup_bigram_ratio"),
        ratio("n_tri", "d_tri").alias("dup_trigram_ratio"),
        F.when(
            F.col("n_bi") > 0, F.col("m_bi").cast("double") / F.col("n_bi")
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


def vocab_topk(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus-level vocabulary: top-k words by document-independent
    occurrence count, ordered (count desc, word asc) for determinism.

    The scale shape: explode is a flatMap (no shuffle), the count is
    one partial-agg shuffle keyed by word (map-side combine collapses
    each partition to its distinct words first), and the top-k is a
    TakeOrderedAndProject — no global sort materialization. Word skew
    (stopwords dominating) is absorbed by the partial aggregation, not
    a hot reducer.
    """
    norm = normalized_text(text_col)
    words = df.select(
        F.explode(F.expr(f"split({norm}, ' ')")).alias("word")
    ).where(F.col("word") != "")
    counts = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return (
        counts.where(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(k)
    )


def lm_transition_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist_pairs: bool = True,
) -> DataFrame:
    """Corpus-trained bigram-LM fluency signal per document.

    Trains a bigram transition model on the corpus itself (context
    count c1 = occurrences of w1 as a bigram left side, pair count
    c12 = occurrences of (w1, w2)) and scores each document by its
    pooled inverse transition probability

        surprisal = SUM(c1 over the doc's bigrams) / SUM(c12)

    — a document whose word transitions are rare relative to their
    contexts (incoherent, shuffled, boilerplate-spliced text) scores
    high; fluent text tracking corpus statistics scores near the
    corpus-average branching factor. The pooled RATIONAL form (two
    exact BIGINT sums, one final division) is deliberate: a mean of
    per-bigram log-probabilities would be the textbook perplexity but
    ln() differs in ulp between engines (see tfidf.py) and a mean of
    per-pair double ratios is summation-order-dependent — both break
    bit-exact oracle checks. Swap the marked line for
    ``avg(ln(c1/c12))`` where cross-engine hashing isn't required.

    Output: (id_col, n_pairs, ctx_total, pair_total, surprisal);
    single-word/empty docs get n_pairs=0 and NULL surprisal.

    Scale: one explode builds the pair stream; the model is two
    aggregations OVER THAT SAME stream (no second scan); scoring is a
    pair-key join back — broadcast when the distinct-bigram model fits
    (vocab-bounded), shuffle otherwise, AQE decides. All codegen; no
    Python UDFs.
    """
    norm = normalized_text(text_col)
    w = f"split({norm}, ' ')"
    pairs_expr = (
        f"CASE WHEN size({w}) >= 2 THEN transform(sequence(1, size({w}) - 1), "
        f"i -> struct(element_at({w}, i) AS w1, element_at({w}, i + 1) AS w2)) "
        f"ELSE array() END"
    )
    pairs = df.selectExpr(id_col, f"explode({pairs_expr}) AS p").select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    # the pair stream feeds THREE consumers (c12 model, c1 model, the
    # scoring join) — an unpersisted lazy plan re-tokenizes the corpus
    # once per consumer. persist_pairs caches it (at 100 TB write it
    # to parquet once instead; same dataflow). The cache lives until
    # LRU eviction or spark.catalog.clearCache() — long sessions
    # scoring many corpora should pass persist_pairs=False or clear
    if persist_pairs:
        pairs = pairs.persist()
    c12 = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    c1 = pairs.groupBy("w1").agg(
        F.count(F.lit(1)).cast("bigint").alias("c1")
    )
    scored = (
        pairs.join(c12, on=["w1", "w2"])
        .join(c1, on=["w1"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("c1").cast("bigint").alias("ctx_total"),
            F.sum("c12").cast("bigint").alias("pair_total"),
        )
        .withColumn(
            "surprisal",  # swap for avg(ln(c1/c12)) off the oracle path
            F.col("ctx_total").cast("double") / F.col("pair_total"),
        )
    )
    spine = df.select(F.col(id_col)).distinct()
    return (
        spine.join(scored, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_pairs", F.lit(0).cast("bigint")).alias("n_pairs"),
            "ctx_total",
            "pair_total",
            "surprisal",
        )
    )
