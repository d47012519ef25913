"""Text analysis operators for training-data pipelines (target-side):
language ID (stopword-hit heuristic), quality scoring, token counting,
document fingerprinting.  All JVM-side column expressions — no UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# Minimal stopword inventories for the n-gram/stopword-hit language
# heuristic.  Public knowledge (most-frequent function words).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
    "es": ["el", "la", "de", "que", "los", "en", "un", "una", "por", "con"],
}


def with_words(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("_words", F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))


def token_count(
    df: DataFrame, text_col: str = "text", out_prefix: str = "tok"
) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex count
    (word pieces, numbers, punctuation as separate tokens) + the
    chars/4 heuristic."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe_ish = F.size(
        F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    )
    return (
        df.withColumn(f"{out_prefix}_ws", ws)
        .withColumn(f"{out_prefix}_bpe", bpe_ish)
        .withColumn(f"{out_prefix}_chars4", (F.length(t) / 4.0))
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + combined score in [0,1]:
    length band, mean word length band, punctuation ratio, uppercase
    ratio, stopword(en) ratio, digit ratio."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.lower(F.trim(t)), r"\s+")
    n_words = F.size(words)
    mean_wlen = n_chars / F.greatest(n_words, F.lit(1))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    n_upper = F.length(t) - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    upper_ratio = n_upper / F.greatest(n_chars, F.lit(1))
    n_digit = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    digit_ratio = n_digit / F.greatest(n_chars, F.lit(1))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    sw_hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    sw_ratio = sw_hits / F.greatest(n_words, F.lit(1))

    len_ok = F.when((n_words >= 10) & (n_words <= 100000), 1.0).otherwise(0.3)
    wlen_ok = F.when((mean_wlen >= 3) & (mean_wlen <= 12), 1.0).otherwise(0.4)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.4)
    upper_ok = F.when(upper_ratio <= 0.3, 1.0).otherwise(0.5)
    sw_ok = F.when(sw_ratio >= 0.05, 1.0).otherwise(0.6)
    score = (len_ok * wlen_ok * punct_ok * upper_ok * sw_ok)
    return (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", mean_wlen)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("upper_ratio", upper_ratio)
        .withColumn("digit_ratio", digit_ratio)
        .withColumn("stopword_ratio", sw_ratio)
        .withColumn("quality", score)
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language heuristic: per language, the fraction of
    words that are in its stopword list; predicted language = argmax
    (ties -> 'und' undetermined when max hit rate < 2%)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tmp = df.withColumn("_words", words).withColumn(
        "_nw", F.greatest(F.size(words), F.lit(1))
    )
    langs = sorted(STOPWORDS)
    for lang in langs:
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.filter(F.col("_words"), lambda w: F.array_contains(sw, w)))
        tmp = tmp.withColumn(f"hit_{lang}", hits / F.col("_nw"))
    best = F.greatest(*[F.col(f"hit_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties
        pred = F.when(F.col(f"hit_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best < 0.02, F.lit("und")).otherwise(pred)
    return tmp.withColumn("lang_pred", pred).drop("_words", "_nw")


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, §A1.1 quality
    filters — public):

    - ``dup_line_frac``: fraction of lines that repeat an earlier line
      (1 - distinct/total over '\\n' splits).
    - ``dup_ngram_frac_{2,3}``: fraction of word n-grams that are
      repeats of an n-gram already seen in the doc.
    - ``top_bigram_frac``: share of all bigrams taken by the single
      most frequent bigram (copy-paste spam spikes this).
    - ``symbol_word_ratio``: '#'/ellipsis symbols per word.
    - ``repetition_flag``: 1 when any signal crosses the published
      Gopher rejection bands (dup lines > 0.30, dup 2-grams > 0.20,
      top bigram > 0.18, symbol ratio > 0.10).

    All per-row JVM array expressions — no explode, no shuffle, no UDF;
    the most-frequent-bigram count is a sort + one-pass fold
    (max run length in the sorted array) instead of a groupBy.
    """
    t = F.col(text_col)
    lines = F.split(t, r"\n")
    n_lines = F.size(lines)
    dup_line = (n_lines - F.size(F.array_distinct(lines))) / F.greatest(
        n_lines, F.lit(1)
    )
    words = F.split(F.lower(F.trim(t)), r"\s+")
    tmp = df.withColumn("_w", words)

    def ngrams(n):
        return F.expr(
            f"transform(sequence(0, greatest(size(_w) - {n}, 0)), "
            f"i -> concat_ws(' ', slice(_w, i + 1, {n})))"
        )

    def dup_frac(arr):
        return (F.size(arr) - F.size(F.array_distinct(arr))) / F.greatest(
            F.size(arr), F.lit(1)
        )

    def max_run(arr):
        # most-frequent element count == longest equal run in the
        # sorted array; one fold, no shuffle
        acc0 = F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        )
        run = lambda acc, x: F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
        fold = F.aggregate(
            F.array_sort(arr),
            acc0,
            lambda acc, x: F.struct(
                x.alias("prev"),
                run(acc, x).alias("run"),
                F.greatest(acc.best, run(acc, x)).alias("best"),
            ),
        )
        return fold.best

    bi = ngrams(2)
    tmp = tmp.withColumn("_bi", bi).withColumn("_tri", ngrams(3))
    n_words = F.greatest(F.size(F.col("_w")), F.lit(1))
    n_sym = F.size(F.regexp_extract_all(t, F.lit(r"#|\.\.\.|…"), 0))
    out = (
        tmp.withColumn("dup_line_frac", dup_line)
        .withColumn("dup_ngram_frac_2", dup_frac(F.col("_bi")))
        .withColumn("dup_ngram_frac_3", dup_frac(F.col("_tri")))
        .withColumn(
            "top_bigram_frac",
            max_run(F.col("_bi")) / F.greatest(F.size(F.col("_bi")), F.lit(1)),
        )
        .withColumn("symbol_word_ratio", n_sym / n_words)
    )
    # the top-bigram share is trivially ~1 on tiny docs (a 2-word doc
    # has one bigram); require a minimal sample before it can flag
    n_bi = F.size(F.col("_bi"))
    flag = (
        (F.col("dup_line_frac") > 0.30)
        | (F.col("dup_ngram_frac_2") > 0.20)
        | ((F.col("top_bigram_frac") > 0.18) & (n_bi >= 5))
        | (F.col("symbol_word_ratio") > 0.10)
    )
    return out.withColumn("repetition_flag", flag.cast("int")).drop(
        "_w", "_bi", "_tri"
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", n_hashes: int = 4
) -> DataFrame:
    """Rolling-hash document fingerprint: xxhash64 of the full text plus
    the min word-trigram hash (a 1-element winnowing sketch) — cheap
    near-identity signature for clustering/sharding."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tmp = df.withColumn("_w", words)
    tri = F.expr(
        "transform(sequence(0, greatest(size(_w) - 3, 0)), "
        "i -> xxhash64(concat_ws(' ', slice(_w, i + 1, 3))))"
    )
    return (
        tmp.withColumn("fp_full", F.xxhash64(F.col(text_col)))
        .withColumn("fp_min_trigram", F.array_min(tri))
        .drop("_w")
    )


def top_ngrams(
    df: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Corpus-wide top-k word n-grams by occurrence count (with doc
    frequency).  Scale shape: explode -> ONE groupBy (map-side partial
    aggregation cuts the shuffle by the per-partition repetition
    factor) -> global top-k via a single k-row window over the
    aggregated (tiny) table — never over the raw explode.  Ties break
    lexicographically for determinism."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tmp = df.withColumn("_w", words)
    grams = F.expr(
        f"transform(sequence(0, greatest(size(_w) - {n}, 0)), "
        f"i -> concat_ws(' ', slice(_w, i + 1, {n})))"
    )
    exploded = tmp.select(
        F.col(text_col), F.explode(grams).alias("ngram")
    )
    counts = exploded.groupBy("ngram").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    docfreq = (
        tmp.select(F.explode(F.array_distinct(grams)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    top = (
        counts.join(docfreq, on="ngram")
        .where(F.col("n_occurrences") >= min_count)
        # TakeOrderedAndProject: per-partition top-k then merge — never
        # a single-partition sort of the full distinct-ngram table
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram"))
        .limit(k)
    )
    ranked = top.withColumn(
        "rank",
        F.row_number().over(
            # k rows only — the single-partition window is bounded by k
            Window.orderBy(F.col("n_occurrences").desc(), F.col("ngram"))
        ),
    )
    return ranked.select("rank", "ngram", "n_occurrences", "n_docs")


def clean_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_clean",
    lowercase: bool = False,
) -> DataFrame:
    """Whitespace/control normalization (the standard pre-shingling
    cleanup): strip C0/C1 control chars (keeping \\n and \\t, which
    then fold into the whitespace collapse), collapse runs of
    whitespace to one space, trim.  Pure JVM regexp_replace — the
    RE2-compatible patterns run unchanged in the DuckDB oracle."""
    t = F.col(text_col)
    t = F.regexp_replace(t, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    t = F.regexp_replace(t, r"\s+", " ")
    t = F.trim(t)
    if lowercase:
        t = F.lower(t)
    return df.withColumn(out_col, t)


def compression_ratio(
    df: DataFrame, text_col: str = "text", out_col: str = "zlib_ratio"
) -> DataFrame:
    """zlib compression ratio (compressed/raw bytes) — the classic
    redundancy signal (low ratio = highly repetitive/templated text;
    Gopher-family pipelines filter on it).  zlib level 6 is
    deterministic for a given input, so the pytest oracle compares
    bit-exactly against driver-side python zlib.  Arrow-batched pandas
    UDF (the allowed Python path): ~1e5 docs/s/core, no per-row
    Python."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _ratio_fn(s):
        import zlib

        def one(x):
            if x is None:
                return None
            b = x.encode("utf-8")
            if not b:
                return 1.0
            return len(zlib.compress(b, 6)) / len(b)

        return s.map(one)

    # real annotation objects: PEP-563 string annotations (active in
    # this module) are not resolvable by pandas_udf's hint inference
    _ratio_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _ratio = pandas_udf(_ratio_fn, "double")

    return df.withColumn(out_col, _ratio(F.col(text_col)))


def compression_roundtrip_fail(df: DataFrame, text_col: str = "text",
                               out_col: str = "zlib_fail") -> DataFrame:
    """0/1 per row: does zlib decompress(compress(text)) differ from
    the original bytes?  Always 0 for a healthy codec, which makes it a
    self-verifying in-query invariant (the SQL twin is a literal 0) —
    the same pattern as the Gorilla token-array-equality oracle.  Nulls
    pass (0).  Arrow-batched pandas UDF, no per-row Python."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fail_fn(s):
        import zlib

        def one(x):
            if x is None:
                return 0
            b = x.encode("utf-8")
            return 0 if zlib.decompress(zlib.compress(b, 6)) == b else 1

        return s.map(one)

    _fail_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _fail = pandas_udf(_fail_fn, "long")
    return df.withColumn(out_col, _fail(F.col(text_col)))


def bpe_pair_counts(
    df: DataFrame,
    tokens_col: str = "tokens",
    top_k: int | None = None,
) -> DataFrame:
    """Adjacent token-pair frequencies over a token-array column — the
    counting kernel of BPE vocabulary induction (the most frequent pair
    is the next merge candidate) and a corpus-bigram statistic in its
    own right.

    Scale shape: pair extraction is ROW-LOCAL (one ``transform`` over a
    position sequence — the token arrays never reach the shuffle); the
    only exchange moves map-side-combined (a, b, partial_count) rows.
    ``top_k`` ranks by (count DESC, a, b) — a deterministic total order
    — via TakeOrdered, never a full global sort.

    Returns (a, b, n_pairs)."""
    t = F.col(tokens_col)
    eligible = df.where(F.size(t) >= 2)  # sequence(0, -1) would descend
    pairs = eligible.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 2),
                lambda i: F.struct(t[i].alias("a"), t[i + 1].alias("b")),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    counts = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_pairs"))
    if top_k is not None:
        counts = counts.orderBy(
            F.col("n_pairs").desc(), "a", "b"
        ).limit(top_k)
    return counts


def unigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "unigram_logprob",
    smoothing: float = 1.0,
) -> DataFrame:
    """Mean per-word unigram log-probability under the corpus's own
    word distribution — the cheap LM-quality proxy (gibberish and
    rare-token spam score far below fluent text; CCNet-style pipelines
    threshold on exactly this signal, just with a bigger LM).

    Two aggregations, no UDFs: corpus unigram counts (one groupBy with
    map-side combine; add-``smoothing`` Laplace), then explode docs,
    join counts on the word, and average ``ln p(w)`` per doc.  The
    count table is the corpus vocabulary — usually broadcastable; at
    web scale the equi-join on the word hashes and AQE handles the
    Zipf head.
    """
    words_arr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tokens = df.select(F.col(id_col), F.explode(words_arr).alias("_w"))
    counts = tokens.groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
    vocab_total = counts.agg(
        F.sum("_c").alias("_tot"), F.count(F.lit(1)).alias("_v")
    )
    scored = (
        tokens.join(counts, on="_w")
        .crossJoin(F.broadcast(vocab_total))
        .withColumn(
            "_lp",
            F.log(
                (F.col("_c") + F.lit(float(smoothing)))
                / (F.col("_tot") + F.lit(float(smoothing)) * F.col("_v"))
            ),
        )
        .groupBy(id_col)
        .agg(F.avg("_lp").alias(out_col), F.count(F.lit(1)).alias("_nw"))
        .drop("_nw")
    )
    return df.join(scored, on=id_col, how="left")


def bigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 1.0,
) -> DataFrame:
    """Mean per-bigram conditional log-probability ``ln p(w_i | w_{i-1})``
    under the corpus's own bigram counts with add-``smoothing``
    (Laplace) over the corpus vocabulary — one order up from
    :func:`unigram_logprob_score`: fluent text scores high because its
    word PAIRS recur corpus-wide, while shuffled-word spam that fools
    the unigram proxy (same words, scrambled order) scores low.  The
    standard KenLM-lite fluency signal for training-data pipelines.

    ``p(b | a) = (c(a,b) + k) / (c(a,·) + k * V)`` where ``c(a,·)``
    counts bigrams starting with ``a`` and ``V`` is the corpus
    vocabulary size.

    Three aggregations, no UDFs: bigram pairs come from a row-local
    ``transform`` over the word array (adjacent pairs — no self-join),
    corpus pair/context counts are two groupBys with map-side combine,
    and scoring re-joins the exploded pairs on (a, b) — narrow rows
    (two words + a count), AQE-handled Zipf head, the same shuffle
    shape as the unigram scorer.  Docs with < 2 words score null.
    """
    words_arr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # NB: sequence(1, 0) is a DESCENDING [1, 0] in Spark, not empty —
    # single-word docs need the explicit empty-array branch
    pairs_arr = F.expr(
        "CASE WHEN size(_words) >= 2 THEN "
        "transform(sequence(1, size(_words) - 1), "
        "i -> struct(_words[i - 1] AS a, _words[i] AS b)) "
        "ELSE array() END"
    )
    pairs = (
        df.select(F.col(id_col), words_arr.alias("_words"))
        .select(F.col(id_col), F.explode(pairs_arr).alias("_pr"))
        .select(id_col, F.col("_pr.a").alias("_a"), F.col("_pr.b").alias("_b"))
    )
    pair_c = pairs.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_cab"))
    ctx_c = pair_c.groupBy("_a").agg(F.sum("_cab").alias("_ca"))
    vocab = (
        df.select(F.explode(words_arr).alias("_w"))
        .agg(F.count_distinct("_w").alias("_v"))
    )
    k = F.lit(float(smoothing))
    scored = (
        pairs.join(pair_c, on=["_a", "_b"])
        .join(ctx_c, on="_a")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "_lp",
            F.log((F.col("_cab") + k) / (F.col("_ca") + k * F.col("_v"))),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg("_lp").alias("bigram_logprob"),
        )
    )
    return df.join(scored, on=id_col, how="left").withColumn(
        "n_bigrams", F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
    )


def tfidf_top_terms(
    df: DataFrame,
    top_k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Top-``top_k`` terms per ``group_col`` by tf-idf (Spärck Jones
    1972): ``score = tf(group, w) * ln(n_docs / df(w))`` with raw
    group-level term frequency and document frequency over the whole
    corpus — the standard "what characterizes this source" summary a
    corpus curation pipeline reads before weighting sources.

    Rank is deterministic across engines: terms order by
    (round(score, 6) DESC, term ASC), so a last-rank tie never
    flip-flops on floating summation order.

    Scale shape: one explode + two groupBys (term stats carry narrow
    (word, count) rows with map-side combine), a broadcast of the
    one-row corpus size, and a per-group window TOP-K over the
    (group, term) aggregate — the window input is already one row per
    distinct (group, term), never the raw token stream.  No UDFs.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    words_arr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tok = df.select(
        F.col(id_col), F.col(group_col), F.explode(words_arr).alias("term")
    )
    tf = tok.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("term").agg(
        F.count_distinct(id_col).alias("_df")
    )
    n_docs = df.agg(F.count_distinct(id_col).alias("_nd"))
    scored = (
        tf.join(dfreq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * F.log(F.col("_nd").cast("double") / F.col("_df").cast("double")),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.round(F.col("score"), 6).desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            group_col,
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("_df").cast("long").alias("df"),
            "score",
        )
    )


def source_kl_divergence(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Kullback-Leibler divergence of each source's unigram
    distribution from the whole-corpus distribution,
    ``KL(P_s || Q) = sum_w P_s(w) * ln(P_s(w) / Q(w))`` (Kullback &
    Leibler 1951) — the standard corpus-drift / source-outlier signal
    a curation pipeline watches before re-weighting a mix: a source
    whose KL spikes is writing in a different vocabulary than the
    corpus it feeds.

    No smoothing is needed: every word of a source is in the corpus by
    construction, so Q(w) > 0 wherever P_s(w) > 0 and the sum is
    finite.  Also emits the source's token count, vocabulary size, and
    out-of-profile mass share ``top_term_mass`` (the probability mass
    of the source's single most frequent term — the quick degenerate-
    source tell).

    Scale shape: one explode, two narrow (word, count) groupBys with
    map-side combine, a broadcast of the one-row corpus total, and a
    final per-source groupBy over the (source, term) aggregate — the
    tfidf_top_terms plan with a sum instead of a window.  No UDFs.
    """
    words_arr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tok = df.select(F.col(group_col), F.explode(words_arr).alias("_w"))
    tf = tok.groupBy(group_col, "_w").agg(F.count(F.lit(1)).alias("_c"))
    totals = tf.groupBy(group_col).agg(F.sum("_c").alias("_tot_s"))
    corpus = tok.groupBy("_w").agg(F.count(F.lit(1)).alias("_cq"))
    corpus_total = tok.agg(F.count(F.lit(1)).alias("_tot_q"))
    p = (
        tf.join(totals, on=group_col)
        .join(corpus, on="_w")
        .crossJoin(F.broadcast(corpus_total))
    )
    ps = F.col("_c").cast("double") / F.col("_tot_s").cast("double")
    qw = F.col("_cq").cast("double") / F.col("_tot_q").cast("double")
    out = p.groupBy(group_col).agg(
        F.sum(ps * F.log(ps / qw)).alias("kl"),
        F.max("_tot_s").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_vocab"),
        F.max(ps).alias("top_term_mass"),
    )
    return out.select(
        group_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_vocab").cast("long").alias("n_vocab"),
        "kl",
        "top_term_mass",
    )


def zipf_slope(
    df: DataFrame,
    max_rank: int = 256,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Zipf rank-frequency slope per source: OLS fit of ``ln(freq)`` on
    ``ln(rank)`` over the top ``max_rank`` terms (Zipf 1949; natural
    text sits near slope -1) — the corpus-health tell that catches
    template/boilerplate-dominated sources (slope far below -1: a few
    terms eat the mass) and synthetic/uniform gibberish (slope near 0)
    that per-doc quality filters miss because every individual doc
    looks fine.

    Rank is deterministic across engines: (count DESC, term ASC).

    Scale shape: the tfidf plan — one explode, one (source, term)
    groupBy with map-side combine, a per-source TOP-``max_rank`` window
    over the aggregate (bounded by dictionary size, never corpus
    size), then a 5-sum OLS fold over <= max_rank rows per source.
    """
    if max_rank < 3:
        raise ValueError(f"max_rank must be >= 3, got {max_rank}")
    words_arr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tok = df.select(F.col(group_col), F.explode(words_arr).alias("_w"))
    tf = tok.groupBy(group_col, "_w").agg(F.count(F.lit(1)).alias("_c"))
    w = Window.partitionBy(group_col).orderBy(
        F.col("_c").desc(), F.col("_w").asc()
    )
    ranked = tf.withColumn("_rk", F.row_number().over(w)).where(
        F.col("_rk") <= max_rank
    )
    x = F.log(F.col("_rk").cast("double"))
    y = F.log(F.col("_c").cast("double"))
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
    )
    p = F.col("n_terms").cast("double")
    den = p * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        (F.col("n_terms") >= 3) & (F.abs(den) > 1e-12),
        (p * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / den,
    )
    intercept = F.when(
        slope.isNotNull(),
        (F.col("_sy") - slope * F.col("_sx")) / p,
    )
    return agg.select(
        group_col,
        F.col("n_terms").cast("long").alias("n_terms"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc n-gram novelty: the fraction of a doc's DISTINCT word
    n-grams whose first corpus occurrence (minimum ``doc_id``) is this
    doc — the redundancy-growth curve a dedup pipeline reads to decide
    where incremental data stops adding information (novelty near 0 =
    the doc restates earlier material even if no single document
    matches it, the gap exact/near-dup detectors leave).

    Scale shape: n-grams are built row-locally (adjacent-window
    transform + array_distinct — no self-join), then one groupBy for
    the per-n-gram first-doc and one join back on the n-gram — the
    decontaminate_ngrams shuffle shape.  At the 10^12 scale the join
    key would be ``xxhash64(ngram)`` (8-byte rows, same min/first-doc
    algebra); the string key here keeps the oracle engine-portable.
    Docs with fewer than ``n`` words have 0 n-grams and null novelty.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    words_arr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams_arr = F.expr(
        f"CASE WHEN size(_words) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size(_words) - {n}), "
        f"i -> concat_ws(' ', slice(_words, i + 1, {n})))) "
        "ELSE array() END"
    )
    grams = (
        df.select(F.col(id_col), words_arr.alias("_words"))
        .select(F.col(id_col), F.explode(grams_arr).alias("_g"))
    )
    first = grams.groupBy("_g").agg(F.min(id_col).alias("_first"))
    scored = (
        grams.join(first, on="_g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.avg(
                F.when(F.col(id_col) == F.col("_first"), 1.0).otherwise(0.0)
            ).alias("novelty"),
        )
    )
    return df.select(id_col).join(scored, on=id_col, how="left").select(
        id_col,
        F.coalesce(F.col("n_ngrams"), F.lit(0)).cast("long").alias(
            "n_ngrams"
        ),
        "novelty",
    )


def heaps_law(
    df: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Heaps'-law vocabulary-growth exponent per source (Heaps 1978;
    Herdan 1960): OLS fit of ``ln V`` on ``ln N`` over the per-doc
    cumulative (tokens seen N, distinct vocabulary V) curve, docs
    ordered by ``doc_col``.  Natural corpora sit near beta 0.4-0.6;
    beta near 0 is a closed template vocabulary, beta near 1 is
    id-like unbounded vocab — the growth-side companion of
    :func:`zipf_slope`'s static rank-frequency check, and together
    the cheapest corpus-synthesis tell.

    Same whitespace tokenizer as zipf_slope (consistency).  Emits per
    source: ``n_docs``, ``tokens`` (final N), ``vocab`` (final V),
    ``heaps_beta``, ``heaps_lnk`` (intercept), nulls when fewer than
    3 curve points or zero slope-variance.

    Scale shape: one explode, then (group, word) and (group, doc)
    groupBys with map-side combine, a per-group ordered window over
    PER-DOC summaries (docs-per-group rows, never tokens), and a
    5-sum OLS fold.  The cumulative-vocab trick: a word contributes a
    +1 exactly at its FIRST doc (min doc id), so V_i is a running sum
    of per-doc first-occurrence counts — no quadratic doc x vocab
    scan.
    """
    new_col = "_nw"
    tok = df.select(
        F.col(group_col),
        F.col(doc_col).alias("_doc"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("_w"),
    )
    per_doc = tok.groupBy(group_col, "_doc").agg(
        F.count(F.lit(1)).alias("_nt")
    )
    firsts = (
        tok.groupBy(group_col, "_w")
        .agg(F.min("_doc").alias("_doc"))
        .groupBy(group_col, "_doc")
        .agg(F.count(F.lit(1)).alias(new_col))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("_doc")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = (
        per_doc.join(firsts, on=[group_col, "_doc"], how="left")
        .withColumn("_N", F.sum("_nt").over(w))
        .withColumn("_V", F.sum(F.coalesce(F.col(new_col), F.lit(0))).over(w))
    )
    x = F.log(F.col("_N").cast("double"))
    y = F.log(F.col("_V").cast("double"))
    agg = curve.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("_N").cast("long").alias("tokens"),
        F.max("_V").cast("long").alias("vocab"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
    )
    n = F.col("n_docs").cast("double")
    den = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    beta = F.when(
        (F.col("n_docs") >= 3) & (F.abs(den) > 1e-12),
        (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / den,
    )
    lnk = F.when(
        beta.isNotNull(), (F.col("_sy") - beta * F.col("_sx")) / n
    )
    return agg.select(
        group_col, "n_docs", "tokens", "vocab",
        beta.alias("heaps_beta"),
        lnk.alias("heaps_lnk"),
    )


def textrank_keywords(
    df: DataFrame,
    iters: int = 10,
    damping_num: int = 17,
    damping_den: int = 20,
    min_cooc: int = 2,
    scale: int = 1_000_000_000,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """TextRank keyword scoring (Mihalcea & Tarau, EMNLP 2004):
    PageRank (Page et al. 1999) over the word co-occurrence graph —
    an undirected edge links words adjacent at least ``min_cooc``
    times in the corpus — run for a FIXED ``iters`` iterations in
    INTEGER fixed-point arithmetic:

        pr_0[v]   = scale // N
        share[u]  = pr_i[u] // outdeg[u]
        pr_{i+1}[v] = (scale - scale*d_num//d_den) // N
                      + (d_num * sum_{u->v} share[u]) // d_den

    Every operation is exact long arithmetic (floor division, no
    floats anywhere), so the iteration — unlike a floating PageRank,
    whose per-iteration double sums are partition-order dependent —
    is bit-identical across engines, partition counts, and replays;
    an unrolled SQL twin reproduces each pr vector exactly.  The
    damping factor is the rational d_num/d_den (default 17/20 =
    0.85).

    Emits per word: ``pr`` (the final fixed-point long; divide by
    ``scale`` for the probability-like score), ``outdeg``.

    Scale shape: one explode + one (word_a, word_b) bigram groupBy
    builds the graph (bounded by vocab²); each iteration is one
    narrow join + groupBy on the word key.  Plans are built by a
    driver loop — at web vocab sizes checkpoint every few iterations
    (tiers.py snapshot seam) to cut lineage, exactly as documented in
    DESIGN_SCALE for iterative fixpoints (connected components).
    """
    if iters < 1 or min_cooc < 1 or scale < 1000:
        raise ValueError("need iters>=1, min_cooc>=1, scale>=1000")
    if not (0 < damping_num < damping_den):
        raise ValueError("damping must satisfy 0 < num < den")
    w = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tok = df.select(
        F.col(doc_col).alias("_doc"), F.posexplode(w).alias("_i", "_w")
    )
    # adjacent pairs WITHIN a doc: self-join on (_doc, _i+1)
    a = tok.select("_doc", "_i", F.col("_w").alias("_wa"))
    b = tok.select(
        "_doc", (F.col("_i") - 1).alias("_i"), F.col("_w").alias("_wb")
    )
    big = (
        a.join(b, on=["_doc", "_i"])
        .where(F.col("_wa") != F.col("_wb"))
        .select(
            F.least("_wa", "_wb").alias("wa"),
            F.greatest("_wa", "_wb").alias("wb"),
        )
        .groupBy("wa", "wb")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_cooc)
    )
    edges = big.select("wa", "wb").unionByName(
        big.select(F.col("wb").alias("wa"), F.col("wa").alias("wb"))
    )
    deg = edges.groupBy("wa").agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )
    n_nodes = deg.count()
    if n_nodes == 0:
        return deg.select(
            F.col("wa").alias("word"), F.lit(0).cast("long").alias("pr"),
            "outdeg",
        )
    base = int((scale - scale * damping_num // damping_den) // n_nodes)
    pr = deg.select(
        "wa", F.lit(int(scale // n_nodes)).cast("long").alias("pr")
    )
    for _ in range(int(iters)):
        contrib = (
            pr.join(deg, on="wa")
            .join(edges, on="wa")
            .select(
                F.col("wb").alias("wa"),
                # true integer division (`div`), NOT double-divide+cast:
                # exactness is the whole point of the fixed-point form
                F.expr("pr div outdeg").alias("_sh"),
            )
            .groupBy("wa")
            .agg(F.sum("_sh").alias("_in"))
        )
        pr = (
            deg.select("wa")
            .join(contrib, on="wa", how="left")
            .withColumn("_in", F.coalesce(F.col("_in"), F.lit(0)))
            .select(
                "wa",
                (
                    F.lit(base)
                    + F.expr(
                        f"({int(damping_num)} * _in) div "
                        f"{int(damping_den)}"
                    )
                ).cast("long").alias("pr"),
            )
        )
        # cut lineage each iteration: without this the 10-iteration
        # plan stacks ~40 joins and Catalyst analysis dominates wall
        # (16.8s -> 4.5s at sf0.001); values are already exact longs,
        # so materializing changes nothing
        pr = pr.localCheckpoint(eager=True)
    return pr.join(deg, on="wa").select(
        F.col("wa").alias("word"), "pr", "outdeg"
    )
