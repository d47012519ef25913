"""Scrub operators: PII redaction counts/placeholders and deterministic
hash sampling (rate accuracy, partitioning invariance, strata quotas)."""

from __future__ import annotations

import pyspark.sql.functions as F

from diive_spark.operators.scrub import (
    hash_sample,
    rate_threshold_hex,
    redact_pii,
    stratified_hash_sample,
)


def test_redact_pii_counts_and_placeholders(spark):
    rows = [
        (1, "mail a@b.co and c.d+x@e.org, server 192.168.0.1, "
            "call +1 (415) 555-0100 now"),
        (2, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_email"] == 2
    assert out[1]["n_ipv4"] == 1
    assert out[1]["n_phone"] == 1
    red = out[1]["text_redacted"]
    assert "<EMAIL>" in red and "<IPV4>" in red and "<PHONE>" in red
    assert "a@b.co" not in red and "192.168" not in red and "555" not in red
    assert out[2]["text_redacted"] == "no pii here at all"
    assert out[2]["n_email"] == out[2]["n_ipv4"] == out[2]["n_phone"] == 0


def test_hash_sample_rate_and_partition_invariance(spark):
    df = spark.range(0, 10000).withColumnRenamed("id", "k")
    kept = hash_sample(df, 0.2, "k", seed=3)
    n = kept.count()
    assert abs(n / 10000 - 0.2) < 0.02          # binomial 3-sigma ~ 0.012
    ids1 = sorted(r["k"] for r in kept.collect())
    ids2 = sorted(
        r["k"] for r in hash_sample(df.repartition(17), 0.2, "k", seed=3).collect()
    )
    assert ids1 == ids2                          # layout-independent verdicts
    ids_seed4 = {r["k"] for r in hash_sample(df, 0.2, "k", seed=4).collect()}
    assert set(ids1) != ids_seed4                # seed actually matters


def test_hash_sample_edge_rates(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    assert hash_sample(df, 0.0, "k").count() == 0
    assert hash_sample(df, 1.0, "k").count() == 100
    assert rate_threshold_hex(1.0) == "ffffffff"
    assert rate_threshold_hex(0.0) == "00000000"


def test_stratified_hash_sample_quotas(spark):
    df = (
        spark.range(0, 6000)
        .withColumnRenamed("id", "k")
        .withColumn(
            "lang",
            F.when(F.col("k") % 3 == 0, "en")
            .when(F.col("k") % 3 == 1, "de")
            .otherwise("zh"),
        )
    )
    kept = stratified_hash_sample(
        df, {"en": 1.0, "de": 0.5, "zh": 0.0}, strata_col="lang", key_col="k"
    )
    counts = {r["lang"]: r["n"] for r in
              kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("en") == 2000
    assert abs(counts.get("de", 0) / 2000 - 0.5) < 0.05
    assert "zh" not in counts


def test_clean_text_hand_values(spark):
    from diive_spark.operators.textstats import clean_text

    df = spark.createDataFrame(
        [(1, "  a  b\t\tc\x07 "), (2, "x\x00y"), (3, "ok")],
        "id long, text string",
    )
    out = {r["id"]: r["text_clean"] for r in clean_text(df).collect()}
    assert out[1] == "a b c"
    assert out[2] == "xy"
    assert out[3] == "ok"
    low = clean_text(df, lowercase=True).collect()[0]
    assert low["text_clean"] == low["text_clean"].lower()


def test_compression_ratio_matches_python_zlib(spark):
    import zlib

    from diive_spark.operators.textstats import compression_ratio

    texts = ["abc " * 200, "the quick brown fox", "x"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {r["id"]: r["zlib_ratio"] for r in compression_ratio(df).collect()}
    for i, t in enumerate(texts):
        b = t.encode()
        assert got[i] == len(zlib.compress(b, 6)) / len(b)   # bit-exact
    assert got[0] < 0.1 < got[1]       # repetitive text compresses far more


def test_hash_split_deterministic_partition_and_ratio(spark):
    from diive_spark.operators.scrub import hash_split

    df = spark.range(0, 20000).withColumnRenamed("id", "k")
    out = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, key_col="k")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.01
    # every row gets exactly one split; repartition doesn't move anyone
    a = {r["k"]: r["split"] for r in out.collect()}
    b = {r["k"]: r["split"] for r in hash_split(
        df.repartition(13), {"train": 0.8, "val": 0.1, "test": 0.1},
        key_col="k").collect()}
    assert a == b
    import pytest as _pt
    with _pt.raises(ValueError):
        hash_split(df, {"train": 0.5, "val": 0.1}, key_col="k")


def test_remove_boilerplate_paragraphs(spark):
    """Paragraphs repeated across > max_df docs vanish; order of the
    survivors is preserved; unique docs untouched."""
    from diive_spark.operators.scrub import remove_boilerplate_paragraphs

    footer = "subscribe to our newsletter"
    rows = [
        (1, f"intro one\n\n{footer}\n\nbody one"),
        (2, f"intro two\n\n{footer}\n\nbody two"),
        (3, f"{footer}\n\nbody three"),
        (4, "totally unique document"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_boilerplate_paragraphs(df, max_df=2).collect()}
    assert out[1]["text_clean"] == "intro one\n\nbody one"
    assert out[2]["text_clean"] == "intro two\n\nbody two"
    assert out[3]["text_clean"] == "body three"
    assert out[4]["text_clean"] == "totally unique document"
    assert out[1]["n_dropped"] == 1 and out[4]["n_dropped"] == 0


def test_decontaminate_planted_overlap(spark):
    from diive_spark.operators.scrub import contamination_hits, decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains "quick brown fox jumps" and "brown fox jumps over"
            (1, "she saw the quick brown fox jumps over a fence"),
            (2, "completely unrelated sentence about sparking rollups"),
            (3, "short doc"),
            # exact benchmark copy: all 6 distinct 4-grams hit
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    hits = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_hits(corpus, bench, n=4).collect()
    }
    assert hits == {1: 3, 4: 6}

    flagged = decontaminate(corpus, bench, n=4, min_hits=4)
    got = {r["doc_id"]: (r["n_contam_hits"], r["flag_contaminated"])
           for r in flagged.collect()}
    assert got == {1: (3, 0), 2: (0, 0), 3: (0, 0), 4: (6, 1)}

    kept = decontaminate(corpus, bench, n=4, drop=True)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    assert "n_contam_hits" not in kept.columns


def test_word_ngrams_short_doc_guard(spark):
    from diive_spark.operators.scrub import word_ngrams

    df = spark.createDataFrame([("a b",)], "text string")
    out = df.select(word_ngrams(F.col("text"), 4).alias("g")).collect()
    assert out[0]["g"] == []


def test_perplexity_bucket_sample_head_tail(spark):
    from diive_spark.operators.scrub import perplexity_bucket_sample

    common = "the cat sat on the mat and the dog ran to the cat"
    rows = []
    # 12 fluent docs built from the same common words -> high logprob
    for i in range(12):
        rows.append((i, common))
    # 6 gibberish docs of unique rare tokens -> low logprob
    for i in range(12, 18):
        rows.append((i, f"qzx{i}a wvu{i}b jkl{i}c mnp{i}d xyz{i}e"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    kept = perplexity_bucket_sample(df, rates=(1.0, 1.0, 1.0), seed=3)
    buckets = {r["doc_id"]: r["ppl_bucket"] for r in kept.collect()}
    assert len(buckets) == 18  # all-1.0 rates keep everything
    assert all(buckets[i] == 0 for i in range(12))      # fluent = head
    assert all(buckets[i] == 2 for i in range(12, 18))  # gibberish = tail

    # tail rate 0 drops every gibberish doc, head rate 1 keeps all fluent
    kept2 = perplexity_bucket_sample(df, rates=(1.0, 1.0, 0.0), seed=3)
    ids = sorted(r["doc_id"] for r in kept2.collect())
    assert ids == list(range(12))


def test_temperature_mix_flattens_head(spark):
    from diive_spark.operators.scrub import temperature_mix_sample

    rows = ([(i, "big") for i in range(1000)]
            + [(1000 + i, "small") for i in range(10)])
    df = spark.createDataFrame(rows, "doc_id long, src string")

    kept = temperature_mix_sample(df, alpha=0.3, strata_col="src")
    n = {r["src"]: r["n"] for r in
         kept.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # smallest stratum is the most-upweighted: keeps everything
    assert n["small"] == 10
    # head keeps rate = (1000/10)^(0.3-1) = 100^-0.7 ~ 0.0398
    assert 15 <= n["big"] <= 70, n

    # alpha=1 is proportional sampling: every stratum keeps all rows
    all_kept = temperature_mix_sample(df, alpha=1.0, strata_col="src")
    assert all_kept.count() == 1010

    # determinism across partitionings
    a = sorted(r["doc_id"] for r in
               temperature_mix_sample(df.repartition(1), alpha=0.3,
                                      strata_col="src").collect())
    b = sorted(r["doc_id"] for r in
               temperature_mix_sample(df.repartition(16), alpha=0.3,
                                      strata_col="src").collect())
    assert a == b


def _bloom_py_positions(item: str, k: int, m_bits: int):
    import hashlib

    out = []
    for i in range(k):
        hx = hashlib.md5(f"bf{i}:{item}".encode()).hexdigest()[:15]
        out.append(int(hx, 16) % m_bits)
    return out


def test_bloom_no_false_negatives_and_exact_positions(spark):
    import pandas as pd

    from diive_spark.operators.scrub import bloom_build, bloom_probe

    members = [f"gram-{i}" for i in range(200)]
    probes = members + [f"other-{i}" for i in range(400)]
    m_bits, k = 4096, 4
    bloom = bloom_build(
        spark.createDataFrame(pd.DataFrame({"item": members})),
        m_bits=m_bits, k=k,
    )
    # bit set matches the hashlib twin exactly
    want_bits = sorted(
        {p for it in members for p in _bloom_py_positions(it, k, m_bits)}
    )
    assert sorted(r["bit"] for r in bloom.collect()) == want_bits

    got = bloom_probe(
        spark.createDataFrame(pd.DataFrame({"item": probes})),
        bloom, m_bits=m_bits, k=k,
    ).toPandas().set_index("item")["bloom_hit"]
    # zero false negatives — the Bloom guarantee
    assert all(got[it] for it in members)
    # flags match the hashlib twin per probe (incl. any false positive)
    bitset = set(want_bits)
    for it in probes:
        want = all(p in bitset for p in _bloom_py_positions(it, k, m_bits))
        assert bool(got[it]) == want
    # false-positive rate sane: n=200, m=4096, k=4 -> theory ~0.24%
    fp = sum(bool(got[it]) for it in probes[200:])
    assert fp <= 12  # 3% cap, >10x theory — deterministic given md5


def test_bloom_nulls_and_validation(spark):
    import pandas as pd
    import pytest as _pytest

    from diive_spark.operators.scrub import bloom_build, bloom_probe

    pdf = pd.DataFrame({"item": ["a", None, "b"]})
    bloom = bloom_build(spark.createDataFrame(pdf), m_bits=64, k=2)
    got = bloom_probe(
        spark.createDataFrame(pdf), bloom, m_bits=64, k=2
    ).toPandas()
    # null item probes false; members probe true
    by = {r["item"]: r["bloom_hit"] for _, r in got.iterrows()}
    assert by["a"] and by["b"] and not by[None]
    with _pytest.raises(ValueError):
        bloom_build(spark.createDataFrame(pdf), k=0)
    with _pytest.raises(ValueError):
        bloom_build(spark.createDataFrame(pdf), m_bits=1)
