"""Training-data pipeline ops: dedup (exact/minhash/simhash/jaccard),
similarity search, text stats, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from diive_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard,
    simhash,
    simhash_pairs,
)
from diive_spark.operators.multimodal import extract_features, fake_media_table, frame_sample_plan
from diive_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)
from diive_spark.operators.textstats import doc_fingerprint, language_id, quality_score, token_count


WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(9)
    rows = []
    base_texts = []
    for i in range(40):
        words = rng.choice(WORDS, size=30)
        base_texts.append(" ".join(words))
        rows.append((i, base_texts[-1]))
    # exact duplicates of doc 0 and 1
    rows.append((100, base_texts[0]))
    rows.append((101, base_texts[1]))
    # near duplicate of doc 2: one word changed
    w = base_texts[2].split()
    w[5] = "zulu"
    rows.append((102, " ".join(w)))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs)
    assert out.count() == docs.count() - 2
    kept = {r["doc_id"] for r in out.collect()}
    assert 0 in kept and 100 not in kept
    assert out.where(F.col("dup_count") == 2).count() == 2  # docs 0 and 1


def test_minhash_finds_exact_and_near_dups(spark, docs):
    sigs = minhash_signatures(docs, k=64)
    pairs = minhash_lsh_pairs(sigs, bands=16, est_threshold=0.5).toPandas()
    found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 100) in found
    assert (1, 101) in found
    assert (2, 102) in found  # near dup
    # exact dups estimate jaccard 1.0
    exact = pairs[(pairs["id_a"] == 0) & (pairs["id_b"] == 100)]
    assert exact["est_jaccard"].iloc[0] == 1.0


def test_minhash_dedup_canonical(spark, docs):
    out = minhash_dedup(docs, est_threshold=0.5)
    m = {r["doc_id"]: r["canonical_id"] for r in out.collect()}
    assert m[100] == 0 and m[101] == 1 and m[102] == 2
    assert m[5] == 5  # non-dup maps to itself


def test_connected_components_chain_and_clique(spark):
    """Fixpoint label propagation: a 4-node chain (1-2, 2-3, 3-4) needs
    3 propagation rounds to collapse to min id 1 — the case single-hop
    canonicalization gets wrong; disjoint pair keeps its own label."""
    from diive_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {r["node"]: r["component"]
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_jaccard_pairs_exact_matches_pairwise(spark, docs):
    """Inverted-index all-pairs Jaccard == the pairwise ngram_jaccard
    values for every pair it emits, and finds all planted dups."""
    from diive_spark.operators.dedup import jaccard_pairs_exact

    got = jaccard_pairs_exact(docs, n=3, threshold=0.5).toPandas()
    found = set(map(tuple, got[["id_a", "id_b"]].values))
    assert {(0, 100), (1, 101), (2, 102)} <= found
    pairs = spark.createDataFrame(
        got[["id_a", "id_b"]], "id_a long, id_b long"
    )
    ref = (
        ngram_jaccard(docs, pairs).toPandas()
        .set_index(["id_a", "id_b"])["jaccard"]
    )
    for (a, b), j in got.set_index(["id_a", "id_b"])["jaccard"].items():
        assert abs(ref.loc[(a, b)] - j) < 1e-12


def test_minhash_dedup_multi_hop_chain(spark):
    """a~b and b~c (one word drifts each hop) must all canonicalize to
    min id under multi_hop=True even when a and c alone are not
    LSH-confirmed neighbors."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " \
           "kilo lima mike november oscar papa quebec romeo sierra tango"
    w = base.split()
    v1 = list(w); v1[3] = "xray"
    v2 = list(v1); v2[15] = "yankee"; v2[16] = "zulu"
    rows = [(1, base), (2, " ".join(v1)), (3, " ".join(v2)), (9, " ".join(reversed(w)))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_dedup(docs, est_threshold=0.55, multi_hop=True)
    m = {r["doc_id"]: r["canonical_id"] for r in out.collect()}
    assert m[1] == 1 and m[2] == 1 and m[3] == 1


def test_simhash_near_dups(spark, docs):
    fp = simhash(docs)
    pairs = simhash_pairs(fp, max_hamming=10).toPandas()
    found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 100) in found  # identical text -> hamming 0
    ham0 = pairs[(pairs["id_a"] == 0) & (pairs["id_b"] == 100)]["hamming"].iloc[0]
    assert ham0 == 0


def test_ngram_jaccard_exact_values(spark, docs):
    pairs = spark.createDataFrame(
        [(0, 100), (2, 102)], "id_a long, id_b long"
    )
    out = ngram_jaccard(docs, pairs).toPandas().set_index(["id_a", "id_b"])
    assert out.loc[(0, 100), "jaccard"] == 1.0
    assert 0.5 < out.loc[(2, 102), "jaccard"] < 1.0


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(21)
    base = rng.normal(0, 1, (30, 16)).astype(np.float32)
    base[7] = base[3] + rng.normal(0, 0.01, 16)  # near-dup pair (3, 7)
    pdf = pd.DataFrame(
        {"vec_id": range(30), "embedding": [list(map(float, v)) for v in base]}
    )
    return spark.createDataFrame(pdf).cache()


def test_cosine_topk_bruteforce_matches_numpy(spark, vecs):
    got = cosine_topk_bruteforce(vecs, vecs.where(F.col("vec_id") == 3), k=5).toPandas()
    emb = np.array(vecs.orderBy("vec_id").toPandas()["embedding"].tolist())
    unit = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = unit @ unit[3]
    sims[3] = -np.inf
    exp_top = np.argsort(-sims)[:5]
    assert list(got.sort_values("rank")["vec_id"]) == list(exp_top)
    np.testing.assert_allclose(
        got.sort_values("rank")["cosine"].values, np.sort(sims)[::-1][:5], atol=1e-6
    )


def test_cosine_lsh_finds_near_dup(spark, vecs):
    got = cosine_topk_lsh(vecs, vecs.where(F.col("vec_id") == 3), dim=16,
                          k=3, n_planes=6).toPandas()
    # the 0.9999-cosine twin lands in the same bucket with high prob
    assert 7 in set(got["vec_id"])
    pairs = cosine_near_dup_pairs(vecs, dim=16, threshold=0.99, n_planes=6).toPandas()
    assert (3, 7) in {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}


def test_textstats(spark):
    df = spark.createDataFrame(
        [
            (1, "The cat and the dog played in the garden of the house."),
            (2, "Der Hund und die Katze spielen in dem Garten mit der Maus."),
            (3, "x9$ !!"),
        ],
        "doc_id long, text string",
    )
    tc = token_count(df).toPandas().set_index("doc_id")
    assert tc.loc[1, "tok_ws"] == 12
    assert tc.loc[3, "tok_bpe"] == 5  # x, 9, $, !, !
    li = language_id(df).toPandas().set_index("doc_id")
    assert li.loc[1, "lang_pred"] == "en"
    assert li.loc[2, "lang_pred"] == "de"
    q = quality_score(df).toPandas().set_index("doc_id")
    assert q.loc[1, "quality"] > q.loc[3, "quality"]
    fp = doc_fingerprint(df).toPandas()
    assert fp["fp_full"].nunique() == 3


def test_repetition_features_hand_values(spark):
    """Hand-computed Gopher repetition signals on crafted docs."""
    from diive_spark.operators.textstats import repetition_features

    spam = "buy now " * 10          # 20 words, one bigram dominates
    clean = "the quick brown fox jumps over a lazy dog tonight"
    liney = "a\nb\na\nc\na"          # 5 lines, 'a' x3 -> dup_line 2/5
    df = spark.createDataFrame(
        [(1, spam.strip()), (2, clean), (3, liney)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in repetition_features(df).collect()}
    # spam: 19 bigrams, 3 distinct ("buy now","now buy","buy now"...)
    assert out[1]["top_bigram_frac"] > 0.5
    assert out[1]["dup_ngram_frac_2"] > 0.8
    assert out[1]["repetition_flag"] == 1
    # clean: all bigrams unique
    assert out[2]["dup_ngram_frac_2"] == 0.0
    assert out[2]["repetition_flag"] == 0
    assert abs(out[3]["dup_line_frac"] - 2 / 5) < 1e-12


def test_multimodal_real_decode(spark):
    """REAL decode through the Spark path: PPM images and WAV audio
    produce decode_ok=True with physically meaningful features; opaque
    video bytes fail closed onto the hash-fake fallback."""
    media = fake_media_table(spark, n=12)
    feats = extract_features(media, feature_dim=8).toPandas()
    assert len(feats) == 12
    by_type = feats.groupby("media_type")["decode_ok"].all()
    assert by_type["image"] and by_type["audio"]       # real bytes decode
    assert not feats[feats.media_type == "video"]["decode_ok"].any()
    assert all(len(f) == 8 for f in feats["feature"])
    # image features carry real geometry: width=64, height=48
    img = feats[feats.media_type == "image"].iloc[0]["feature"]
    assert img[0] == 64.0 and img[1] == 48.0 and img[2] == 3.0
    # audio features carry real signal stats: 16 kHz, 0.25 s, rms of a
    # 0.5-amplitude sine = 0.5/sqrt(2)
    aud = feats[feats.media_type == "audio"].iloc[0]["feature"]
    assert abs(aud[0] - 16000 / 48000) < 1e-6
    assert abs(aud[1] - 0.25) < 1e-3
    assert abs(aud[2] - 0.5 / np.sqrt(2)) < 1e-2
    # deterministic: same payload -> same features
    feats2 = extract_features(media, feature_dim=8).toPandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("media_id").reset_index(drop=True),
        feats2.sort_values("media_id").reset_index(drop=True),
    )
    # fake path still available as an explicit hook
    forced = extract_features(media, use_real_codec=False).toPandas()
    assert not forced["decode_ok"].any()
    plan = frame_sample_plan(media, every_ms=1000).toPandas()
    n_videos = (media.toPandas()["media_type"] == "video").sum()
    assert len(plan) == n_videos * 6  # 0..5000 ms inclusive


def test_multimodal_codecs_roundtrip():
    """Pure-numpy codec round trips, no Spark needed."""
    from diive_spark.functions.codecs import (
        CodecError, decode_pnm, decode_wav, encode_pnm, encode_wav,
    )

    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    assert (decode_pnm(encode_pnm(rgb)) == rgb).all()
    gray16 = rng.integers(0, 1024, size=(9, 5), dtype=np.uint16)
    assert (decode_pnm(encode_pnm(gray16, maxval=1023)) == gray16).all()
    # header comments are honored
    hdr = b"P5\n# a comment\n2 2\n255\n" + bytes([0, 50, 100, 200])
    assert decode_pnm(hdr).tolist() == [[0, 50], [100, 200]]

    wave = (rng.random(4000).astype(np.float32) - 0.5) * 0.9
    got, rate = decode_wav(encode_wav(wave, rate=8000))
    assert rate == 8000
    # 16-bit quantization: 0.5 LSB rounding + 32767-vs-32768 scale skew
    assert np.abs(got - wave).max() < 2.0 / 32768
    stereo = np.stack([wave, -wave], axis=1)
    got2, _ = decode_wav(encode_wav(stereo, rate=8000))
    assert got2.shape == (4000, 2)

    for bad in (b"", b"JFIF....", b"RIFFxxxx"):
        try:
            decode_pnm(bad)
            raise AssertionError("should have raised")
        except CodecError:
            pass


def test_multimodal_resize(spark):
    """Nearest-neighbor resize re-encodes valid PPM payloads at the
    target geometry; non-images pass through fail-closed."""
    from diive_spark.functions.codecs import decode_pnm
    from diive_spark.operators.multimodal import resize_images

    media = fake_media_table(spark, n=9)
    out = resize_images(media, out_w=16, out_h=8).toPandas()
    imgs = out[out["decode_ok"]]
    assert len(imgs) == 3                              # the image rows
    for p in imgs["payload"]:
        arr = decode_pnm(bytes(p))
        assert arr.shape == (8, 16, 3)
    assert not out[~out["decode_ok"]]["width"].notna().any()


def test_ivf_topk_recall(spark, vecs):
    from diive_spark.operators.similarity import cosine_topk_bruteforce, ivf_topk

    q = vecs.where(F.col("vec_id").isin([3, 10]))
    exact = cosine_topk_bruteforce(vecs, q, k=3).toPandas()
    approx = ivf_topk(vecs, q, k=3, n_cells=4, nprobe=2).toPandas()
    # the 0.9999-cosine twin of vec 3 must be found; overall recall>=50%
    assert 7 in set(approx[approx["query_id"] == 3]["vec_id"])
    hits = len(
        set(map(tuple, exact[["query_id", "vec_id"]].values))
        & set(map(tuple, approx[["query_id", "vec_id"]].values))
    )
    assert hits >= 3  # out of 6


def test_ivf_probe_plan_flat_at_many_cells(spark):
    """VERDICT r1 item 8: probe scoring must not unroll one expression
    per centroid — at n_cells=256 the plan must stay O(1)-sized and
    recall vs brute force must hold on the sf0.01 embeddings."""
    from diive_spark.operators.similarity import cosine_topk_bruteforce, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.limit(8)
    out = ivf_topk(emb, q, k=5, n_cells=256, nprobe=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # a 256-branch unrolled tree would put hundreds of literals per row
    # expression into the plan; the broadcast-join design stays small
    assert len(plan) < 200_000
    approx = out.toPandas()
    exact = cosine_topk_bruteforce(emb, q, k=5).toPandas()
    hits = len(
        set(map(tuple, exact[["query_id", "vec_id"]].values))
        & set(map(tuple, approx[["query_id", "vec_id"]].values))
    )
    assert hits / len(exact) >= 0.5


def _exact_jaccard_truth(threshold=0.7):
    """Independent ground truth: exact all-pairs word-3-gram Jaccard
    over the sf0.01 documents, computed in plain Python sets."""
    import itertools
    import re

    import duckdb

    rows = duckdb.sql(
        "SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    ).fetchall()

    def sh(t):
        w = re.split(r"\s+", t.strip().lower())
        return set(" ".join(w[i:i + 3]) for i in range(max(len(w) - 2, 1)))

    S = {d: sh(t) for d, t in rows}
    truth = set()
    for a, b in itertools.combinations(sorted(S), 2):
        u = S[a] | S[b]
        if u and len(S[a] & S[b]) / len(u) >= threshold:
            truth.add((a, b))
    return truth


def test_minhash_lsh_recall_precision_vs_exact(spark):
    """VERDICT r1 item 5: quantitative oracle for the MinHash-LSH stack.
    Candidates verified by exact n-gram Jaccard must EQUAL the exact
    all-pairs truth restricted to candidates (precision 1.0), and LSH
    recall at J>=0.7 with 16x4 banding must be >= 0.8 (theory: 0.988)."""
    from diive_spark.operators.dedup import (
        minhash_lsh_pairs, minhash_signatures, ngram_jaccard,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    truth = _exact_jaccard_truth(0.7)
    assert len(truth) >= 10  # the fixture actually contains near-dups
    sigs = minhash_signatures(docs, k=64)
    cand = minhash_lsh_pairs(sigs, bands=16, est_threshold=0.0)
    verified = ngram_jaccard(docs, cand.select("id_a", "id_b")).where(
        "jaccard >= 0.7"
    )
    got = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert got <= truth                      # precision 1.0 after verify
    recall = len(got & truth) / len(truth)
    assert recall >= 0.8, recall


def test_simhash_banding_exact_recall(spark):
    """SimHash 4x16-bit chunk banding must find EVERY pair with
    hamming <= 3 (pigeonhole guarantee) — verified against numpy
    all-pairs hamming over the produced fingerprints."""
    from diive_spark.operators.dedup import simhash, simhash_pairs

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    fp = simhash(docs).toPandas()
    vals = dict(zip(fp["doc_id"], fp["simhash"].astype("uint64")))
    ids = sorted(vals)
    truth = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(int(vals[a]) ^ int(vals[b])).count("1") <= 3:
                truth.add((a, b))
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(
            simhash(docs), max_hamming=3
        ).collect()
    }
    assert got == truth                      # recall AND precision exact
    assert len(truth) >= 1


def test_simhash_hot_bucket_guard(spark):
    """Pathological corpus: 300 fingerprints all sharing 16-bit chunk 0
    (a templated-page hot bucket) but random elsewhere.  The max_bucket
    guard must sub-split the hot bucket so no band bucket approaches
    the unguarded 300, while hd<=3 recall stays EXACT (pigeonhole on
    the 4x12-bit sub-chunks of the remaining 48 bits)."""
    from diive_spark.operators.dedup import _simhash_bands, simhash_pairs

    rng = np.random.RandomState(7)
    fps = []
    for i in range(300):
        rem = int(rng.randint(0, 1 << 31)) | (int(rng.randint(0, 1 << 17)) << 31)
        fps.append((rem << 16) | 0xABCD)            # chunk0 shared by ALL
    # plant hd<=3 pairs: doc 300+j = doc j with <=3 flipped high bits
    for j in range(5):
        flipped = fps[j] ^ (0b101 << (20 + j))      # 2 bits outside chunk0
        fps.append(flipped)

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    df = spark.createDataFrame(
        [(i, signed(v)) for i, v in enumerate(fps)], "doc_id long, simhash long"
    )
    truth = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            if bin(fps[i] ^ fps[j]).count("1") <= 3:
                truth.add((i, j))
    assert len(truth) >= 5

    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(df, max_hamming=3, max_bucket=20).collect()
    }
    assert got == truth                       # guard keeps recall EXACT

    # and the band table is genuinely de-hotted: the unguarded layout
    # has a 305-doc bucket; post-guard every bucket is tiny
    bands = _simhash_bands(df, max_bucket=20)
    sizes = (
        bands.groupBy("chunk_idx", "chunk", "sub_idx", "sub_chunk")
        .count().agg(F.max("count")).collect()[0][0]
    )
    assert sizes <= 20, sizes
    # unguarded: one bucket holds every doc
    raw = _simhash_bands(df, max_bucket=None)
    raw_max = (
        raw.groupBy("chunk_idx", "chunk", "sub_idx", "sub_chunk")
        .count().agg(F.max("count")).collect()[0][0]
    )
    assert raw_max == len(fps)


def test_minhash_hot_bucket_guard(spark):
    """Boilerplate cluster: 300 identical docs land whole in every one
    of their 16 (band_idx, band_hash) buckets.  Unguarded, the LSH
    self-join emits 300*299/2 = 44850 pairs from the cluster; with
    max_bucket the cluster is star-linked to its min id, so exactly
    299 cluster pairs survive.  Canonical ids must be identical to the
    unguarded path (single- AND multi-hop), and the planted non-cluster
    near-dup pair must still be found."""
    rng = np.random.default_rng(21)
    boiler = " ".join(rng.choice(WORDS, size=40))
    rows = [(i, boiler) for i in range(300)]           # hot cluster
    base = " ".join(rng.choice(WORDS, size=40))
    w = base.split(); w[7] = "zulu"
    rows += [(1000, base), (1001, " ".join(w))]        # cold near-dup pair
    for i in range(10):                                # cold singletons
        rows.append((2000 + i, " ".join(rng.choice(WORDS, size=40))))
    docs = spark.createDataFrame(rows, "doc_id long, text string").cache()

    sigs = minhash_signatures(docs, k=64).localCheckpoint(eager=True)
    guarded = minhash_lsh_pairs(
        sigs, bands=16, est_threshold=0.5, max_bucket=50
    ).toPandas()
    cluster = guarded[(guarded["id_a"] < 300) & (guarded["id_b"] < 300)]
    assert len(cluster) == 299                          # star, not all-pairs
    assert set(cluster["id_a"]) == {0}                  # hub is bucket-min
    assert (cluster["est_jaccard"] == 1.0).all()
    found = set(map(tuple, guarded[["id_a", "id_b"]].values))
    assert (1000, 1001) in found                        # cold path untouched

    # canonical ids identical to the unguarded path
    for multi_hop in (False, True):
        g = minhash_dedup(docs, est_threshold=0.5, max_bucket=50,
                          multi_hop=multi_hop)
        u = minhash_dedup(docs, est_threshold=0.5, max_bucket=None,
                          multi_hop=multi_hop)
        gm = {r["doc_id"]: r["canonical_id"] for r in g.collect()}
        um = {r["doc_id"]: r["canonical_id"] for r in u.collect()}
        assert gm == um
        assert gm[299] == 0 and gm[1001] == 1000 and gm[2003] == 2003


def test_lsh_multiprobe_improves_recall(spark):
    """Multi-probe LSH: probing the flipped lowest-margin bits must
    find at least as many true neighbors as single-bucket probing, and
    candidate sets stay bucket-bounded (no cross product)."""
    from diive_spark.operators.similarity import (
        cosine_topk_bruteforce, cosine_topk_lsh,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.limit(10)
    exact = cosine_topk_bruteforce(emb, q, k=5).toPandas()
    truth = set(map(tuple, exact[["query_id", "vec_id"]].values))

    def recall(n_probe_bits):
        got = cosine_topk_lsh(
            emb, q, dim=64, k=5, n_planes=6, n_probe_bits=n_probe_bits
        ).toPandas()
        found = set(map(tuple, got[["query_id", "vec_id"]].values))
        return len(found & truth) / len(truth)

    r0, r3 = recall(0), recall(3)
    # random gaussian vectors have weak neighbors; what matters is that
    # probing strictly widens the candidate set and finds more of them
    assert r3 > r0
    assert r3 >= 0.06


def test_connected_components_random_vs_union_find(spark):
    """Randomized CC vs a pure-python union-find oracle (50 nodes,
    3 seeded graphs incl. long chains that need many propagation
    rounds)."""
    import random

    from diive_spark.operators.dedup import connected_components

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        nodes = list(range(50))
        edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(40)]
        edges += [(i, i + 1) for i in range(20, 35)]        # 15-hop chain
        edges = [(a, b) for a, b in edges if a != b]

        parent = {}
        def find(u):
            parent.setdefault(u, u)
            while parent[u] != u:
                parent[u] = parent[parent[u]]
                u = parent[u]
            return u
        def union(u, v):
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        for a, b in edges:
            union(a, b)
        expected = {u: find(u) for u in parent}

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r["node"]: r["component"]
               for r in connected_components(df, max_iter=60).collect()}
        assert got == expected, f"seed {seed}"


def test_top_ngrams_hand_values_and_plan(spark):
    """Hand-checked counts/doc-freq and the scale gate: the big sort is
    TakeOrdered, not a full-table single-partition window."""
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x y")], "doc_id long, text string"
    )
    from diive_spark.operators.textstats import top_ngrams

    out = top_ngrams(df, n=2, k=3).toPandas().set_index("ngram")
    assert out.loc["a b", "n_occurrences"] == 3    # 2 in doc1 + 1 in doc2
    assert out.loc["a b", "n_docs"] == 2
    assert out.loc["a b", "rank"] == 1
    assert out.loc["b a", "n_occurrences"] == 1
    plan = top_ngrams(df, n=2, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_minhash_index_incremental_dedup(spark, tmp_path, docs):
    """Cross-batch dedup against the stored band index: batch 2's
    near-dup of a batch-1 doc is dropped WITHOUT re-reading batch-1
    text; in-batch dups also dropped; survivors extend the index so a
    third batch catches dups of batch-2 content."""
    from diive_spark.operators.dedup import MinHashIndex

    idx = MinHashIndex(spark, str(tmp_path / "mh_idx"))
    batch1 = docs.where(F.col("doc_id") < 40)      # originals only
    idx.add(batch1)

    b1 = {r["doc_id"]: r["text"] for r in batch1.collect()}
    w = b1[4].split(); w[2] = "zulu"               # near-dup of doc 4
    batch2 = spark.createDataFrame(
        [(200, b1[0]),                             # exact dup of doc 0
         (201, " ".join(w)),                       # near-dup of doc 4
         (202, "totally fresh words appear exactly once here today"),
         (203, "totally fresh words appear exactly once here today")],
        "doc_id long, text string",
    )
    out = idx.dedup_batch(batch2, est_threshold=0.6)
    kept = {r["doc_id"]: r["kept"] for r in out.collect()}
    assert kept[200] is False                      # caught via index
    assert kept[201] is False                      # near-dup via index
    assert kept[202] is True
    assert kept[203] is False                      # in-batch dup (higher id)

    # a RE-SUBMITTED id (same doc_id, same text — an overlapping batch
    # or re-crawl) is the strongest duplicate and must be dropped too
    resub = spark.createDataFrame([(4, b1[4])], "doc_id long, text string")
    out_r = idx.dedup_batch(resub, est_threshold=0.6, add_survivors=False)
    assert out_r.collect()[0]["kept"] is False

    # survivors were appended: a batch-3 dup of 202 is now caught
    batch3 = spark.createDataFrame(
        [(300, "totally fresh words appear exactly once here today")],
        "doc_id long, text string",
    )
    out3 = idx.dedup_batch(batch3, est_threshold=0.6, add_survivors=False)
    assert out3.collect()[0]["kept"] is False


def test_minhash_index_compact_preserves_answers(spark, tmp_path, docs):
    """A 10-batch index answers identically after compact(), and the
    band-table file count drops to ~1 per band partition (per-batch
    appends otherwise accumulate small files forever)."""
    import glob

    from diive_spark.operators.dedup import MinHashIndex

    root = str(tmp_path / "mh_idx_c")
    idx = MinHashIndex(spark, root)
    all_rows = docs.where(F.col("doc_id") < 50).collect()
    n_batches = 10
    per = max(1, len(all_rows) // n_batches)
    chunks = [all_rows[i * per:(i + 1) * per] for i in range(n_batches)]
    chunks = [c for c in chunks if c]
    for chunk in chunks:                           # one add per batch
        idx.add(spark.createDataFrame(chunk, docs.schema))
    n_indexed = sum(len(c) for c in chunks)

    probe = spark.createDataFrame(
        [(900, all_rows[3]["text"]), (901, "never seen words only")],
        "doc_id long, text string",
    )
    before = sorted(
        (r["new_id"], r["index_id"])
        for r in idx.pairs_against(probe, est_threshold=0.6).collect()
    )
    files_before = len(glob.glob(f"{root}/bands.parquet/*/part-*"))

    n = idx.compact()
    assert n == n_indexed * 16                     # 16 band rows per doc

    after = sorted(
        (r["new_id"], r["index_id"])
        for r in idx.pairs_against(probe, est_threshold=0.6).collect()
    )
    files_after = len(glob.glob(f"{root}/bands.parquet/*/part-*"))
    assert after == before and len(before) >= 1    # identical answers
    assert files_after < files_before              # genuinely compacted
    assert files_after <= 16                       # ~1 file per band


def test_unigram_logprob_orders_fluent_above_gibberish(spark):
    """A doc of common corpus words must out-score a doc of hapax
    gibberish under the corpus's own unigram model."""
    from diive_spark.operators.textstats import unigram_logprob_score

    common = "the cat sat on the mat " * 5
    rows = [(i, common) for i in range(8)]
    rows.append((100, "zqxj vbnk wpfh grlt msdc"))     # all hapax
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["unigram_logprob"]
           for r in unigram_logprob_score(df).collect()}
    assert got[0] > got[100]
    assert all(v < 0 for v in got.values())


def test_quality_classifier_recovers_fluency_signal(spark):
    """Weak-label LR quality filter: 0.8+ holdout AUC against its own
    weak labels, and the scored probabilities must order the held-out
    docs by the fluency proxy (top-prob docs more fluent than
    bottom-prob docs) — the in-distribution recovery check; a planted
    out-of-distribution doc pair would only measure transfer to text
    unlike anything in the training corpus."""
    import pyspark.sql.functions as F

    from diive_spark.operators.quality_model import (
        score_quality,
        train_quality_classifier,
    )
    from diive_spark.operators.scrub import hash_split
    from diive_spark.operators.textstats import unigram_logprob_score

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    model, auc = train_quality_classifier(docs)
    assert auc >= 0.8, auc

    holdout = hash_split(docs, {"fit": 0.8, "holdout": 0.2},
                         key_col="doc_id", seed=11)
    holdout = holdout.where(F.col("split") == "holdout").drop("split")
    scored = unigram_logprob_score(score_quality(model, holdout))
    pdf = scored.select("quality_prob", "unigram_logprob").toPandas()
    pdf = pdf.sort_values("quality_prob")
    k = max(len(pdf) // 10, 5)
    bottom = pdf.head(k)["unigram_logprob"].mean()
    top = pdf.tail(k)["unigram_logprob"].mean()
    assert top > bottom, (top, bottom)


def test_duplicate_token_spans_bruteforce(spark):
    """Span detection == brute-force python enumeration of k-windows."""
    from diive_spark.operators.dedup import duplicate_token_spans

    rng = np.random.default_rng(7)
    base = rng.integers(0, 50, size=40).tolist()
    rows = [
        (1, base),
        (2, rng.integers(0, 50, size=30).tolist() + base[5:17]),
        (3, rng.integers(0, 50, size=25).tolist()),
        (4, base[:12] + rng.integers(0, 50, size=20).tolist()),
        (5, [9] * 3),  # shorter than k
    ]
    k = 8
    # brute force: span -> list of (doc, pos)
    occ: dict[tuple, list] = {}
    for doc, toks in rows:
        for p in range(len(toks) - k + 1):
            occ.setdefault(tuple(toks[p : p + k]), []).append((doc, p))
    want = {
        " ".join(map(str, s)): (
            len({d for d, _ in o}),
            len(o),
            min(o)[0],
            min(o)[1],
        )
        for s, o in occ.items()
        if len({d for d, _ in o}) >= 2
    }
    assert want, "fixture must contain cross-doc duplicate spans"

    df = spark.createDataFrame(
        [(d, [int(x) for x in t]) for d, t in rows],
        "doc_id int, tokens array<int>",
    )
    got = {
        r.span_key: (r.n_docs, r.n_occ, r.first_doc, r.first_pos)
        for r in duplicate_token_spans(df, k=k, emit_span=True).collect()
    }
    assert got == want


def test_mask_duplicate_spans_semantics(spark):
    """Canonical occurrence survives; every other occurrence's tokens
    are cut; non-duplicated docs pass through untouched."""
    from diive_spark.operators.dedup import mask_duplicate_spans

    rows = [
        (1, list(range(1, 11))),          # canonical 1..8 at pos 0
        (2, [99, 98] + list(range(1, 9))),  # loses pos 2..9
        (3, [55, 56, 57]),                 # too short, untouched
        (4, list(range(1, 9))),            # exactly the span, emptied
    ]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<int>")
    out = {r.doc_id: r.tokens_dedup
           for r in mask_duplicate_spans(df, k=8).collect()}
    assert out[1] == list(range(1, 11))
    assert out[2] == [99, 98]
    assert out[3] == [55, 56, 57]
    assert out[4] == []


def test_token_span_hash_vs_exact_grouping(spark):
    """Hash-keyed grouping (the scale path) produces the same duplicate
    groups as span-keyed grouping on a real corpus slice."""
    from diive_spark.operators.dedup import duplicate_token_spans

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    toks = docs.withColumn(
        "tokens",
        F.expr(
            "transform(filter(split(text, ' '), w -> w <> ''), "
            "w -> CAST(ascii(w) * 256 + length(w) % 256 AS INT))"
        ),
    ).select("doc_id", "tokens")
    hashed = duplicate_token_spans(toks, k=8).select(
        "span_hash", "n_docs", "n_occ", "first_doc", "first_pos"
    )
    exact = duplicate_token_spans(toks, k=8, emit_span=True).select(
        "span_hash", "n_docs", "n_occ", "first_doc", "first_pos"
    )
    a = sorted(map(tuple, hashed.collect()))
    b = sorted(map(tuple, exact.collect()))
    assert a == b and len(a) > 0


def test_semantic_dedup_sign_mode_matches_numpy(spark):
    """Sign-bucket semantic dedup == numpy brute force per bucket."""
    from diive_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    out = semantic_dedup(emb, threshold=0.42, bucket_bits=4, mode="sign")
    got = {r.vec_id: (r.bucket, bool(r.is_semdup)) for r in out.collect()}

    pdf = emb.toPandas().sort_values("vec_id")
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in pdf.itertuples()}
    bucket = {
        vid: sum((1 << i) for i in range(4) if v[i] >= 0)
        for vid, v in vecs.items()
    }
    want = {}
    for vid, v in vecs.items():
        nv = np.linalg.norm(v)
        dup = False
        for pid, p in vecs.items():
            if pid >= vid or bucket[pid] != bucket[vid]:
                continue
            np_ = np.linalg.norm(p)
            if nv > 0 and np_ > 0 and float(v @ p) / (nv * np_) >= 0.42:
                dup = True
                break
        want[vid] = (bucket[vid], dup)
    assert got == want
    assert sum(d for _, d in got.values()) > 0, "fixture must contain semdups"


def test_semantic_dedup_lsh_mode_flags_planted_dup(spark, vecs):
    """LSH mode: a planted near-identical vector is flagged, its
    lower-id original kept; greedy keep-lowest-id leaves one
    representative per duplicate group."""
    from diive_spark.operators.similarity import semantic_dedup

    dim = len(vecs.select("embedding").first()[0])
    out = semantic_dedup(vecs, threshold=0.98, bucket_bits=6,
                         mode="lsh", dim=dim)
    rows = {r.vec_id: bool(r.is_semdup) for r in out.collect()}
    pdf = vecs.toPandas()
    m = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
         for r in pdf.itertuples()}
    planted = [
        (a, b) for a in m for b in m if a < b
        and float(m[a] @ m[b]) / (np.linalg.norm(m[a]) * np.linalg.norm(m[b]))
        >= 0.995
    ]
    assert planted, "fixture must contain a >=0.995 near-dup pair"
    for a, b in planted:
        assert rows[b], f"near-dup {b} of {a} not flagged"
        # the group's lowest id must survive
    lowest = {min(a for a, _ in planted)}
    for a in lowest:
        if not any(a == hi for _, hi in planted):
            assert not rows[a]


def test_multimodal_poison_payload_fails_closed(spark):
    """A payload whose header parses but whose body is malformed raises
    a NON-CodecError (np.frombuffer ValueError) inside the codec; the
    decode seam must mark the row decode_ok=False, never abort the
    task (the 'a poison payload cannot kill the job' contract)."""
    from diive_spark.functions.codecs import CodecError, decode_wav, encode_wav
    from diive_spark.operators.multimodal import extract_features, resize_images

    good = encode_wav(np.zeros(100, dtype=np.float32), rate=8000)
    poison_wav = good[:-1]  # data chunk no longer a multiple of 2 bytes
    try:
        decode_wav(poison_wav)
        poisonous = False
    except CodecError:
        poisonous = False  # seam already covered it; test is vacuous
    except Exception:
        poisonous = True   # the hazard this test exists for
    assert poisonous, "expected a non-CodecError decode failure"

    media = spark.createDataFrame(
        [("m1", "audio", bytearray(poison_wav)),
         ("m2", "audio", bytearray(good)),
         ("m3", "image", bytearray(b"P5\n999999999 999999999\n255\n" + b"x"))],
        "media_id string, media_type string, payload binary",
    )
    feats = {r["media_id"]: r["decode_ok"]
             for r in extract_features(media, feature_dim=4).collect()}
    assert feats == {"m1": False, "m2": True, "m3": False}
    rs = {r["media_id"]: r["decode_ok"] for r in resize_images(media).collect()}
    assert rs["m3"] is False  # huge-dims image: fails closed, no abort


def test_pnm_comment_terminates_number():
    """Netpbm: a '#' comment counts as whitespace, so it terminates an
    in-progress header number — 'P5\\n2# c\\n2\\n255\\n' is a legal 2x2
    PGM (previously the 2s merged into width=22 and parsing failed)."""
    from diive_spark.functions.codecs import decode_pnm

    payload = b"P5\n2# comment\n2\n255\n" + bytes([7, 8, 9, 10])
    assert decode_pnm(payload).tolist() == [[7, 8], [9, 10]]
    # comment directly after the LAST header token: its newline is the
    # single post-maxval whitespace, raster starts right after it
    payload2 = b"P5\n2 2\n255# c\n" + bytes([1, 2, 3, 4])
    assert decode_pnm(payload2).tolist() == [[1, 2], [3, 4]]


def test_minhash_index_compact_crash_recovery(spark, tmp_path, docs):
    """Driver death between compact()'s two renames leaves only the
    bands_old backup; exists() must restore it instead of reporting an
    empty index (which would silently reseed and drop all cross-batch
    state)."""
    import os

    from diive_spark.operators.dedup import MinHashIndex

    root = str(tmp_path / "mh_crash")
    idx = MinHashIndex(spark, root)
    idx.add(docs.where(F.col("doc_id") < 20))
    n_before = idx.stored().count()

    # simulate the crash window: dst renamed to bak, new table never
    # landed
    os.rename(f"{root}/bands.parquet", f"{root}/bands_old.parquet")
    assert idx.exists() is True                     # recovery path
    assert not os.path.exists(f"{root}/bands_old.parquet")
    assert idx.stored().count() == n_before         # nothing lost


def test_corpus_pipeline_does_not_mutate_index(spark, tmp_path, docs):
    """corpus_pipeline only READS the cross-batch index: building and
    even executing the plan appends nothing (the caller indexes the
    written output post-write) and never bootstraps an absent index."""
    from diive_spark.operators.corpus import corpus_pipeline
    from diive_spark.operators.dedup import MinHashIndex

    # absent index: plan construction + execution must not create it
    idx = MinHashIndex(spark, str(tmp_path / "mh_ro"))
    out = corpus_pipeline(docs, est_threshold=0.6, minhash_index=idx)
    out.count()
    assert idx.exists() is False

    # populated index: row count unchanged by a full pipeline run
    idx.add(docs.where(F.col("doc_id") < 10))
    n0 = idx.stored().count()
    corpus_pipeline(docs, est_threshold=0.6, minhash_index=idx).count()
    assert idx.stored().count() == n0


def test_bpe_pair_counts(spark):
    """Hand-checked adjacent-pair counts + deterministic top-k; plan
    stays TakeOrdered (no global sort) with map-side partial counts."""
    from diive_spark.operators.textstats import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, [1, 2, 3, 2, 3]), (2, [2, 3]), (3, [9]), (4, [])],
        "doc_id long, tokens array<int>",
    )
    got = {(r["a"], r["b"]): r["n_pairs"]
           for r in bpe_pair_counts(df).collect()}
    assert got == {(1, 2): 1, (2, 3): 3, (3, 2): 1}

    top = bpe_pair_counts(df, top_k=2)
    assert [(r["a"], r["b"], r["n_pairs"]) for r in top.collect()] == [
        (2, 3, 3), (1, 2, 1)]
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan.lower() or "partial count" in plan.lower()


# ---------------------------------------------------------- heaps_law
def _heaps_np(docs):
    """Definitional twin: docs = [(doc_id, text)] sorted by doc_id."""
    import math

    seen = set()
    N = V = 0
    xs, ys = [], []
    for _, text in sorted(docs):
        words = text.strip().lower().split()
        N += len(words)
        for w in words:
            if w not in seen:
                seen.add(w)
                V += 1
        xs.append(math.log(N))
        ys.append(math.log(V))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    den = n * sxx - sx * sx
    if n < 3 or abs(den) <= 1e-12:
        return N, V, None, None
    beta = (n * sxy - sx * sy) / den
    return N, V, beta, (sy - beta * sx) / n


def test_heaps_law_matches_python_twin(spark):
    import numpy as np

    from diive_spark.operators.textstats import heaps_law

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r["source"]: r for r in heaps_law(docs).collect()}
    pdf = docs.toPandas()
    assert len(got) >= 2
    for src, g in pdf.groupby("source"):
        N, V, beta, lnk = _heaps_np(list(zip(g["doc_id"], g["text"])))
        r = got[src]
        assert r["tokens"] == N and r["vocab"] == V
        np.testing.assert_allclose(r["heaps_beta"], beta, rtol=1e-9)
        np.testing.assert_allclose(r["heaps_lnk"], lnk, rtol=1e-9)
        # the synthetic docs table is a ~31-word closed template
        # vocabulary: Heaps correctly reads it as beta ~ 0 — the
        # template-detection regime the operator exists to flag
        assert -0.01 < r["heaps_beta"] < 0.2


def test_heaps_law_separates_vocab_regimes(spark):
    from diive_spark.operators.textstats import heaps_law

    closed = [("tmpl", i, "alpha beta gamma delta") for i in range(30)]
    open_v = [("ids", i, " ".join(f"tok{i}_{j}" for j in range(10)))
              for i in range(30)]
    df = spark.createDataFrame(
        closed + open_v, "source string, doc_id long, text string"
    )
    out = {r["source"]: r for r in heaps_law(df).collect()}
    assert out["tmpl"]["heaps_beta"] < 0.1   # closed vocabulary
    assert out["ids"]["heaps_beta"] > 0.9    # unbounded id-like vocab


# ----------------------------------------------------- textrank_keywords
def _textrank_np(docs, iters=10, dn=17, dd=20, min_cooc=2,
                 scale=1_000_000_000):
    from collections import defaultdict

    big = defaultdict(int)
    for text in docs:
        ws = text.strip().lower().split()
        for a, b in zip(ws, ws[1:]):
            if a != b:
                big[(min(a, b), max(a, b))] += 1
    edges = defaultdict(set)
    for (a, b), c in big.items():
        if c >= min_cooc:
            edges[a].add(b)
            edges[b].add(a)
    nodes = sorted(edges)
    n = len(nodes)
    if n == 0:
        return {}
    base = (scale - scale * dn // dd) // n
    pr = {v: scale // n for v in nodes}
    for _ in range(iters):
        inc = defaultdict(int)
        for u in nodes:
            share = pr[u] // len(edges[u])
            for v in edges[u]:
                inc[v] += share
        pr = {v: base + (dn * inc[v]) // dd for v in nodes}
    return {v: (pr[v], len(edges[v])) for v in nodes}


def test_textrank_matches_integer_twin(spark):
    from diive_spark.operators.textstats import textrank_keywords

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r["word"]: (r["pr"], r["outdeg"])
           for r in textrank_keywords(docs).collect()}
    exp = _textrank_np([r["text"] for r in docs.select("text").collect()])
    assert got == exp  # exact long equality, every word
    assert len(got) >= 10


def test_textrank_hub_ranks_first(spark):
    from diive_spark.operators.textstats import textrank_keywords

    # star graph: 'hub' adjacent to 8 spokes (each twice -> min_cooc);
    # spokes never touch each other
    docs = []
    for i in range(8):
        docs += [f"hub spoke{i}", f"spoke{i} hub"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = sorted(
        textrank_keywords(df, min_cooc=2).collect(),
        key=lambda r: -r["pr"],
    )
    assert out[0]["word"] == "hub" and out[0]["outdeg"] == 8
    assert out[0]["pr"] > 3 * out[1]["pr"]
    import pytest

    with pytest.raises(ValueError):
        textrank_keywords(df, iters=0)
    with pytest.raises(ValueError):
        textrank_keywords(df, damping_num=20, damping_den=20)
