"""Deduplication operators for large-scale training-data pipelines.

These are target-side additions (not in the reference, which has only
index-level dedup — diive/core/times/times.py:802-819): the operations a
100 TB pre-training corpus needs, built Spark-first:

- exact dedup: hash-groupBy on content digest (md5 for DuckDB-oracle
  parity), keep-first by id.
- MinHash + LSH near-dup: shingle -> 64-bit hash -> k permuted minhashes
  (one groupBy, k aggregate expressions — no UDFs) -> band buckets ->
  candidate pairs via self-join on (band, band_hash) -> signature-level
  jaccard estimate filter.
- SimHash: per-word hash bit votes -> 64-bit fingerprint; near-dup pairs
  via 4x16-bit chunk banding (pigeonhole guarantees recall for hamming
  distance <= 3).
- exact n-gram Jaccard for candidate verification.

Scale notes: every stage is shuffle-bounded by design — signatures are
one groupBy over exploded shingles; candidate generation joins on band
buckets (tiny fraction of the cross product); verification only touches
candidate pairs.  ANSI-safe arithmetic throughout (minhash permutations
stay under 2^62).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..plans.barrier import no_pushdown_filter

_MERSENNE = (1 << 31) - 1  # permutation modulus (fits ANSI long math)


def _rand_coeffs(k: int, seed: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(k)]


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact content dedup: md5 digest groupBy, keep the lowest id
    (deterministic keep-first).  Adds ``dup_count`` per kept row."""
    digest = F.md5(F.col(text_col)).alias("_digest")
    w = Window.partitionBy("_digest").orderBy(id_col)
    return (
        df.withColumn("_digest", digest)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("dup_count", F.count(F.lit(1)).over(Window.partitionBy("_digest")))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_digest")
    )


def word_shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", out_col: str = "shingles"
) -> DataFrame:
    """Word n-gram shingles, JVM-side (no UDF): lowercase, split on
    whitespace, sliding concat of n words."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tmp = df.withColumn("_w", words)
    ngrams = F.expr(
        f"transform(sequence(0, greatest(size(_w) - {n}, 0)), "
        f"i -> concat_ws(' ', slice(_w, i + 1, {n})))"
    )
    return tmp.withColumn(out_col, F.array_distinct(ngrams)).drop("_w")


def minhash_signatures(
    df: DataFrame,
    k: int = 64,
    n_shingle: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    impl: str = "arrow",
) -> DataFrame:
    """k-permutation MinHash signature per doc, computed entirely
    row-local (no explode, no groupBy, no shuffle): hash each shingle
    once JVM-side (xxhash64 mod p), then per permutation i the min of
    (a_i*h + b_i) mod p.  Scales embarrassingly — each task only
    touches its own rows.

    ``impl='arrow'`` (default) runs the k-permutation min in a
    vectorized Arrow batch kernel: all shingle hashes of a batch are
    concatenated and each permutation is one numpy multiply-mod +
    ``minimum.reduceat`` over row offsets — measured ~4x faster than
    the 64-expression JVM battery (``impl='expr'``), which remains as
    the dependency-free twin (identical output, see test)."""
    coeffs = _rand_coeffs(k, seed)
    sh = word_shingles(df, n=n_shingle, text_col=text_col)
    hashed = sh.withColumn(
        "_h", F.transform("shingles", lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
    )
    if impl == "expr":
        sig_cols = [
            F.array_min(
                F.transform("_h", lambda x: F.pmod(x * a + b, F.lit(_MERSENNE)))
            ).alias(f"mh{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
        return hashed.select(id_col, *sig_cols)

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    a_arr = np.array([a for a, _ in coeffs], dtype=np.int64)
    b_arr = np.array([b for _, b in coeffs], dtype=np.int64)

    def _sig_kernel(hs):
        lens = hs.map(len).to_numpy()
        out = np.full((len(hs), len(a_arr)), _MERSENNE, dtype=np.int64)
        nz = lens > 0
        if nz.any():
            flat = np.concatenate([np.asarray(h, dtype=np.int64) for h in hs[nz]])
            offsets = np.zeros(int(nz.sum()), dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=offsets[1:])
            # products stay < 2^62 (h, a < 2^31) — no overflow in int64
            mins = np.empty((int(nz.sum()), len(a_arr)), dtype=np.int64)
            for i in range(len(a_arr)):
                vals = (flat * a_arr[i] + b_arr[i]) % _MERSENNE
                mins[:, i] = np.minimum.reduceat(vals, offsets)
            out[nz] = mins
        return pd.Series(list(out))

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf's type inference rejects — attach real ones instead
    _sig_kernel.__annotations__ = {"hs": pd.Series, "return": pd.Series}
    _sig = pandas_udf(_sig_kernel, "array<long>")

    packed = hashed.select(id_col, _sig(F.col("_h")).alias("_sig"))
    return packed.select(
        id_col, *[F.col("_sig")[i].alias(f"mh{i}") for i in range(k)]
    )


def minhash_lsh_pairs(
    sig_df: DataFrame,
    bands: int = 16,
    id_col: str = "doc_id",
    est_threshold: float = 0.7,
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding + signature jaccard
    estimate.  ``k = bands * rows_per_band`` minhash columns required.
    Returns (id_a, id_b, est_jaccard) with id_a < id_b.

    ``max_bucket`` guards against hot-bucket quadratic blowup (the
    minhash analog of simhash_pairs' guard): a boilerplate cluster of
    100k near-identical docs lands whole in the same (band_idx,
    band_hash) buckets and the all-pairs self-join would emit ~5e9
    candidate pairs from that one cluster.  Buckets larger than
    ``max_bucket`` are instead STAR-LINKED — each member is paired
    with the bucket's minimum id only, O(n) pairs per bucket instead
    of O(n^2).  Star pairs flow through the same signature-estimate
    filter as everything else.  Connected components (and therefore
    canonical ids under both single- and multi-hop dedup) are
    preserved whenever the hot bucket is a similarity clique — the
    realistic cause of hotness, since every member shares the band's
    r minhash values exactly, which is what boilerplate duplication
    produces.  For a pathological mixed hot bucket, a true pair whose
    star edges both fail the estimate filter can still be found via
    any of its other ``bands - 1`` buckets that are not hot — the
    standard per-band LSH probability, minus one band.
    ``max_bucket=None`` disables the guard (exact all-pairs)."""
    mh_cols = [c for c in sig_df.columns if c.startswith("mh")]
    k = len(mh_cols)
    r = k // bands
    band_cols = [
        F.xxhash64(*[F.col(f"mh{b * r + i}") for i in range(r)]).alias(f"band{b}")
        for b in range(bands)
    ]
    sigs = sig_df.select(id_col, F.array(*mh_cols).alias("sig"))
    banded = sig_df.select(id_col, *band_cols)
    # join on narrow (id, band) rows only — the 64-element signature
    # arrays would otherwise be shuffled `bands` times per side; they
    # are re-attached to the (small) deduped pair set afterwards
    stacked = banded.select(
        id_col,
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias(
            "band_idx", "band_hash"
        ),
    )
    star = None
    if max_bucket is not None:
        # hot-bucket table is tiny by construction (few buckets can
        # exceed max_bucket) — broadcast, never shuffled onto stacked
        hot = (
            stacked.groupBy("band_idx", "band_hash")
            .agg(F.count(F.lit(1)).alias("_bn"), F.min(id_col).alias("_bmin"))
            .where(F.col("_bn") > max_bucket)
            .select("band_idx", "band_hash", "_bmin")
        )
        flagged = stacked.join(
            F.broadcast(hot), on=["band_idx", "band_hash"], how="left"
        )
        stacked = flagged.where(F.col("_bmin").isNull()).drop("_bmin")
        # bucket-min is strictly smaller than every other member, so
        # (id_a, id_b) ordering holds without a comparison
        star = (
            flagged.where(
                F.col("_bmin").isNotNull() & (F.col(id_col) != F.col("_bmin"))
            )
            .select(F.col("_bmin").alias("id_a"), F.col(id_col).alias("id_b"))
        )
    a, b = stacked.alias("a"), stacked.alias("b")
    raw = (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
    )
    if star is not None:
        raw = raw.unionByName(star)
    pairs = (
        raw.dropDuplicates(["id_a", "id_b"])
        .join(sigs.select(F.col(id_col).alias("id_a"),
                          F.col("sig").alias("sig_a")), on="id_a")
        .join(sigs.select(F.col(id_col).alias("id_b"),
                          F.col("sig").alias("sig_b")), on="id_b")
    )
    est = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / F.lit(float(len(mh_cols)))
    )
    # barrier, not plain where(): pushdown would inline the zip_with
    # signature compare into the Filter and evaluate it twice per
    # candidate pair (plans/barrier.py)
    return no_pushdown_filter(
        pairs.withColumn("est_jaccard", est),
        F.col("est_jaccard") >= est_threshold,
    ).select("id_a", "id_b", "est_jaccard")


def minhash_dedup(
    df: DataFrame,
    k: int = 64,
    bands: int = 16,
    n_shingle: int = 3,
    est_threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    multi_hop: bool = False,
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """End-to-end MinHash near-dedup: docs joined to their canonical id.
    ``multi_hop=False``: min id among direct LSH-confirmed neighbors
    (one groupBy, no iteration).  ``multi_hop=True``: true cluster
    canonical via connected_components fixpoint, so chains a~b~c all
    collapse to min(a,b,c) even when a and c are not LSH neighbors.
    ``max_bucket`` passes through to minhash_lsh_pairs' hot-bucket
    star-link guard (see its docstring)."""
    sigs = minhash_signatures(df, k=k, n_shingle=n_shingle,
                              text_col=text_col, id_col=id_col)
    # materialize once: the LSH self-join + signature re-attachment
    # would otherwise recompute the signature subtree 4x
    sigs = sigs.localCheckpoint(eager=True)
    pairs = minhash_lsh_pairs(sigs, bands=bands, id_col=id_col,
                              est_threshold=est_threshold,
                              max_bucket=max_bucket)
    if multi_hop:
        canon = connected_components(pairs).select(
            F.col("node"), F.col("component").alias("canonical")
        )
    else:
        edges = pairs.select(
            F.col("id_a").alias("node"), F.col("id_b").alias("peer")
        ).unionByName(
            pairs.select(F.col("id_b").alias("node"), F.col("id_a").alias("peer"))
        )
        canon = edges.groupBy("node").agg(
            F.least(F.min("peer"), F.first("node")).alias("canonical")
        )
    return df.join(
        canon, on=F.col(id_col) == F.col("node"), how="left"
    ).withColumn(
        "canonical_id", F.coalesce(F.col("canonical"), F.col(id_col))
    ).drop("node", "canonical")


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_bits: int = 64,
) -> DataFrame:
    """64-bit SimHash fingerprint: per-word 64-bit hash, each bit votes
    +1/-1, fingerprint bit = sign of the vote sum.  One explode + one
    groupBy with n_bits aggregate expressions — no UDFs."""
    words = df.select(
        id_col,
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("_w"),
    ).withColumn("_h", F.xxhash64("_w"))
    votes = [
        F.sum(
            (F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"v{i}")
        for i in range(n_bits)
    ]
    agg = words.groupBy(id_col).agg(*votes)
    fp = None
    for i in range(n_bits):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return agg.select(id_col, fp.alias("simhash"))


def _simhash_bands(
    sim_df: DataFrame, id_col: str = "doc_id", max_bucket: int | None = None
) -> DataFrame:
    """Banding-key table for the simhash self-join: one row per
    (doc, band key).  Base key = (chunk_idx, 16-bit chunk).  With
    ``max_bucket``, buckets whose frequency exceeds it are SUB-SPLIT
    instead of joined whole: each member's remaining 48 bits (the
    fingerprint minus the shared chunk) are cut into 4 x 12-bit
    sub-chunks and the key becomes (chunk_idx, chunk, sub_idx,
    sub_chunk).  Pigeonhole preserves exact hd<=3 recall — at most 3
    differing bits can touch at most 3 of the 4 sub-chunks, so a true
    pair still shares an identical sub-key — while a random hot bucket
    shrinks ~2^12-fold.  (Residual hot sub-buckets are near-identical
    cliques whose candidate pairs are overwhelmingly real matches, so
    their quadratic output is inherent in the answer, not join waste.)
    Cold buckets keep sub keys (-1, -1); hotness is a property of the
    bucket, so both sides of any candidate pair agree on the layout.
    """
    chunks = [
        F.shiftright(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias(f"c{i}")
        for i in range(4)
    ]
    t = sim_df.select(id_col, "simhash", *chunks)
    stacked = t.select(
        id_col, "simhash",
        F.posexplode(F.array(*[F.col(f"c{i}") for i in range(4)])).alias("chunk_idx", "chunk"),
    )
    if max_bucket is None:
        return stacked.select(
            id_col, "simhash", "chunk_idx", "chunk",
            F.lit(-1).alias("sub_idx"), F.lit(-1).cast("long").alias("sub_chunk"),
        )
    hot = (
        stacked.groupBy("chunk_idx", "chunk").count()
        .where(F.col("count") > max_bucket)
        .select("chunk_idx", "chunk", F.lit(True).alias("_hot"))
    )
    flagged = stacked.join(
        F.broadcast(hot), on=["chunk_idx", "chunk"], how="left"
    )
    cold = flagged.where(F.col("_hot").isNull()).select(
        id_col, "simhash", "chunk_idx", "chunk",
        F.lit(-1).alias("sub_idx"), F.lit(-1).cast("long").alias("sub_chunk"),
    )
    # remaining 48 bits with the shared 16-bit chunk excised:
    # low bits below the chunk | high bits above it shifted down.
    # SQL expr because the Python shiftleft/shiftrightunsigned wrappers
    # only take literal int shift counts; the JVM wraps shift counts
    # mod 64, so >>> (shift+16) is composed as >>> (shift+15) >>> 1 to
    # stay correct at chunk_idx=3.
    rem = F.expr(
        "(simhash & (shiftleft(CAST(1 AS BIGINT), chunk_idx * 16) - 1)) | "
        "shiftleft(shiftrightunsigned("
        "  shiftrightunsigned(simhash, chunk_idx * 16 + 15), 1), chunk_idx * 16)"
    )
    subs = F.array(*[
        F.shiftrightunsigned(rem, 12 * j).bitwiseAND(F.lit(0xFFF)).cast("long")
        for j in range(4)
    ])
    hot_rows = flagged.where(F.col("_hot").isNotNull()).select(
        id_col, "simhash", "chunk_idx", "chunk",
        F.posexplode(subs).alias("sub_idx", "sub_chunk"),
    )
    return cold.unionByName(hot_rows)


def simhash_pairs(
    sim_df: DataFrame, max_hamming: int = 3, id_col: str = "doc_id",
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via 4x16-bit
    chunk banding (pigeonhole: hd<=3 -> at least one identical chunk).

    ``max_bucket`` guards against hot-chunk quadratic blowup (the
    simhash analog of jaccard_pairs_exact's ``max_df``): at 10^9 docs a
    popular 16-bit chunk value holds ~15k docs and would emit ~10^8
    candidate pairs per such bucket.  Unlike max_df the guard is
    EXACT — hot buckets are sub-split on 12-bit sub-chunks of the
    remaining bits with hd<=3 recall preserved by pigeonhole (see
    _simhash_bands).  ``max_bucket=None`` disables the guard."""
    stacked = _simhash_bands(sim_df, id_col=id_col, max_bucket=max_bucket)
    a, b = stacked.alias("a"), stacked.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            on=[
                F.col("a.chunk_idx") == F.col("b.chunk_idx"),
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.sub_idx") == F.col("b.sub_idx"),
                F.col("a.sub_chunk") == F.col("b.sub_chunk"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: join shingle arrays onto
    the (small) pair table, JVM array intersection/union."""
    sh = word_shingles(df, n=n, text_col=text_col).select(
        F.col(id_col), F.col("shingles")
    )
    j = (
        pairs.join(sh.withColumnRenamed("shingles", "sh_a"),
                   on=F.col("id_a") == F.col(id_col)).drop(id_col)
        .join(sh.withColumnRenamed("shingles", "sh_b"),
              on=F.col("id_b") == F.col(id_col)).drop(id_col)
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.withColumn(
        "jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    ).drop("sh_a", "sh_b")


def jaccard_pairs_exact(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard >= threshold via an inverted
    index — no crossJoin, no LSH approximation.

    Shape: explode distinct shingles -> self-join on the shingle
    (candidate pairs can only share a shingle) -> groupBy pair counts
    the intersection -> |A|+|B|-inter gives the union.  Shuffle is
    bounded by the co-occurrence list sizes, not |docs|^2.

    ``max_df`` drops shingles appearing in more than that many docs
    before pairing (the d^2 blowup guard a 100 TB corpus needs; a
    shingle shared by d docs emits d^2/2 candidate rows).  With
    ``max_df=None`` the result is exact; with a cap it is exact for
    every pair that shares at least one sub-cap shingle (stopword-like
    shingles carry no dedup signal, so in practice recall is intact).
    """
    sh = word_shingles(df, n=n, text_col=text_col).select(
        F.col(id_col).alias("_id"), F.col("shingles")
    )
    sizes = sh.select("_id", F.size("shingles").alias("_sz"))
    inv = sh.select("_id", F.explode("shingles").alias("_s"))
    if max_df is not None:
        keep = inv.groupBy("_s").count().where(F.col("count") <= max_df).select("_s")
        inv = inv.join(keep, on="_s")
    a, b = inv.alias("a"), inv.alias("b")
    inter = (
        a.join(b, on=[F.col("a._s") == F.col("b._s"),
                      F.col("a._id") < F.col("b._id")])
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    out = (
        inter.join(sizes.select(F.col("_id").alias("id_a"),
                                F.col("_sz").alias("_sza")), on="id_a")
        .join(sizes.select(F.col("_id").alias("id_b"),
                           F.col("_sz").alias("_szb")), on="id_b")
        .withColumn(
            "jaccard",
            F.col("_inter") / (F.col("_sza") + F.col("_szb") - F.col("_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Distributed connected components over an undirected edge list:
    min-label propagation to fixpoint.  Returns (node, component) where
    component = min node id in the component; only nodes appearing in
    ``edges`` are returned (isolated docs are their own component by
    definition — callers coalesce).

    Each iteration is one join + one groupBy on narrow (node, label)
    rows, localCheckpoint'ed so lineage stays flat.  Convergence is
    detected by the monotone label-sum invariant (labels only ever
    decrease, so an unchanged sum IS the fixpoint) — one cheap aggregate
    action per round instead of a changed-row anti-join.  Rounds needed
    = graph diameter; near-dup graphs are short chains/cliques, so this
    terminates in a handful of rounds (GraphFrames' large-star would cut
    it to O(log d) — unnecessary here).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    sym = sym.dropDuplicates(["s", "d"]).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("s").alias("node"))
        .dropDuplicates(["node"])
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, on=sym.d == labels.node)
            .groupBy("s").agg(F.min("label").alias("_nl"))
        )
        labels = (
            labels.join(nbr_min, on=labels.node == nbr_min.s, how="left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("_nl", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # labels were still changing on the last round: the graph
        # diameter exceeds max_iter (long templated-page chains are
        # plausible at corpus scale) and clusters would silently split
        raise RuntimeError(
            f"connected_components did not reach a fixpoint within "
            f"max_iter={max_iter} rounds (labels still changing); raise "
            f"max_iter — rounds needed equals the near-dup graph diameter"
        )
    return labels.select("node", F.col("label").alias("component"))


class MinHashIndex:
    """Persistent MinHash band index for INCREMENTAL cross-batch
    dedup: new batches are checked against the accumulated corpus via
    its stored band table — the corpus TEXT is never re-read or
    re-shingled (the signature parquet is ~0.5 KB/doc regardless of
    document size).

    Storage layout (parquet, appended per batch): one row per
    (doc_id, band_idx, band_hash) plus the full signature array for
    the estimate filter.  Scale shape at query time: new-batch bands
    equi-join the stored band table on (band_idx, band_hash) — the
    same narrow bucket join as the in-batch LSH path, with the index
    side partitioned by band_idx for pruning.

    The incremental analog of TierStore's compose-don't-rescan rule
    (DESIGN_SCALE.md): dedup state composes across batches the way
    rollup partials compose across tiers.
    """

    def __init__(self, spark, root: str, k: int = 64, bands: int = 16,
                 n_shingle: int = 3, seed: int = 42):
        # no driver-local mkdir: ``root`` may be an HDFS/S3 URI on a
        # real cluster — parquet writes create the path through the
        # Hadoop FileSystem, and ``exists()`` probes the same way
        self.spark = spark
        self.root = root
        self.k, self.bands, self.n_shingle, self.seed = k, bands, n_shingle, seed

    def _banded(self, docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
        sigs = minhash_signatures(
            docs, k=self.k, n_shingle=self.n_shingle,
            text_col=text_col, id_col=id_col, seed=self.seed,
        )
        r = self.k // self.bands
        mh = [F.col(f"mh{i}") for i in range(self.k)]
        band_cols = F.array(*[
            F.xxhash64(*mh[b * r:(b + 1) * r]) for b in range(self.bands)
        ])
        return sigs.select(
            F.col(id_col).alias("doc_id"),
            F.array(*mh).alias("sig"),
            F.posexplode(band_cols).alias("band_idx", "band_hash"),
        )

    def _path(self) -> str:
        return f"{self.root}/bands.parquet"

    def exists(self) -> bool:
        """True if the band table already holds at least one batch.
        Probes through Hadoop's FileSystem API so HDFS/S3 URIs resolve
        on the cluster (a driver-local ``os.path.exists`` is always
        False there, silently turning cross-batch dedup into a no-op);
        falls back to a schema-inference read probe if the JVM gateway
        shape ever changes."""
        from ..session import fs_exists
        if fs_exists(self.spark, self._path()):
            return True
        # crash recovery: compact() swaps via rename(dst->bak),
        # rename(tmp->dst); a driver death between the two renames
        # leaves only the bak — restore it instead of reporting an
        # empty index (which would silently discard all cross-batch
        # dedup state on the next batch)
        bak = f"{self.root}/bands_old.parquet"
        if fs_exists(self.spark, bak):
            jvm = self.spark._jvm
            conf = self.spark._jsc.hadoopConfiguration()
            dst = jvm.org.apache.hadoop.fs.Path(self._path())
            fs = dst.getFileSystem(conf)
            if not fs.rename(jvm.org.apache.hadoop.fs.Path(bak), dst):
                raise IOError(f"failed to restore band table from {bak}")
            return True
        return False

    def add(self, docs: DataFrame, id_col="doc_id", text_col="text") -> int:
        """Append a batch's band rows; returns rows written."""
        banded = self._banded(docs, id_col, text_col)
        banded.write.mode("append").partitionBy("band_idx").parquet(self._path())
        return docs.count()

    def stored(self) -> DataFrame:
        return self.spark.read.parquet(self._path())

    def pairs_against(self, docs: DataFrame, est_threshold: float = 0.7,
                      id_col="doc_id", text_col="text") -> DataFrame:
        """(new_id, index_id, est_jaccard): new docs vs the INDEX only
        (in-batch pairs come from minhash_lsh_pairs on the new batch).

        Same-id matches ARE emitted: a re-submitted doc_id that is
        already indexed is the strongest possible duplicate (a re-crawl
        or an overlapping batch), and silently keeping it would put the
        same document into the corpus twice.  Callers that re-run a
        whole completed batch should gate on a completion marker
        instead (see scripts/run_corpus_job.py) — content dedup is not
        the place to implement retry idempotency."""
        new = self._banded(docs, id_col, text_col).localCheckpoint(eager=True)
        idx = self.stored()
        cand = (
            new.alias("n")
            .join(idx.alias("i"),
                  on=[F.col("n.band_idx") == F.col("i.band_idx"),
                      F.col("n.band_hash") == F.col("i.band_hash")])
            .select(F.col("n.doc_id").alias("new_id"),
                    F.col("i.doc_id").alias("index_id"),
                    F.col("n.sig").alias("sig_n"), F.col("i.sig").alias("sig_i"))
            .dropDuplicates(["new_id", "index_id"])
        )
        est = (
            F.aggregate(
                F.zip_with("sig_n", "sig_i", lambda x, y: (x == y).cast("int")),
                F.lit(0), lambda acc, x: acc + x,
            ) / F.lit(float(self.k))
        )
        return no_pushdown_filter(
            cand.withColumn("est_jaccard", est),
            F.col("est_jaccard") >= est_threshold,
        ).select("new_id", "index_id", "est_jaccard")

    def dedup_batch(self, docs: DataFrame, est_threshold: float = 0.7,
                    id_col="doc_id", text_col="text",
                    add_survivors: bool = True) -> DataFrame:
        """Mark each new doc as kept/dropped: dropped if it near-dups
        anything already indexed OR an earlier-id doc in its own batch.
        Survivors' signatures are appended to the index (so the next
        batch dedups against them) unless ``add_survivors=False``."""
        cross = self.pairs_against(docs, est_threshold, id_col, text_col)
        dup_vs_index = cross.select(F.col("new_id").alias(id_col)).distinct()
        sigs = minhash_signatures(
            docs, k=self.k, n_shingle=self.n_shingle,
            text_col=text_col, id_col=id_col, seed=self.seed,
        ).localCheckpoint(eager=True)
        within = minhash_lsh_pairs(
            sigs, bands=self.bands, id_col=id_col, est_threshold=est_threshold
        ).select(F.col("id_b").alias(id_col)).distinct()
        dropped = dup_vs_index.unionByName(within).distinct()
        out = docs.join(
            dropped.withColumn("_drop", F.lit(1)), on=id_col, how="left"
        ).withColumn("kept", F.col("_drop").isNull()).drop("_drop")
        if add_survivors:
            self.add(out.where("kept").select(id_col, text_col),
                     id_col=id_col, text_col=text_col)
        return out

    def compact(self, target_files_per_band: int = 1) -> int:
        """Rewrite the band table into ``target_files_per_band`` files
        per band_idx partition.  Each batch appends its own small files
        (one set per add/dedup_batch call), so after thousands of
        batches the equi-join in pairs_against pays per-file open cost
        and tiny-split scheduling overhead; compaction restores target
        file sizes while keeping the band_idx partitioning the join
        prunes on.  Write-then-swap via a sibling path + Hadoop rename
        so a crash mid-compact leaves the old table intact.  Returns
        the row count of the compacted table."""
        cur = self.stored()
        n = cur.count()
        tmp = f"{self.root}/bands_compact_tmp.parquet"
        (
            cur.repartition(target_files_per_band, "band_idx")
            .sortWithinPartitions("band_idx", "band_hash")
            .write.mode("overwrite").partitionBy("band_idx").parquet(tmp)
        )
        jvm = self.spark._jvm
        conf = self.spark._jsc.hadoopConfiguration()
        dst = jvm.org.apache.hadoop.fs.Path(self._path())
        src = jvm.org.apache.hadoop.fs.Path(tmp)
        fs = dst.getFileSystem(conf)
        bak = jvm.org.apache.hadoop.fs.Path(f"{self.root}/bands_old.parquet")
        if fs.exists(bak):
            fs.delete(bak, True)
        # Hadoop rename returns False instead of raising — check each
        # step; on a failed second rename restore the original so the
        # index is never left absent (exists() additionally recovers a
        # stranded bak if the driver dies between the two renames)
        if not fs.rename(dst, bak):
            raise IOError(f"compact: failed to stage {dst} -> {bak}")
        if not fs.rename(src, dst):
            fs.rename(bak, dst)
            raise IOError(f"compact: failed to swap {src} -> {dst}")
        fs.delete(bak, True)
        return n


# --------------------------------------------------------------- token spans
def token_span_occurrences(
    df: DataFrame,
    k: int = 8,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    emit_span: bool = False,
) -> DataFrame:
    """One row per k-token window: (id, pos, span_hash[, span_key]).

    The window hashes are computed ROW-LOCALLY (one ``transform`` over a
    position sequence, ``xxhash64`` on each slice) so the exploded
    relation that reaches the shuffle carries only (id, pos, long) —
    never the token arrays themselves.  ``emit_span=True`` additionally
    carries the span rendered as a space-joined string: collision-free
    grouping for verification/oracle runs (at corpus scale the 64-bit
    hash's collision odds are ~n^2/2^64; keep the default).
    """
    toks = F.col(tokens_col)
    eligible = df.where(F.size(toks) >= k)
    hashes = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.xxhash64(F.slice(toks, i + 1, k)),
    )
    cols = [F.col(id_col), F.posexplode(hashes).alias("pos", "span_hash")]
    out = eligible.select(*cols)
    if emit_span:
        spans = F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
        keyed = eligible.select(
            F.col(id_col), F.posexplode(spans).alias("pos", "span_key")
        )
        out = out.join(keyed, on=[id_col, "pos"])
    return out


def duplicate_token_spans(
    df: DataFrame,
    k: int = 8,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    min_docs: int = 2,
    max_occ: int | None = None,
    emit_span: bool = False,
) -> DataFrame:
    """Exact duplicate k-token span detection over a pre-tokenized
    corpus — the substring-level dedup of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"),
    re-expressed as explode + groupBy instead of a suffix array.

    A span counts as duplicated when it appears in >= ``min_docs``
    distinct documents.  Returns one row per duplicated span:
    (span_hash[, span_key], n_docs, n_occ, first_doc, first_pos) where
    (first_doc, first_pos) is the lexicographically first occurrence —
    the canonical copy ``mask_duplicate_spans`` preserves.

    Scale shape: the only shuffle is the groupBy on the 64-bit span
    hash (map-side partial aggregation applies); ``max_occ`` caps
    pathological spans (e.g. all-zero padding runs) the same way
    jaccard_pairs_exact's max_df guard bounds hot shingles — dropped
    spans are boilerplate, not content, at that frequency.
    """
    occ = token_span_occurrences(df, k, tokens_col, id_col, emit_span)
    key = ["span_key", "span_hash"] if emit_span else ["span_hash"]
    agg = occ.groupBy(*key).agg(
        F.countDistinct(id_col).cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_occ"),
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias("_f"),
    )
    out = (
        agg.where(F.col("n_docs") >= min_docs)
        .withColumn("first_doc", F.col("_f.d"))
        .withColumn("first_pos", F.col("_f.p"))
        .drop("_f")
    )
    if max_occ is not None:
        out = out.where(F.col("n_occ") <= max_occ)
    return out


def mask_duplicate_spans(
    df: DataFrame,
    k: int = 8,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    min_docs: int = 2,
    out_col: str = "tokens_dedup",
) -> DataFrame:
    """Remove duplicated k-token spans from every document except the
    canonical (globally first) occurrence: any token covered by a
    non-canonical occurrence of a duplicated span is dropped, and the
    survivors are re-concatenated in order (Lee et al. 2022 semantics,
    minus the suffix array).

    Two shuffles end-to-end: the span-hash groupBy (inherited from
    duplicate_token_spans) and the join-back of per-doc drop-position
    lists; the token arrays are rebuilt row-locally with a nested
    higher-order filter — no Python, no second pass over the corpus.
    """
    dups = duplicate_token_spans(df, k, tokens_col, id_col, min_docs).select(
        "span_hash", "first_doc", "first_pos"
    )
    occ = token_span_occurrences(df, k, tokens_col, id_col)
    losers = (
        occ.join(dups, on="span_hash")
        .where(
            (F.col(id_col) != F.col("first_doc"))
            | (F.col("pos") != F.col("first_pos"))
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("pos")).alias("_drop_starts"))
    )
    joined = df.join(losers, on=id_col, how="left")
    toks = F.col(tokens_col)
    keep = F.filter(
        F.transform(toks, lambda x, i: F.struct(x.alias("t"), i.alias("i"))),
        lambda s: ~F.exists(
            F.col("_drop_starts"),
            lambda d: (s["i"] >= d) & (s["i"] < d + k),
        ),
    )
    rebuilt = F.when(F.col("_drop_starts").isNull(), toks).otherwise(
        F.transform(keep, lambda s: s["t"])
    )
    return joined.withColumn(out_col, rebuilt).drop("_drop_starts")
