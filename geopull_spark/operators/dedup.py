"""Deduplication operators over the documents table.

Large-scale training-pipeline dedup, all JVM-side Catalyst expressions (no
Python in the hot path):

  exact_dedup        — content-hash groupBy (md5), keep min doc_id
  minhash_lsh_pairs  — char-shingles → per-band min-hash → band-bucket
                       self-join → candidate pairs (classic MinHash+LSH)
  simhash64          — 64-bit SimHash from token hashes via bit-vote
  simhash_neardup    — banded SimHash join + hamming ≤ k refine
  ngram_jaccard_pairs— exact n-gram Jaccard via shingle-explode equi-join
                       (SQL-expressible → DuckDB-oracle-checkable)

Scale notes: every self-join is an equi-join on a bucket/shingle key
(shuffle-hash; AQE skew handles hot shingles); `distinct` before the join
caps per-doc fanout. At 10^12 docs the band join is the standard
LSH-partitioned shuffle; no driver-side state anywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return docs.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.count("*").alias("n_copies"), F.min(id_col).alias("keep_doc_id")
    )


def minhash_signature(docs: DataFrame, text_col: str = "text", n_bands: int = 8,
                      id_col: str = "doc_id") -> DataFrame:
    """Per-band MinHash via the linear-time rolling-hash kernel (pandas UDF).

    A native-SQL shingle variant (transform/sequence over ``substr``) would
    be O(n²) in text length because Spark's ``substr`` re-scans the UTF8
    string per gram (measured r1) — hence the numpy kernel."""
    from ..kernels.texthash import minhash_bands

    @pandas_udf(T.ArrayType(T.LongType()))
    def mh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
            else:
                out.append(minhash_bands(t.encode("utf-8"), 8, n_bands))
        return pd.Series(out, dtype=object)

    sig = docs.select(id_col, mh(F.col(text_col)).alias("bands"))
    return sig.select(
        id_col, *[F.col("bands")[b].alias(f"band{b}") for b in range(n_bands)]
    )


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text", n_bands: int = 8,
                      id_col: str = "doc_id") -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on ≥1 min-hash band.

    Formulated as bucket-grouping + in-bucket pair explosion rather than a
    band-bucket self-join: a self-join evaluates the minhash pandas UDF on
    BOTH branches (Spark re-derives each join input), doubling the kernel
    cost, and shuffles the rows twice. Here the signature is computed once,
    one shuffle groups by (band, bucket), and pairs explode JVM-side. Bucket
    cardinality is the same either way (near-dup buckets are small by
    construction; a degenerate hot bucket costs O(k²) in both shapes)."""
    mh = minhash_signature(docs, text_col, n_bands, id_col)
    stacked = mh.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("mh"))
            for b in range(n_bands)
        ])).alias("s"),
    ).select(id_col, F.col("s.band").alias("band"), F.col("s.mh").alias("mh"))
    buckets = (
        stacked.groupBy("band", "mh")
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return (
        buckets.select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash: per-bit majority vote over whitespace-token hashes."""
    toks = docs.select(
        id_col, F.expr(f"transform(split({text_col}, ' +'), t -> xxhash64(t))").alias("th")
    )
    # bit b of simhash = 1 iff sum over tokens of (bit set ? +1 : -1) > 0
    return toks.select(
        id_col,
        F.expr(
            "aggregate(transform(sequence(0, 63), b -> "
            " CASE WHEN aggregate(th, 0L, (acc, h) ->"
            "   acc + CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0"
            " THEN shiftleft(1L, b) ELSE 0L END), 0L, (acc, x) -> acc | x)"
        ).alias("simhash"),
    )


def simhash_neardup(docs: DataFrame, max_hamming: int = 8, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash: band on 16-bit chunks (pigeonhole: hamming
    ≤ 3 guarantees a shared chunk of 4; ≤ max_hamming is refined exactly via
    bit_count), then exact hamming filter."""
    sh = simhash64(docs, text_col, id_col)
    chunks = sh.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     (F.shiftright(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF))).alias("ck"))
            for c in range(4)
        ])).alias("s"),
    ).select(id_col, "simhash", F.col("s.chunk").alias("chunk"), F.col("s.ck").alias("ck"))
    # bucket-group + in-bucket pair explosion (same shape as minhash_lsh_pairs:
    # one signature evaluation, one shuffle, no self-join branch re-derivation)
    buckets = (
        chunks.groupBy("chunk", "ck")
        .agg(F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("sh"))).alias("ms"))
        .filter(F.size("ms") > 1)
    )
    pairs = (
        buckets.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    return pairs.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).filter(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")


def connected_components(pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b",
                         max_iters: int = 50) -> DataFrame:
    """Connected components over a candidate-pair graph → (node, component)
    where component = min node id in the component.

    This is the keep/drop half of near-dup dedup: pairs from
    minhash/simhash/embedding candidates form clusters; one canonical doc
    (the min id) survives per cluster. Iterative min-label propagation —
    label(v) ← min(label(v), min over neighbors) — as a driver-side loop of
    DataFrame joins with localCheckpoint lineage truncation and an early-exit
    convergence check; rounds needed = cluster diameter (near-dup clusters
    are shallow). No per-row Python; each round is one shuffle join + agg."""
    edges = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        pairs.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    ).localCheckpoint()
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels, edges["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(nbr_min, labels["node"] == nbr_min["node2"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("_changed"),
            )
        ).localCheckpoint()
        n_changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            break
    else:
        # exhausted max_iters with labels still moving: a component whose
        # diameter exceeds max_iters would get silently-wrong representatives
        # (ADVICE r2) — surface it loudly instead.
        if n_changed > 0:
            import warnings

            warnings.warn(
                f"connected_components: {n_changed} labels still changing after "
                f"{max_iters} iterations — components deeper than max_iters are "
                "unconverged; raise max_iters",
                RuntimeWarning,
                stacklevel=2,
            )
    return labels


def dedup_groups(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                 src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """Per-doc dedup verdict: (doc_id, rep_doc_id, is_canonical). Docs in no
    pair are their own singleton representative."""
    cc = connected_components(pairs, src, dst)
    return (
        docs.select(F.col(id_col))
        .join(cc, docs[id_col] == cc["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("rep_doc_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("rep_doc_id"))
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 5, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact character-n-gram Jaccard similarity for candidate pairs sharing
    ≥1 shingle. Pure string ops → DuckDB-oracle checkable."""
    grams = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(0, greatest(length({text_col}) - {n}, 0)),"
                f" i -> substr({text_col}, i + 1, {n})))"
            )
        ).alias("gram"),
    )
    sizes = grams.groupBy("doc").agg(F.count("*").alias("sz"))
    a = grams.select(F.col("doc").alias("doc_a"), "gram")
    b = grams.select(F.col("doc").alias("doc_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", F.round("jaccard", 6).alias("jaccard"))
    )
