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
LSH-partitioned shuffle; no driver-side state anywhere. Hot LSH buckets
(identical signatures by the million from boilerplate docs) are bounded:
buckets above `bucket_cap` emit linear star pairs instead of quadratic
all-pairs — identical connected components, bounded memory (r3 VERDICT #1).
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
    string per gram (measured r1) — hence the numpy kernel. The kernel runs
    ONCE per Arrow batch over concatenated bytes + offsets (VERDICT r4 #6;
    bit-identical to the per-doc path, pinned by
    test_minhash_batch_kernel_bit_identical)."""
    from ..kernels.texthash import minhash_bands_batch

    @pandas_udf(T.ArrayType(T.LongType()))
    def mh(texts: pd.Series) -> pd.Series:
        out: list = [None] * len(texts)
        datas, idx = [], []
        for i, t in enumerate(texts):
            if t is not None:
                datas.append(t.encode("utf-8"))
                idx.append(i)
        if datas:
            sigs = minhash_bands_batch(datas, 8, n_bands)
            for j, i in enumerate(idx):
                out[i] = [int(x) for x in sigs[j]]
        return pd.Series(out, dtype=object)

    d = docs.select(id_col, text_col)
    # The kernel stage inherits the scan's partitioning; a single-row-group
    # parquet input (the small-sf shape) would run the whole signature pass
    # on ONE core. Spread only when the input is narrower than the cluster —
    # at crawl scale the scan already has >= dp partitions and no shuffle of
    # text payload is added (r6).
    dp = docs.sparkSession.sparkContext.defaultParallelism
    if not d.isStreaming and d.rdd.getNumPartitions() < dp:
        d = d.repartition(dp)
    sig = d.select(id_col, mh(F.col(text_col)).alias("bands"))
    return sig.select(
        id_col, *[F.col("bands")[b].alias(f"band{b}") for b in range(n_bands)]
    )


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text", n_bands: int = 8,
                      id_col: str = "doc_id", bucket_cap: int = 128) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on ≥1 min-hash band.

    Scale-safe bucket handling (the crawl-data hot-bucket problem): empty /
    boilerplate / template documents produce *identical* signatures by the
    million, so one (band, bucket) key can hold 10⁶ members. An unbounded
    ``collect_list`` would materialize that bucket as a single 10⁶-element
    array row (executor OOM) and all-pairs explosion would emit 10¹² rows
    from it. Instead:

      1. One shuffle on (band, mh); window ``count``/``min`` annotate every
         member with its bucket size and representative (min id). WindowExec
         spills to disk, so a mega-bucket never materializes as one row.
      2. Buckets with 2 ≤ n ≤ ``bucket_cap``: all-pairs explosion exactly as
         before — the ``collect_list`` is provably ≤ bucket_cap elements, and
         the groupBy reuses the window's hash(band, mh) partitioning (no
         second exchange; see PLANS.md).
      3. Buckets with n > bucket_cap: emit the *star* spanning pairs
         (rep, member) — k−1 rows instead of k(k−1)/2, map-only. For
         connected-components dedup (``dedup_groups``) the star yields the
         IDENTICAL clusters; only pair-level enumeration inside a mega-bucket
         (by construction a near-identical cluster) is reduced.

    The signature pandas UDF is evaluated once (a band-bucket self-join
    would re-derive it on both branches and shuffle twice). Per-row and
    per-task memory are bounded regardless of bucket skew."""
    from pyspark.sql import Window

    mh = minhash_signature(docs, text_col, n_bands, id_col)
    stacked = mh.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("mh"))
            for b in range(n_bands)
        ])).alias("s"),
    ).select(id_col, F.col("s.band").alias("band"), F.col("s.mh").alias("mh"))
    w = Window.partitionBy("band", "mh")
    sized = stacked.select(
        id_col, "band", "mh",
        F.count("*").over(w).alias("n"),
        F.min(id_col).over(w).alias("rep"),
    )
    small = (
        sized.filter((F.col("n") >= 2) & (F.col("n") <= bucket_cap))
        .groupBy("band", "mh")
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
    )
    small_pairs = (
        small.select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
    star_pairs = (
        sized.filter((F.col("n") > bucket_cap) & (F.col(id_col) != F.col("rep")))
        .select(F.col("rep").alias("doc_a"), F.col(id_col).alias("doc_b"))
    )
    return small_pairs.unionByName(star_pairs).distinct()


def lsh_bucket_stats(docs: DataFrame, text_col: str = "text", n_bands: int = 8,
                     id_col: str = "doc_id", bucket_cap: int = 128) -> DataFrame:
    """Diagnostic: per-band bucket-size distribution + how many buckets the
    ``bucket_cap`` routed to the star path. Run eagerly before a large dedup
    to pick ``bucket_cap`` / decide whether to pre-strip exact dups."""
    mh = minhash_signature(docs, text_col, n_bands, id_col)
    stacked = mh.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("mh"))
            for b in range(n_bands)
        ])).alias("s"),
    ).select(F.col("s.band").alias("band"), F.col("s.mh").alias("mh"))
    sizes = stacked.groupBy("band", "mh").agg(F.count("*").alias("n"))
    return sizes.groupBy("band").agg(
        F.count("*").alias("n_buckets"),
        F.max("n").alias("max_bucket"),
        F.sum(F.when(F.col("n") > bucket_cap, 1).otherwise(0)).alias("n_oversize"),
        F.sum(F.when(F.col("n") >= 2, 1).otherwise(0)).alias("n_collision"),
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
                    id_col: str = "doc_id", bucket_cap: int = 128,
                    signatures: DataFrame | None = None) -> DataFrame:
    """Near-dup pairs by SimHash: band on 16-bit chunks (pigeonhole: hamming
    ≤ 3 guarantees a shared chunk of 4; ≤ max_hamming is refined exactly via
    bit_count), then exact hamming filter.

    Scale-safe bucket handling, all-pairs-EQUIVALENT connected components
    (VERDICT r4 #2 — a plain min-id star is NOT equivalent for simhash,
    because the post-routing hamming refine can drop an A–B edge when both
    are > max_hamming from the rep). Per (chunk, ck) bucket:

      1. n ≤ ``bucket_cap``: exact all-pairs (collect_list provably ≤ cap).
      2. n > cap: collapse IDENTICAL signatures first — a star to the min-id
         member of each equal-simhash group (hamming 0, never refined away;
         exact for any group size, this is the crawl-boilerplate shape).
         Cross-group edges then only need one edge per DISTINCT-signature
         pair (members of equal-sig groups are interchangeable for CC:
         hamming(a, b) depends only on their signatures).
      3. ≤ cap distinct signatures: exact all-pairs over the group reps.
      4. > cap distinct signatures: reps are re-banded on the 12 4-bit
         sub-chunks OUTSIDE the bucket's chunk (pigeonhole: ≤ max_hamming ≤ 8
         differing bits over those 48 → ≥ 4 shared sub-chunks), all-pairs
         within sub-buckets ≤ cap. Only a sub-bucket with > cap DISTINCT
         signatures agreeing on 20 of 64 bits falls back to an approximate
         star (counted by :func:`simhash_bucket_stats`) — the one remaining,
         exponentially-rarer divergence from all-pairs components.

    Per-row and per-task memory stay bounded regardless of bucket skew.
    ``signatures`` (id, simhash) overrides the text-derived signatures —
    used by the adversarial-bucket tests to pin the equivalence claim."""
    from pyspark.sql import Window

    sh = signatures if signatures is not None else simhash64(docs, text_col, id_col)
    chunks = sh.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     (F.shiftright(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF))).alias("ck"))
            for c in range(4)
        ])).alias("s"),
    ).select(id_col, "simhash", F.col("s.chunk").alias("chunk"), F.col("s.ck").alias("ck"))
    w = Window.partitionBy("chunk", "ck")
    sized = chunks.select(
        id_col, "simhash", "chunk", "ck", F.count("*").over(w).alias("n")
    )
    small = (
        sized.filter((F.col("n") >= 2) & (F.col("n") <= bucket_cap))
        .groupBy("chunk", "ck")
        .agg(F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("sh"))).alias("ms"))
    )
    small_pairs = (
        small.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"),
        )
    )
    over = sized.filter(F.col("n") > bucket_cap)
    # (2) equal-signature groups: star to the group's min id (hamming 0)
    wg = Window.partitionBy("chunk", "ck", "simhash")
    grouped = over.select(
        id_col, "simhash", "chunk", "ck", F.min(id_col).over(wg).alias("grep")
    )
    ident_star = (
        grouped.filter(F.col(id_col) != F.col("grep"))
        .select(
            F.col("grep").alias("doc_a"), F.col(id_col).alias("doc_b"),
            F.col("simhash").alias("sh_a"), F.col("simhash").alias("sh_b"),
        )
    )
    # one rep row per distinct signature in the bucket
    reps = (
        grouped.filter(F.col(id_col) == F.col("grep"))
        .select(F.col("grep").alias("rid"), "simhash", "chunk", "ck")
    )
    wd = Window.partitionBy("chunk", "ck")
    repd = reps.withColumn("d", F.count("*").over(wd))
    # (3) few distinct signatures: exact all-pairs over reps
    rep_small = (
        repd.filter(F.col("d") <= bucket_cap)
        .groupBy("chunk", "ck")
        .agg(F.collect_list(F.struct(F.col("rid").alias("id"), F.col("simhash").alias("sh"))).alias("ms"))
    )
    rep_pairs = (
        rep_small.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"),
        )
    )
    # (4) many distinct signatures: re-band reps on the 12 out-of-chunk
    # 4-bit sub-chunks
    sub = (
        repd.filter(F.col("d") > bucket_cap)
        .select(
            "rid", "simhash", "chunk", "ck",
            F.explode(F.array(*[
                F.struct(F.lit(s).alias("sub"),
                         (F.shiftright(F.col("simhash"), 4 * s).bitwiseAND(F.lit(0xF))).alias("sb"))
                for s in range(16)
            ])).alias("t"),
        )
        .filter(F.floor(F.col("t.sub") / 4) != F.col("chunk"))
        .select("rid", "simhash", "chunk", "ck",
                F.col("t.sub").alias("sub"), F.col("t.sb").alias("sb"))
    )
    ws = Window.partitionBy("chunk", "ck", "sub", "sb")
    subd = sub.select(
        "rid", "simhash", "chunk", "ck", "sub", "sb",
        F.count("*").over(ws).alias("m"),
        F.min(F.struct(F.col("rid").alias("id"), F.col("simhash").alias("sh"))).over(ws).alias("srep"),
    )
    sub_small = (
        subd.filter(F.col("m") <= bucket_cap)
        .groupBy("chunk", "ck", "sub", "sb")
        .agg(F.collect_list(F.struct(F.col("rid").alias("id"), F.col("simhash").alias("sh"))).alias("ms"))
    )
    sub_pairs = (
        sub_small.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"),
        )
    )
    # approximate fallback: > cap distinct signatures in one sub-bucket
    sub_star = (
        subd.filter((F.col("m") > bucket_cap) & (F.col("rid") != F.col("srep.id")))
        .select(
            F.col("srep.id").alias("doc_a"), F.col("rid").alias("doc_b"),
            F.col("srep.sh").alias("sh_a"), F.col("simhash").alias("sh_b"),
        )
    )
    pairs = (
        small_pairs.unionByName(ident_star).unionByName(rep_pairs)
        .unionByName(sub_pairs).unionByName(sub_star).distinct()
    )
    return pairs.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).filter(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")


def simhash_bucket_stats(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", bucket_cap: int = 128,
                         signatures: DataFrame | None = None) -> DataFrame:
    """Diagnostic for :func:`simhash_neardup`'s bucket handling: per chunk,
    bucket counts, the max bucket, how many buckets are oversized, how many
    DISTINCT signatures the worst oversized bucket holds, and
    ``n_star_fallback`` — the count of (sub-chunk) sub-buckets that exceed
    ``bucket_cap`` distinct signatures and therefore take the approximate
    star route (0 ⇒ components provably identical to all-pairs)."""
    from pyspark.sql import Window

    sh = signatures if signatures is not None else simhash64(docs, text_col, id_col)
    chunks = sh.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     (F.shiftright(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF))).alias("ck"))
            for c in range(4)
        ])).alias("s"),
    ).select(id_col, "simhash", F.col("s.chunk").alias("chunk"), F.col("s.ck").alias("ck"))
    sizes = chunks.groupBy("chunk", "ck").agg(
        F.count("*").alias("n"), F.count_distinct("simhash").alias("d")
    )
    # distinct-sig reps of oversized buckets, re-banded on out-of-chunk
    # sub-chunks, counted per sub-bucket
    wd = Window.partitionBy("chunk", "ck")
    reps = (
        chunks.join(sizes.filter(F.col("n") > bucket_cap).select("chunk", "ck"),
                    ["chunk", "ck"])
        .groupBy("chunk", "ck", "simhash").agg(F.min(id_col).alias("rid"))
        .withColumn("d", F.count("*").over(wd))
        .filter(F.col("d") > bucket_cap)
    )
    sub_over = (
        reps.select(
            "chunk", "ck", "simhash",
            F.explode(F.array(*[
                F.struct(F.lit(s).alias("sub"),
                         (F.shiftright(F.col("simhash"), 4 * s).bitwiseAND(F.lit(0xF))).alias("sb"))
                for s in range(16)
            ])).alias("t"),
        )
        .filter(F.floor(F.col("t.sub") / 4) != F.col("chunk"))
        .groupBy("chunk", "ck", F.col("t.sub"), F.col("t.sb"))
        .agg(F.count("*").alias("m"))
        .filter(F.col("m") > bucket_cap)
        .groupBy("chunk").agg(F.count("*").alias("n_star_fallback"))
    )
    out = sizes.groupBy("chunk").agg(
        F.count("*").alias("n_buckets"),
        F.max("n").alias("max_bucket"),
        F.max("d").alias("max_distinct"),
        F.sum(F.when(F.col("n") > bucket_cap, 1).otherwise(0)).alias("n_oversize"),
        F.sum(F.when(F.col("n") >= 2, 1).otherwise(0)).alias("n_collision"),
    )
    return out.join(sub_over, "chunk", "left").fillna({"n_star_fallback": 0})


def connected_components(pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b",
                         max_iters: int = 50, shortcut: bool = True,
                         stats: dict | None = None) -> DataFrame:
    """Connected components over a candidate-pair graph → (node, component)
    where component = min node id in the component.

    This is the keep/drop half of near-dup dedup: pairs from
    minhash/simhash/embedding candidates form clusters; one canonical doc
    (the min id) survives per cluster. Driver-side loop of DataFrame joins
    with localCheckpoint lineage truncation and an early-exit convergence
    check; no per-row Python.

    Each round does min-label propagation — label(v) ← min(label(v), min over
    neighbors' labels) — and, with ``shortcut=True`` (default), a pointer-
    doubling hop label(v) ← label(label(v)). Labels start at self and only
    decrease, and label(u) ≤ u always, so the shortcut is monotone-safe; it
    collapses chains in O(log n) rounds where plain propagation needs
    O(diameter) — a 10⁶-node path of chained near-dups (adversarial but real
    in crawl data) converges in ~20 rounds instead of 10⁶. Cost: one extra
    self-join per round; worth it except on provably-shallow graphs
    (``shortcut=False`` restores the one-join round).

    ``stats``: optional dict; on return ``stats["iterations"]`` holds the
    number of rounds executed (for convergence tests / telemetry)."""
    edges = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        pairs.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    ).localCheckpoint()
    n_changed = 0
    iters = 0
    for _ in range(max_iters):
        iters += 1
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
        )
        if shortcut:
            # pointer doubling: follow the label one extra hop THROUGH THE
            # JUST-UPDATED labels — label(v) ← updated_label(updated_label(v)).
            # Hopping through the pre-round labels would only gain a constant
            # per round; through the updated ones the reach doubles
            # (d_{k+1} ≥ 2·d_k), giving O(log n) convergence on chains.
            # component' = label(component) ≤ component (labels start at self
            # and only decrease), so _changed stays monotone-true.
            updated = updated.localCheckpoint()
            lab2 = updated.select(
                F.col("node").alias("p_node"), F.col("component").alias("p_component")
            )
            updated = (
                updated.join(lab2, updated["component"] == lab2["p_node"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("p_component"), F.col("component")),
                    ).alias("component2"),
                    (F.col("_changed") | (F.col("p_component") < F.col("component"))).alias("_changed"),
                )
                .withColumnRenamed("component2", "component")
            )
        updated = updated.localCheckpoint()
        n_changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            break
    else:
        # Exhausted max_iters. n_changed counts updates applied during the
        # final round, so a run that converges exactly on round max_iters has
        # n_changed > 0 yet IS converged — probe once more before warning
        # (ADVICE r3) so components deeper than max_iters fail loudly without
        # false positives.
        if n_changed > 0:
            probe = (
                edges.join(labels, edges["b"] == labels["node"])
                .groupBy(F.col("a").alias("node2"))
                .agg(F.min("component").alias("nbr_component"))
                .join(labels, F.col("node2") == labels["node"])
                .filter(F.col("nbr_component") < F.col("component"))
                .count()
            )
            if probe > 0:
                import warnings

                warnings.warn(
                    f"connected_components: {probe} labels still changing after "
                    f"{max_iters} iterations — components deeper than max_iters are "
                    "unconverged; raise max_iters",
                    RuntimeWarning,
                    stacklevel=2,
                )
    if stats is not None:
        stats["iterations"] = iters
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
