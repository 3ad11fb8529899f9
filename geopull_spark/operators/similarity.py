"""Similarity search over the embeddings table.

  brute_cosine_topk — exact top-k by cosine: JVM-side zip_with/aggregate dot
                      product (no UDF), global top-k via orderBy+limit
  lsh_cosine_buckets— random-hyperplane LSH: sign-bit signature → bucket;
                      deterministic hyperplanes from a seeded LCG so results
                      are reproducible without numpy RNG state
  lsh_cosine_topk   — bucket-probed ANN: candidates share a signature band,
                      exact cosine refine + per-query top-k window

Scale path: brute force is O(N) per query — fine broadcast-side for few
queries; the LSH variant turns search into an equi-join on (band, bucket),
sharding candidates across the cluster (the 10^12-doc path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(col_a, col_b):
    return F.aggregate(
        F.zip_with(col_a, col_b, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(col):
    return F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def brute_cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    qnorm = float(sum(x * x for x in query_vec)) ** 0.5
    # try_divide: zero-norm vectors yield NULL (sorted last), not an ANSI error
    sim = F.try_divide(_dot(F.col(vec_col), qlit), _norm(F.col(vec_col)) * F.lit(qnorm))
    return (
        emb.select(id_col, sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 1234567) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes via an LCG (no RNG state)."""
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_cosine_signature(emb: DataFrame, dim: int, n_planes: int = 16,
                         vec_col: str = "embedding") -> DataFrame:
    planes = _hyperplanes(dim, n_planes)
    bits = [
        F.when(_dot(F.col(vec_col), F.array(*[F.lit(v) for v in p])) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return emb.withColumn("lsh_sig", sig.cast("long"))


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.9,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            use_lsh: bool = False, dim: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold).

    Exact mode: block-nested self-join (small/medium sets; SQL-expressible →
    oracle-checkable). LSH mode: candidates from shared signature bands first
    — the 10^12-scale path."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    if use_lsh:
        if dim is None:
            raise ValueError("dim required for LSH mode")
        sig = lsh_cosine_signature(emb, dim, 16, vec_col)
        s_a = sig.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"),
                         (F.col("lsh_sig") & F.lit(0xFF)).alias("bk"))
        s_b = sig.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"),
                         (F.col("lsh_sig") & F.lit(0xFF)).alias("bk"))
        cand = s_a.join(s_b, "bk").filter(F.col("id_a") < F.col("id_b"))
    else:
        cand = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    sim = F.try_divide(
        _dot(F.col("v_a"), F.col("v_b")), _norm(F.col("v_a")) * _norm(F.col("v_b"))
    )
    # round before filtering so the threshold compare is robust to last-ulp
    # summation differences across engines (oracle parity)
    return (
        cand.withColumn("cos_sim", F.round(sim, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def lsh_cosine_topk(emb: DataFrame, queries: DataFrame, dim: int, k: int = 10,
                    n_planes: int = 16, n_bands: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    qid_col: str = "q_id") -> DataFrame:
    """ANN: per-band signature equi-join → exact cosine refine → top-k/query.

    ``queries`` must carry (qid_col, vec_col). Recall is tuned by
    n_planes/n_bands (more bands → more candidates)."""
    bits_per_band = n_planes // n_bands
    mask = (1 << bits_per_band) - 1

    def banded(df, idc):
        s = lsh_cosine_signature(df, dim, n_planes, vec_col)
        return s.select(
            F.col(idc), F.col(vec_col),
            F.explode(F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("lsh_sig"), b * bits_per_band)
                    .bitwiseAND(F.lit(mask))
                    .alias("bucket"),
                )
                for b in range(n_bands)
            ])).alias("bb"),
        ).select(idc, vec_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    e = banded(emb, id_col)
    q = banded(queries, qid_col).withColumnRenamed(vec_col, "q_vec")
    cand = (
        e.join(q, ["band", "bucket"])
        .select(id_col, qid_col, vec_col, "q_vec")
        .dropDuplicates([id_col, qid_col])
    )
    sim = F.try_divide(
        _dot(F.col(vec_col), F.col("q_vec")),
        _norm(F.col(vec_col)) * _norm(F.col("q_vec")),
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cos_sim").desc_nulls_last(), F.col(id_col).asc())
    return (
        cand.withColumn("cos_sim", sim)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(qid_col, id_col, "cos_sim", "rk")
    )
