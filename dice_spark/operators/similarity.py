"""Similarity search over embedding columns (training-data pipeline surface).

* brute_force_topk — exact cosine top-k per query (the correctness baseline);
  one shuffle (the query x corpus join is blocked only by AQE), top-k via
  window rank so no driver-side collection.
* ivf_topk — the scale path: coarse quantization by nearest centroid (IVF);
  queries probe ``n_probe`` nearest cells only, so the pair space shrinks by
  ~n_cells/n_probe. Centroids come from a deterministic seeded k-means
  (pyspark.ml) or can be supplied.
* lsh_bucketed_topk — random-hyperplane (sign) LSH buckets as an alternative
  blocked path without ML dependencies.

Scale notes: brute force is O(Q x N) — only for small Q or as an oracle; IVF
makes the corpus side partition-prunable by cell id (a corpus materialized
bucketed-by-cell makes the probe join shuffle-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dice_spark.operators.dedup import cosine_expr


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank)."""
    from dice_spark.operators.dedup import dot_expr, norm_expr

    # Norms hoisted to the row side: one interpreted-HOF fold per PAIR (the
    # dot) instead of three — bit-identical to cosine_expr (same folds).
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("_qn", norm_expr(F.col("qvec")))
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")
    ).withColumn("_cn", norm_expr(F.col("cvec")))
    sim = dot_expr(F.col("qvec"), F.col("cvec")) / (F.col("_qn") * F.col("_cn"))
    scored = q.join(c, F.col("query_id") != F.col("vec_id")).select(
        "query_id", "vec_id", F.round(sim, 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _nearest_centroid(vec, centroids: list[list[float]]):
    """Column expr: index of the nearest centroid (max dot product)."""
    best_idx, best_dot = F.lit(0), None
    for i, cvec in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in cvec])
        dot = F.aggregate(
            F.zip_with(vec, lit, lambda a, b: (a * b).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        if best_dot is None:
            best_dot = dot
        else:
            best_idx = F.when(dot > best_dot, F.lit(i)).otherwise(best_idx)
            best_dot = F.greatest(dot, best_dot)
    return best_idx


def deterministic_centroids(dim: int, n_cells: int = 8, seed: int = 7) -> list[list[float]]:
    """Seeded random unit-ish centroids — literal, engine-portable.

    For the oracle-checked IVF query: both Spark and the DuckDB oracle embed
    the SAME literal centroid vectors, so cell assignment and the probe join
    are exactly recomputable. Random hyper-directions partition the sphere like
    a coarse quantizer; a trained k-means (train_centroids) gives better
    recall but its floating-point iteration is not reproducible across engines.
    """
    import random

    rnd = random.Random(seed)
    return [
        [round(rnd.gauss(0, 1), 6) for _ in range(dim)] for _ in range(n_cells)
    ]


def train_centroids(corpus: DataFrame, n_cells: int = 8, vec_col: str = "embedding", seed: int = 42) -> list[list[float]]:
    """Deterministic k-means centroids (pyspark.ml KMeans, fixed seed)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    df = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(df)
    return [list(map(float, c)) for c in model.clusterCenters()]


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the n_probe nearest cells per query."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        _nearest_centroid(F.col(vec_col), centroids).alias("cell"),
    )
    # Rank cells per query by centroid dot product; probe the top n_probe.
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    cells = []
    for i, cvec in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in cvec])
        dot = F.aggregate(
            F.zip_with(F.col("qvec"), lit, lambda a, b: (a * b).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        cells.append(F.struct(dot.alias("dot"), F.lit(i).alias("cell")))
    probe = q.withColumn(
        "probe_cells",
        F.slice(F.reverse(F.array_sort(F.array(*cells))), 1, n_probe),
    ).select("query_id", "qvec", F.explode("probe_cells.cell").alias("cell"))
    from dice_spark.operators.dedup import dot_expr, norm_expr

    # norms hoisted to the row side — bit-identical to cosine_expr
    probe = probe.withColumn("_qn", norm_expr(F.col("qvec")))
    c = c.withColumn("_cn", norm_expr(F.col("cvec")))
    sim = dot_expr(F.col("qvec"), F.col("cvec")) / (F.col("_qn") * F.col("_cn"))
    scored = probe.join(c, "cell").filter(F.col("query_id") != F.col("vec_id")).select(
        "query_id", "vec_id", F.round(sim, 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_planes: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign bits of dot with seeded planes.

    ``dim`` comes from the caller or the array metadata — never a driver-side
    ``corpus.first()`` action inside the operator.
    """
    from dice_spark.operators.dedup import hyperplane_bucket, hyperplane_planes

    if dim is None:
        raise ValueError(
            "lsh_bucketed_topk requires the embedding dimension (dim=...); "
            "inferring it would force a driver-side action on the corpus"
        )
    planes = hyperplane_planes(dim, n_planes, seed)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")).withColumn(
        "bucket", hyperplane_bucket(F.col("qvec"), planes)
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")).withColumn(
        "bucket", hyperplane_bucket(F.col("cvec"), planes)
    )
    from dice_spark.operators.dedup import dot_expr, norm_expr

    # norms hoisted to the row side — bit-identical to cosine_expr
    q = q.withColumn("_qn", norm_expr(F.col("qvec")))
    c = c.withColumn("_cn", norm_expr(F.col("cvec")))
    sim = dot_expr(F.col("qvec"), F.col("cvec")) / (F.col("_qn") * F.col("_cn"))
    scored = q.join(c, "bucket").filter(F.col("query_id") != F.col("vec_id")).select(
        "query_id", "vec_id", F.round(sim, 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
