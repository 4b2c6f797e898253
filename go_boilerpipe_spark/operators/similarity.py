"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exact baseline, and a sign-LSH bucketed
variant as the scale path. Dot products use F.zip_with + F.aggregate —
left-to-right float64 accumulation, so results are bit-reproducible across
engines (the DuckDB oracle sums in the same order via list comprehension).

Scale notes (10^9+ vectors):
- brute force is a broadcast of the (small) query set against the corpus —
  one map-side pass + a per-query top-k (window over query partition);
- sign-LSH buckets on the sign pattern of the first H components (a valid
  axis-aligned random-projection LSH since embedding dims are arbitrary
  rotations); the join key is the bucket id → shuffle is uniform; probing
  stays within buckets so cost is Σ|bucket|·|queries in bucket|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (na * nb)


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (queries broadcast)."""
    joined = emb.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(_cosine(F.col(vec_col), F.col(query_vec_col)), 5).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)  # deterministic tie-break
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )


def sign_lsh_bucket(vec, h: int = 8):
    """Bucket id from the sign bits of the first ``h`` components."""
    bucket = F.lit(0)
    for i in range(h):
        bucket = bucket + F.when(
            F.element_at(vec, i + 1) > 0, F.lit(2 ** i)
        ).otherwise(F.lit(0))
    return bucket


def ivf_assign(centroids, vec_col: str = "embedding"):
    """Assign each vector to its max-cosine centroid (first-max-wins over
    the ordered centroid list — deterministic, SQL-twin-able).

    ``centroids`` is a list of (centroid_id, vector) pairs, small enough to
    inline as literals (the IVF coarse quantizer). At production scale the
    centroids come from a sampled k-means; the assignment/probe plan shape
    is identical."""
    best_id = F.lit(centroids[0][0])
    best_cos = _cosine(F.col(vec_col), F.array(*[F.lit(float(x)) for x in centroids[0][1]]))
    for cid, cvec in centroids[1:]:
        cos = _cosine(F.col(vec_col), F.array(*[F.lit(float(x)) for x in cvec]))
        better = cos > best_cos
        best_id = F.when(better, F.lit(cid)).otherwise(best_id)
        best_cos = F.when(better, cos).otherwise(best_cos)
    return best_id


def cosine_topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    centroids,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF-style ANN: corpus vectors bucketed by coarse centroid; each
    query probes only its own centroid's inverted list. nprobe=1 here;
    multi-probe = union over the top-p centroids, same plan shape."""
    e = emb.withColumn("ivf_cell", ivf_assign(centroids, vec_col))
    q = queries.withColumn("ivf_cell", ivf_assign(centroids, query_vec_col))
    joined = e.join(F.broadcast(q), "ivf_cell")
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(_cosine(F.col(vec_col), F.col(query_vec_col)), 5).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )


def sign_lsh_buckets_multiprobe(vec, h: int = 8):
    """The base bucket plus its h one-bit-flip perturbations (multi-probe:
    the standard recall/cost knob for sign LSH)."""
    base = sign_lsh_bucket(vec, h)
    return F.array(base, *[base.bitwiseXOR(F.lit(2 ** i)) for i in range(h)])


def cosine_topk_lsh_multiprobe(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    h: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Sign-LSH ANN probing the query's bucket and all 1-bit neighbors."""
    e = emb.withColumn("bucket", sign_lsh_bucket(F.col(vec_col), h))
    q = queries.withColumn(
        "bucket",
        F.explode(sign_lsh_buckets_multiprobe(F.col(query_vec_col), h)),
    )
    joined = e.join(F.broadcast(q), "bucket")
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(_cosine(F.col(vec_col), F.col(query_vec_col)), 5).alias("cosine"),
    ).dropDuplicates([query_id_col, id_col])
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )


def cosine_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    h: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: probe only the query's sign-LSH bucket.

    Recall < 1 by design; at corpus scale add multi-probe (flip one bit)
    by unioning perturbed buckets — same plan shape."""
    e = emb.withColumn("bucket", sign_lsh_bucket(F.col(vec_col), h))
    q = queries.withColumn("bucket", sign_lsh_bucket(F.col(query_vec_col), h))
    joined = e.join(F.broadcast(q), "bucket")
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(_cosine(F.col(vec_col), F.col(query_vec_col)), 5).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )
