"""Similarity search over an embedding column (``array<float>``).

- ``brute_force_topk`` — exact cosine top-k against one query vector:
  the query is a broadcast literal; the scan is one pass, no shuffle until
  the final top-k (``orderBy … limit`` → Spark's TakeOrdered). Arithmetic
  is float→double element casts + left-to-right ``F.aggregate`` sums, so
  the DuckDB oracle (same formula, same order) is bit-identical.
- ``ivf_topk`` — IVF-style scale path: vectors are bucketed by nearest of
  C deterministic centroids (built from the corpus itself); the query
  probes only its own bucket. At 10^10 vectors this prunes the scan by
  ~C×; bucket assignment is one narrow shuffle at build time and the
  probe is a partition-pruned scan when the bucket id is a partition key.
- ``embedding_near_dups`` — cosine near-duplicate pairs via the IVF
  buckets (pairs within a bucket only), the embedding analog of LSH dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_norm2(a)) * F.sqrt(_norm2(b)))


def brute_force_topk(embeddings: DataFrame, query_vec_id: int, k: int = 10) -> DataFrame:
    """Exact top-k by cosine vs the vector with ``vec_id = query_vec_id``."""
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    scored = (
        embeddings.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            cosine_col(F.col("embedding"), F.col("q_emb")).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def assign_ivf_buckets(embeddings: DataFrame, n_centroids: int = 8) -> DataFrame:
    """Bucket each vector by nearest centroid (centroids = the first
    ``n_centroids`` vectors by vec_id — deterministic, data-derived).

    A production build would k-means these; the plumbing (broadcast
    centroid table, argmax-cosine assignment, bucket column for partition
    pruning) is identical and is what matters at scale.
    """
    cents = embeddings.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    scored = embeddings.crossJoin(F.broadcast(cents)).select(
        "vec_id", "label", "embedding", "centroid_id",
        cosine_col(F.col("embedding"), F.col("c_emb")).alias("c_cos"),
    )
    # argmax carries the row payload through the aggregate — one shuffle on
    # vec_id, no join back to the embeddings table
    return scored.groupBy("vec_id").agg(
        F.max_by(
            F.struct("centroid_id", "label", "embedding"),
            F.struct(F.col("c_cos"), (-F.col("centroid_id")).alias("tb")),
        ).alias("_b")
    ).select(
        "vec_id",
        F.col("_b.label").alias("label"),
        F.col("_b.embedding").alias("embedding"),
        F.col("_b.centroid_id").alias("bucket"),
    )


def kmeans_centroids(
    embeddings: DataFrame, n_centroids: int = 8, n_iters: int = 2, dim: int = 64
) -> DataFrame:
    """Lloyd's k-means over the embedding column, cosine assignment.

    Init = the first ``n_centroids`` vectors by vec_id (deterministic).
    Each iteration is two narrow distributed steps — no driver collect:

    1. assign: broadcast the k×dim centroid table, argmax-cosine per vector
       (``max_by`` carries the assignment through one map-side-combinable
       aggregate keyed on vec_id);
    2. update: ``groupBy(centroid_id)`` with one ``avg`` per dimension —
       64 partial-aggregable columns, so the shuffle moves k×dim doubles
       per partition, not the vectors.

    A cluster that loses every member simply drops out (deterministic; the
    assignment step then uses fewer buckets) — at corpus scale with k≪n
    this never fires. Returns (centroid_id, c_emb array<double>).
    """
    cents = embeddings.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("c_emb"),
    )
    for _ in range(n_iters):
        assigned = (
            embeddings.crossJoin(F.broadcast(cents))
            .select(
                "vec_id", "embedding",
                F.col("centroid_id"),
                cosine_col(F.col("embedding"), F.col("c_emb")).alias("c_cos"),
            )
            .groupBy("vec_id")
            .agg(
                F.max_by(
                    F.struct("centroid_id", "embedding"),
                    F.struct(F.col("c_cos"), (-F.col("centroid_id")).alias("tb")),
                ).alias("_a")
            )
            .select(F.col("_a.centroid_id").alias("centroid_id"), F.col("_a.embedding").alias("embedding"))
        )
        cents = assigned.groupBy("centroid_id").agg(
            F.array(*[
                F.avg(F.col("embedding")[i].cast("double")) for i in range(dim)
            ]).alias("c_emb")
        )
    return cents


def assign_to_centroids(embeddings: DataFrame, cents: DataFrame) -> DataFrame:
    """Argmax-cosine bucket assignment against an explicit centroid table
    (the k-means twin of ``assign_ivf_buckets``'s first-k shortcut)."""
    return (
        embeddings.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "centroid_id",
            cosine_col(F.col("embedding"), F.col("c_emb")).alias("c_cos"),
        )
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.col("centroid_id"),
                F.struct(F.col("c_cos"), (-F.col("centroid_id")).alias("tb")),
            ).alias("bucket")
        )
    )


def ivf_topk(embeddings: DataFrame, query_vec_id: int, k: int = 10, n_centroids: int = 8) -> DataFrame:
    """Approximate top-k: probe only the query's centroid bucket."""
    bucketed = assign_ivf_buckets(embeddings, n_centroids)
    q = bucketed.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    probe = bucketed.crossJoin(F.broadcast(q)).filter(
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != query_vec_id)
    )
    return (
        probe.select(
            "vec_id", "label",
            cosine_col(F.col("embedding"), F.col("q_emb")).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def rh_planes(n_planes: int = 16, dim: int = 64) -> list[list[float]]:
    """Deterministic random-hyperplane components in [-1, 1].

    ``h[i][j] = (md5("rh:i:j")[:4] % 2001 - 1000) / 1000`` — published
    constants, identical decimal literals inlined into both the Spark
    expressions and the DuckDB oracle SQL (the EN_STOPWORDS pattern), so
    the pair shares data, not code.
    """
    import hashlib

    return [
        [
            (int.from_bytes(hashlib.md5(f"rh:{i}:{j}".encode()).digest()[:4], "big") % 2001 - 1000)
            / 1000.0
            for j in range(dim)
        ]
        for i in range(n_planes)
    ]


def _rh_dot_expr(plane: list[float]) -> str:
    arr = ", ".join(f"{x}D" for x in plane)
    return (
        f"aggregate(zip_with(embedding, array({arr}), (x, y) -> cast(x as double) * y), "
        "cast(0 as double), (acc, v) -> acc + v)"
    )


def rh_bucket_col(n_planes: int = 6) -> Column:
    """Random-hyperplane LSH signature of the ``embedding`` column.

    bit i = [dot(v, h_i) ≥ 0]: nearby vectors (small angle) agree on most
    hyperplane sides, so they land in the same bucket with probability
    (1 - θ/π)^planes — the classic SimHash-for-embeddings scheme. All
    native expressions; at 10^10 vectors the signature (with more planes,
    or several independent plane sets multi-probed) is a partition key:
    the probe reads one bucket, not the corpus. 6 planes ≈ 64 buckets —
    sized to the synthetic corpus so buckets hold ~n/64 candidates.
    """
    bits = [
        F.when(F.expr(_rh_dot_expr(p)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(rh_planes(n_planes))
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def assign_rh_buckets(embeddings: DataFrame, n_planes: int = 6) -> DataFrame:
    """LSH-bucketed ANN build side: (vec_id, bucket signature). One narrow
    map-only pass — no shuffle at all (vs IVF's argmax aggregate)."""
    return embeddings.select(
        "vec_id", "label", "embedding", rh_bucket_col(n_planes).alias("bucket")
    )


def rh_lsh_topk(embeddings: DataFrame, query_vec_id: int, k: int = 10, n_planes: int = 6) -> DataFrame:
    """Approximate top-k: exact cosine within the query's LSH bucket."""
    bucketed = assign_rh_buckets(embeddings, n_planes)
    q = bucketed.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    probe = bucketed.crossJoin(F.broadcast(q)).filter(
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != query_vec_id)
    )
    return (
        probe.select(
            "vec_id", "label",
            cosine_col(F.col("embedding"), F.col("q_emb")).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95, n_centroids: int = 8) -> DataFrame:
    """Near-dup vector pairs (cosine ≥ threshold) within IVF buckets."""
    b = assign_ivf_buckets(embeddings, n_centroids).select("vec_id", "embedding", "bucket")
    l = b.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), "bucket"
    )
    r = b.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), "bucket"
    )
    return (
        l.join(r, on="bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            cosine_col(F.col("emb_a"), F.col("emb_b")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
