"""Approximate-nearest-neighbor search over embedding columns.

Input: a table with (vec_id:long, embedding:array<float>).

- ``cosine_topk``: exact brute-force cosine top-k for one query vector.
  The query vector is a literal folded into the plan (no join); the
  per-row dot product is a JVM ``aggregate``/``zip_with`` expression
  (no Python), and top-k is TakeOrderedAndProject (bounded heaps, no
  global sort). This is the CORRECTNESS baseline and is already the
  right plan for one-off queries at scale: one scan, no shuffle.
- ``rp_lsh_buckets`` / ``rp_lsh_topk``: the SCALE path — random
  hyperplane (sign) LSH. Vectors hash to a b-bit bucket; a query probes
  only its own bucket (and optionally multi-probe neighbors), turning a
  full-corpus scan into a 1/2^b partition-pruned scan. Hyperplane
  signs are derived from the portable hash, so bucketing is
  deterministic and reproducible across engines (no stored model).
- ``knn_join_bucketed``: all-pairs k-NN join via bucket equality —
  linear shuffle instead of crossJoin.
- ``ivf_pivots`` / ``ivf_assign`` / ``ivf_topk``: IVF (inverted-file)
  ANN — a coarse quantizer with deterministic smallest-vec_id seeding
  (optional Lloyd refinement, see its caveat), literal-folded struct-max cell
  assignment (one scan, no join), nprobe-cell probing. The scale path
  when LSH buckets collapse under correlated embeddings; scan cost ~
  nprobe/n_cells once the assigned table is partitioned by cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lucene_clj_spark.functions.text import portable_hash


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    exclude_vec_id: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.
    Returns (vec_id, cos_sim) ordered (cos_sim desc, vec_id asc)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = embeddings.select(
        "vec_id", cosine_sim(F.col(vec_col), q).alias("cos_sim")
    )
    if exclude_vec_id is not None:
        out = out.filter(F.col("vec_id") != exclude_vec_id)
    return out.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def _plane_component(plane: int, i: int) -> Column:
    """Deterministic pseudo-random hyperplane component in {-1, +1}:
    sign of bit 0 of portable_hash('p<plane>_<i>')."""
    h = portable_hash(F.lit(f"plane{plane}_{i}"))
    return F.when(F.pmod(h, F.lit(2)) == 1, F.lit(1.0)).otherwise(F.lit(-1.0))


def rp_lsh_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-LSH bucket id per vector: bit j = [dot(v, plane_j) > 0].
    Deterministic planes (see _plane_component) — no stored model; the
    same expression re-derives the bucket for any query vector."""
    bucket = None
    for j in range(n_planes):
        plane = F.array(*[_plane_component(j, i) for i in range(dim)])
        bit = F.when(_dot(F.col(vec_col), plane) > 0, F.lit(2**j)).otherwise(
            F.lit(0)
        )
        bucket = bit if bucket is None else (bucket + bit)
    return embeddings.withColumn("bucket", bucket.cast("long"))


def rp_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    exclude_vec_id: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, exact
    cosine within it. At scale the embeddings table is written
    partitioned by bucket -> partition-pruned scan of ~1/2^b of data."""
    import numpy as np

    dim = len(query_vec)
    bucketed = rp_lsh_buckets(embeddings, n_planes, dim, vec_col)
    # driver-side bucket of the query vector (same plane derivation)
    import hashlib

    def plane_comp(j: int, i: int) -> float:
        h = int(hashlib.md5(f"plane{j}_{i}".encode()).hexdigest()[:8], 16)
        return 1.0 if h % 2 == 1 else -1.0

    qb = 0
    for j in range(n_planes):
        d = sum(plane_comp(j, i) * float(query_vec[i]) for i in range(dim))
        if d > 0:
            qb += 2**j
    out = bucketed.filter(F.col("bucket") == qb)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = out.select("vec_id", cosine_sim(F.col(vec_col), q).alias("cos_sim"))
    if exclude_vec_id is not None:
        out = out.filter(F.col("vec_id") != exclude_vec_id)
    return out.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def ivf_pivots(
    embeddings: DataFrame,
    n_cells: int = 8,
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> list[tuple[int, list[float]]]:
    """IVF coarse quantizer. SEEDING (``refine_iters=0``) is fully
    deterministic and engine-reproducible: cell c's pivot is the
    vector with the (c+1)-th smallest vec_id (k-means++ RNG seeding
    is not reproducible; the oracle twins depend on this mode). With
    ``refine_iters > 0``, SPHERICAL-k-means Lloyd passes move the
    pivots: assignment is by cosine, so each pass averages the UNIT
    vectors of a cell (a raw Euclidean mean would let high-magnitude
    vectors skew the centroid direction — ADVICE r04); the mean of
    unit vectors points at the spherical centroid direction, which is
    all cosine assignment consults. Each pass is ONE assignment job +
    ONE dim-wide avg aggregate (``F.avg`` per normalized component —
    map-side combined, the shuffle carries n_cells * dim doubles,
    never vectors). Zero vectors are excluded from the mean (their
    direction is undefined; they still assign to a cell). Refinement
    is deterministic only up to floating-point summation order — the
    standard distributed-k-means caveat: ``F.avg`` folds partials in
    task-completion order, so two runs can produce last-bit-different
    centroids and near-equidistant vectors may flip cells. Use
    refine_iters=0 where bit-reproducibility matters. Empty cells
    keep their previous pivot. Returns [(cell, [floats])] — a
    broadcast-sized model (n_cells * dim doubles)."""
    seed_rows = (
        embeddings.select("vec_id", vec_col)
        .orderBy("vec_id")
        .limit(n_cells)
        .collect()
    )
    pivots = [
        (c, [float(x) for x in r[vec_col]])
        for c, r in enumerate(seed_rows)
    ]
    if not pivots:
        return []
    dim = len(pivots[0][1])
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    for _ in range(int(refine_iters)):
        assigned = ivf_assign(embeddings, pivots, vec_col).withColumn(
            "__norm", norm
        ).filter(F.col("__norm") > 0)
        means = (
            assigned.groupBy("cell")
            .agg(
                *[
                    F.avg(
                        F.col(vec_col)[i].cast("double")
                        / F.col("__norm")
                    ).alias(f"m{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        by_cell = {
            int(r["cell"]): [float(r[f"m{i}"]) for i in range(dim)]
            for r in means
        }
        pivots = [(c, by_cell.get(c, p)) for c, p in pivots]
    return pivots


def ivf_assign(
    embeddings: DataFrame,
    pivots: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds ``cell`` = the pivot with the highest cosine similarity
    (ties -> smallest cell). The pivots are literals folded into the
    plan (the broadcast-sized model), so assignment is one scan with a
    JVM struct-max over n_cells dot products — no join, no shuffle, no
    Python. At scale the assigned table is written partitioned by
    cell; probes then partition-prune."""
    if not pivots:
        raise ValueError("ivf_assign needs >= 1 pivot")
    entries = []
    for c, p in pivots:
        pv = F.array(*[F.lit(float(x)) for x in p])
        entries.append(
            F.struct(
                cosine_sim(F.col(vec_col), pv).alias("sim"),
                F.lit(-c).alias("negcell"),
            )
        )
    best = F.array_max(F.array(*entries))
    return embeddings.withColumn(
        "cell", (-best["negcell"]).cast("long")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    refine_iters: int = 0,
    exclude_vec_id: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: assign every vector to its nearest pivot
    cell, probe only the query's ``nprobe`` nearest cells, exact
    cosine within them. The scale path beyond sign-LSH: cell
    population tracks the data distribution (LSH buckets can collapse
    under correlated embeddings), and recall/cost tunes smoothly via
    nprobe. Scan cost ~ nprobe/n_cells of the corpus when the
    assigned table is partitioned by cell.

    Probe-cell choice uses a SEQUENTIAL driver-side float sum so the
    DuckDB oracle twin (list_sum over list_transform) picks the same
    cells bit-for-bit; the in-plan assignment's F.aggregate fold is
    sequential for the same reason."""
    pivots = ivf_pivots(embeddings, n_cells, vec_col, refine_iters)
    if not pivots:
        return embeddings.sparkSession.createDataFrame(
            [], "vec_id long, cos_sim double"
        )

    def _cos(a: list[float], b: list[float]) -> float:
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return dot / ((na ** 0.5) * (nb ** 0.5))

    qd = [float(x) for x in query_vec]
    ranked = sorted(
        ((_cos(qd, p), c) for c, p in pivots),
        key=lambda t: (-t[0], t[1]),
    )
    probe = [c for _, c in ranked[: max(1, int(nprobe))]]
    out = ivf_assign(embeddings, pivots, vec_col).filter(
        F.col("cell").isin(probe)
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = out.select(
        "vec_id", cosine_sim(F.col(vec_col), q).alias("cos_sim")
    )
    if exclude_vec_id is not None:
        out = out.filter(F.col("vec_id") != exclude_vec_id)
    return out.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def knn_join_bucketed(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """All-vectors k-NN join restricted to same-LSH-bucket candidates:
    equality join on bucket (linear shuffle), exact cosine + per-vector
    top-k window inside each bucket. Returns (vec_id, neighbor_id,
    cos_sim, rank)."""
    from pyspark.sql import Window

    b = rp_lsh_buckets(embeddings, n_planes, dim, vec_col)
    left = b.select(
        F.col("vec_id"), F.col(vec_col).alias("__va"), "bucket"
    )
    right = b.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col(vec_col).alias("__vb"),
        "bucket",
    )
    pairs = (
        left.join(right, "bucket")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine_sim(F.col("__va"), F.col("__vb")))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_planes: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, the scale path: candidate
    pairs come from same-LSH-bucket equality (linear shuffle, no
    crossJoin), then the exact cosine filters at ``threshold``. Each
    vector hashes to ONE bucket, so a pair is emitted at most once;
    recall misses cross-bucket pairs — the standard LSH trade-off,
    tuned by n_planes (fewer planes = bigger buckets = higher recall).
    Returns (vec_a, vec_b, cos_sim) with vec_a < vec_b."""
    b = rp_lsh_buckets(embeddings, n_planes, dim, vec_col)
    left = b.select(F.col("vec_id").alias("vec_a"),
                    F.col(vec_col).alias("__va"), "bucket")
    right = b.select(F.col("vec_id").alias("vec_b"),
                     F.col(vec_col).alias("__vb"), "bucket")
    return (
        left.join(right, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", cosine_sim(F.col("__va"), F.col("__vb")))
        .filter(F.col("cos_sim") >= F.lit(threshold))
        .select("vec_a", "vec_b", "cos_sim")
    )
