"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact cosine top-k — the baseline. Query side is tiny
  -> broadcast; the scan side streams, dot products stay JVM-side via
  F.zip_with + F.aggregate (no UDF, codegen'd).
- lsh_topk: random-hyperplane LSH — a scale path. Deterministic planes
  from seeded hashes; candidates only join within a signature bucket, then
  exact cosine on the (small) candidate set. Recall tested vs brute force.
- ivf_build / ivf_topk: IVF-partitioned ANN — the other scale path. A
  seeded Lloyd k-means (pure DataFrame ops) partitions the corpus into
  n_lists inverted lists; queries probe only the nprobe nearest lists.
  nprobe == n_lists degrades gracefully to exact search (recall 1), which
  is how the driver gate pins it; partial-probe recall is pytest-measured
  vs brute force.
- cosine_near_dups: embedding near-duplicate pairs (exact or LSH-bucketed).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window as W, functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double"))
    )


def cosine(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every corpus vector for each query id.
    Output: (query_id, neighbor_id, rank, sim)."""
    # r6: norms are per-ROW quantities — computing them inside the per-pair
    # cosine re-evaluated norm(qv) once per corpus row and norm(cv) once
    # per query (3 array folds per pair). Hoisting them to the join inputs
    # leaves one fold (the dot) per pair; the arithmetic
    # dot/(norm_q * norm_c) is unchanged operation-for-operation, so the
    # similarity values are bit-identical.
    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("__qn"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            _dot(F.col("qv"), F.col("cv")) / (F.col("__qn") * F.col("__cn")),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 5).alias("sim"))
    )


def cosine_near_dups(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 11,
    planes: list | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine(a, b) >= threshold.

    exact=True — the baseline/audit path: normalize once, block self-join,
    JVM-side dot products (O(n^2) compares; correct at any threshold, use
    only on bounded inputs or as the verify stage).
    exact=False — the scale path: hyperplane-LSH bucket candidates (only
    vectors sharing a (table, signature) bucket are compared), then exact
    cosine verification on the candidate pairs. Recall < 1 and rises with
    n_tables; high-cosine pairs collide with probability
    1 - (1 - (1 - theta/pi)^n_planes)^n_tables."""
    # compute the norm once per row (a transform lambda re-evaluates its
    # closure per element — keep the aggregate out of it)
    normed = emb.withColumn("__n", _norm(F.col(vec_col))).select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("__n")).alias("__nv"),
        F.col(vec_col),
    )
    if exact:
        a = normed.select(F.col(id_col).alias("id_a"), F.col("__nv").alias("__va"))
        b = normed.select(F.col(id_col).alias("id_b"), F.col("__nv").alias("__vb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        tables = []
        for t in range(n_tables):
            if planes is not None:
                sig = F.lit(0).cast("long")
                for p in range(n_planes):
                    arr = F.array(*[F.lit(float(c)) for c in planes[t][p]])
                    dot = F.aggregate(
                        F.zip_with(F.col(vec_col), arr, lambda x, r: x.cast("double") * r),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                    sig = sig + (dot >= 0).cast("long") * F.lit(1 << p)
            else:
                sig = lsh_signature(F.col(vec_col), n_planes, dim, seed + 97 * t)
            tables.append(
                normed.select(
                    F.col(id_col), F.col("__nv"), F.lit(t).alias("tbl"), sig.alias("sig")
                )
            )
        allsigs = tables[0]
        for t in tables[1:]:
            allsigs = allsigs.unionByName(t)
        l = allsigs.select("tbl", "sig", F.col(id_col).alias("id_a"), F.col("__nv").alias("__va"))
        r = allsigs.select("tbl", "sig", F.col(id_col).alias("id_b"), F.col("__nv").alias("__vb"))
        pairs = (
            l.join(r, ["tbl", "sig"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "__va", "__vb")
            .distinct()
        )
    sim = _dot(F.col("__va"), F.col("__vb"))
    return (
        pairs.withColumn("cos", sim)
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 5).alias("cos"))
    )


# ---------------------------------------------------------------------------
# IVF-partitioned ANN
# ---------------------------------------------------------------------------

def _centroid_df(spark, centroids: list[list[float]]):
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "__list int, __cvec array<double>",
    )


def _sq_dist(vec_col, cvec_col) -> F.Column:
    return F.aggregate(
        F.zip_with(vec_col, cvec_col, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(emb: DataFrame, centroids, id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment: broadcast the (tiny) centroid table,
    min_by over the n_lists distances per vector — the standard IVF assign
    cost of n x n_lists distance evaluations, all JVM-side."""
    cdf = _centroid_df(emb.sparkSession, centroids)
    d2 = _sq_dist(F.col(vec_col), F.col("__cvec"))
    return (
        emb.select(id_col, vec_col)
        .crossJoin(F.broadcast(cdf))
        .withColumn("__d2", d2)
        .groupBy(id_col)
        .agg(
            F.expr("min_by(__list, __d2)").alias("__list"),
            F.first(vec_col).alias(vec_col),
        )
    )


def ivf_build(
    emb: DataFrame,
    n_lists: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
):
    """Build an IVF index: seeded-deterministic k-means (init = the n_lists
    vectors with the smallest xxhash64(id, seed); `iters` Lloyd rounds of
    assign + per-(list, position) mean via posexplode — pure DataFrame ops,
    only the k x dim centroid matrix ever reaches the driver).

    Returns (assignments DataFrame (id_col, __list), centroids)."""
    init_rows = (
        emb.select(
            F.col(vec_col),
            F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("__h"),
        )
        .orderBy("__h")
        .limit(n_lists)
        .collect()
    )
    centroids = [[float(x) for x in r[0]] for r in init_rows]
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = _assign(emb, centroids, id_col, vec_col)
        stats = (
            assigned.select("__list", F.posexplode(F.col(vec_col)).alias("__p", "__x"))
            .groupBy("__list", "__p")
            .agg(F.avg(F.col("__x").cast("double")).alias("__m"))
            .collect()
        )
        acc: dict = {}
        for r in stats:
            acc.setdefault(r["__list"], {})[r["__p"]] = r["__m"]
        centroids = [
            [acc[l][p] for p in range(dim)] if l in acc else centroids[l]
            for l in range(n_lists)
        ]
    assigned = _assign(emb, centroids, id_col, vec_col)
    return assigned.select(id_col, "__list"), centroids


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
    index=None,
) -> DataFrame:
    """IVF ANN top-k: rank the inverted lists by query-to-centroid distance,
    probe only the nprobe nearest lists, exact cosine + top-k within the
    probed candidates. nprobe == n_lists is exact search (every list
    probed); smaller nprobe trades recall for a 1/(n_lists/nprobe) scan.
    ``index``: optional prebuilt (assignments, centroids) from ivf_build."""
    assignments, centroids = index if index is not None else ivf_build(
        emb, n_lists, iters, id_col, vec_col, seed
    )
    cdf = _centroid_df(emb.sparkSession, centroids)
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("__cn"),  # r6: norm once per row
    ).join(
        assignments.select(F.col(id_col).alias("neighbor_id"), "__list"),
        "neighbor_id",
    )
    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("__qn"),
    )
    probes = (
        q.crossJoin(F.broadcast(cdf))
        .withColumn("__d2", _sq_dist(F.col("qv"), F.col("__cvec")))
        .withColumn(
            "__rk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.col("__d2").asc(), F.col("__list"))
            ),
        )
        .where(F.col("__rk") <= nprobe)
        .select("query_id", "qv", "__qn", "__list")
    )
    cands = corpus.join(F.broadcast(probes), "__list").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cands.withColumn(
        "sim", _dot(F.col("qv"), F.col("cv")) / (F.col("__qn") * F.col("__cn"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 5).alias("sim"))
    )


def _plane_sign(vec_col, plane: int, dim: int, seed: int) -> F.Column:
    """Sign of <v, r_plane> where r_plane components are deterministic
    pseudo-gaussians from hashes (sum of 3 shifted uniforms, good enough for
    hyperplane LSH)."""
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            (F.pmod(F.xxhash64(F.lit("p"), F.lit(seed), F.lit(plane), j), F.lit(10000)) / 5000.0 - 1.0)
        ),
    )
    dot = F.aggregate(
        F.zip_with(vec_col, comps, lambda x, r: x.cast("double") * r),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (dot >= 0).cast("int")


def lsh_signature(vec_col, n_planes: int, dim: int, seed: int = 11) -> F.Column:
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        sig = sig + _plane_sign(vec_col, p, dim, seed).cast("long") * F.lit(1 << p)
    return sig


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 11,
    planes: list | None = None,
) -> DataFrame:
    """ANN top-k: n_tables independent hyperplane signatures; candidates =
    corpus vectors sharing a signature with the query in any table; exact
    cosine + top-k on candidates only.

    planes: optional explicit hyperplanes, shape [n_tables][n_planes][dim]
    (plain floats, embedded as literals — the signature is then reproducible
    by any engine given the same numbers). Default: hash-derived
    pseudo-gaussian planes (no driver-side materialization)."""

    def table_sig(t: int) -> F.Column:
        if planes is None:
            return lsh_signature(F.col(vec_col), n_planes, dim, seed + 97 * t)
        sig = F.lit(0).cast("long")
        for p in range(n_planes):
            arr = F.array(*[F.lit(float(c)) for c in planes[t][p]])
            dot = F.aggregate(
                F.zip_with(F.col(vec_col), arr, lambda x, r: x.cast("double") * r),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            sig = sig + (dot >= 0).cast("long") * F.lit(1 << p)
        return sig

    tables = []
    for t in range(n_tables):
        tables.append(
            emb.select(
                F.col(id_col),
                F.col(vec_col),
                F.lit(t).alias("tbl"),
                table_sig(t).alias("sig"),
            )
        )
    allsigs = tables[0]
    for t in tables[1:]:
        allsigs = allsigs.unionByName(t)
    q = allsigs.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        "tbl",
        "sig",
    )
    cands = (
        allsigs.join(F.broadcast(q), ["tbl", "sig"])
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id", "qv", F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
        .distinct()
    )
    scored = cands.withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 5).alias("sim"))
    )
