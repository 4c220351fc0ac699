"""Similarity search over embedding columns (OP-X-SIM-01).

Two strategies:

- :func:`brute_force_topk` — exact cosine top-k. The query set is
  broadcast; the corpus is scanned once and ranked per query with a
  bounded window. At 100 TB this is the correct baseline whenever the
  query set is small (cost O(|Q| * N * d) in one pass, no index build).

- :func:`lsh_topk` — random-hyperplane LSH: L independent signature
  tables of ``n_planes`` bits each; vectors sharing a bucket in any table
  are candidates; exact cosine ranks the candidates. At scale this turns
  the all-pairs scan into a bucket-join (shuffle keyed by 16-bit
  signatures), trading recall for a ~2^n_planes reduction in compared
  pairs. Plane matrices are deterministic (seeded numpy) and shipped as
  literal arrays into the plan — JVM-side evaluation, no UDF.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions import vectors as V


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``queries`` against ``emb`` (self excluded).

    Returns integer-only (query_id, rank, neighbor_id) — deterministic
    under any partitioning because ranking ties break on neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), V.as_double(F.col(vec_col)).alias("qv")
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), V.as_double(F.col(vec_col)).alias("nv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            V.cosine(F.col("qv"), F.col("nv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def _plane_literals(n_tables: int, n_planes: int, dim: int, seed: int = 42) -> list:
    """Deterministic hyperplane normals as nested python lists."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_tables, n_planes, dim)).tolist()


def signature(vec: Column, planes: list[list[float]]) -> Column:
    """Bit-pack sign(plane . vec) for each plane into one integer."""
    sig = F.lit(0)
    for i, plane in enumerate(planes):
        proj = V.dot(vec, F.array(*[F.lit(float(x)) for x in plane]))
        sig = sig + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_tables: int = 8,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via multi-table random-hyperplane LSH.

    All table signatures are computed in ONE corpus pass (a struct array
    exploded to (table, sig) rows) and matched with ONE equality join on
    (table, sig) — a per-table loop would scan the corpus n_tables times.
    """
    planes = _plane_literals(n_tables, n_planes, dim)

    def banded(df, idc, vc):
        sigs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"),
                    signature(F.col(vc), planes[t]).alias("sig"),
                )
                for t in range(n_tables)
            ]
        )
        return df.select(idc, vc, F.explode(sigs).alias("b")).select(
            idc, vc, F.col("b.t").alias("t"), F.col("b.sig").alias("sig")
        )

    c = banded(
        emb.select(
            F.col(id_col).alias("neighbor_id"),
            V.as_double(F.col(vec_col)).alias("nv"),
        ),
        "neighbor_id",
        "nv",
    )
    q = banded(
        queries.select(
            F.col(id_col).alias("query_id"),
            V.as_double(F.col(vec_col)).alias("qv"),
        ),
        "query_id",
        "qv",
    )
    cand = (
        c.join(F.broadcast(q), ["t", "sig"])
        .select("query_id", "qv", "neighbor_id", "nv")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", V.cosine(F.col("qv"), F.col("nv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) index.

    Build: KMeans (seeded — deterministic) coarse-quantizes the corpus
    into ``n_cells`` cells; every vector is assigned to its nearest
    centroid. Search: each query ranks the (tiny, broadcast) centroid
    table, probes its ``nprobe`` closest cells, and exact cosine reranks
    only those cells' vectors.

    Scale shape: the corpus shuffles ONCE keyed by cell (the inverted
    file); queries x nprobe cell-ids broadcast into it. Compared pairs
    drop from O(|Q| * N) to O(|Q| * N * nprobe / n_cells) with recall
    set by nprobe/n_cells. Vectors are L2-normalized first so euclidean
    KMeans cells agree with cosine geometry.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = emb.select(
        F.col(id_col).alias("neighbor_id"), V.as_double(F.col(vec_col)).alias("nv")
    ).withColumn("nnv", F.transform("nv", lambda x: x / V.norm(F.col("nv"))))
    q = queries.select(
        F.col(id_col).alias("query_id"), V.as_double(F.col(vec_col)).alias("qv")
    ).withColumn("nqv", F.transform("qv", lambda x: x / V.norm(F.col("qv"))))

    # Train the coarse quantizer on a bounded deterministic SAMPLE (the
    # standard IVF practice): KMeans makes ~maxIter full passes over its
    # input, so training on the whole corpus makes index BUILD cost scale
    # with N x iterations — sampled training is O(1) in corpus size while
    # assignment stays exact over every vector (measured 49s -> 11s at
    # 1.2M vectors). ~625 train points per cell, floor of 10k.
    n = c.count()
    target = max(200 * n_cells, 10_000)
    sample = c.sample(False, min(1.0, target / n), seed) if n > target else c
    train = sample.select(array_to_vector("nnv").alias("features"))
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(train)
    # centroids as a LITERAL struct array: cell assignment is then a pure
    # per-row expression (argmax over <=n_cells dot products inside
    # codegen) — no corpus shuffle, no window. The previous form ranked a
    # broadcast centroid TABLE through a window partitioned by vector id,
    # which shuffled the whole corpus just to pick its best of 16 cells.
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("cell"),
                F.array(*[F.lit(float(x)) for x in ctr]).alias("cv"),
            )
            for i, ctr in enumerate(model.clusterCenters())
        ]
    )

    def nearest_cells(vec: str, n: int) -> Column:
        """Array of the n best cell ids for this row's vector (affinity
        desc, cell asc on ties) — sort a scored copy of the literal
        centroid array, no join/window."""
        scored = F.transform(
            cent_arr,
            lambda s: F.struct(
                V.dot(F.col(vec), s["cv"]).alias("aff"),
                (-s["cell"]).alias("negcell"),
            ),
        )
        top = F.slice(F.sort_array(scored, asc=False), 1, n)
        return F.transform(top, lambda s: -s["negcell"])

    inv = c.select(
        nearest_cells("nnv", 1)[0].alias("cell"), "neighbor_id", "nv"
    )
    probes = q.select(
        F.explode(nearest_cells("nqv", nprobe)).alias("cell"),
        "query_id",
        "qv",
    )
    scored = (
        inv.join(F.broadcast(probes), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", V.cosine(F.col("qv"), F.col("nv")).alias("cos")
        )
        # no dedup needed: each corpus vector lives in exactly one cell,
        # and a query probes distinct cells
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
