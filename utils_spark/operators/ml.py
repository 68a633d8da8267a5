"""ML / graph operators (reference SURVEY §2.8: M1 PCA, M4 KNN/SNN graph,
M5/M6 clustering, M7 cluster-tree, M11 LISI, M12 centroid-MST pseudotime).

Built on MLlib + DataFrame compositions. Correctness is property-tested
(variance ordering, partition validity, monotone pseudotime — SURVEY §5),
not label-oracled: distributed clustering parity with igraph/Seurat is
approximate by nature (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from utils_spark.functions import to_double_array


def _to_vector_col(df: DataFrame, array_col: str, out: str = "features") -> DataFrame:
    """array<double> → MLlib Vector column (the ML boundary — SURVEY §7.6:
    arrays everywhere, vectors only where MLlib requires them)."""
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(out, array_to_vector(to_double_array(array_col)))


def pca_embed(
    df: DataFrame,
    array_col: str,
    n_components: int = 10,
    standardize: bool = False,
    out_col: str = "pca",
) -> tuple[DataFrame, list[float]]:
    """Truncated PCA (reference M1: R/wrapper.R:285-291 irlba::prcomp_irlba
    — already-truncated SVD, which MLlib PCA matches at k).

    Returns (df + array<double> `out_col`, explained-variance ratios).
    Distributed: gram-matrix accumulation executor-side, eigen-solve of the
    (d×d) gram on the driver — d is feature count, never row count."""
    from pyspark.ml.feature import PCA, StandardScaler
    from pyspark.ml.functions import vector_to_array

    work = _to_vector_col(df, array_col, "__feat")
    feat = "__feat"
    if standardize:
        scaler = StandardScaler(inputCol="__feat", outputCol="__scaled", withMean=True, withStd=True)
        work = scaler.fit(work).transform(work)
        feat = "__scaled"
    model = PCA(k=n_components, inputCol=feat, outputCol="__pc").fit(work)
    out = (
        model.transform(work)
        .withColumn(out_col, vector_to_array("__pc"))
        .drop("__feat", "__scaled", "__pc")
    )
    return out, list(model.explainedVariance)


def kmeans_clusters(
    df: DataFrame, array_col: str, k: int, seed: int = 290, out_col: str = "cluster"
) -> DataFrame:
    """KMeans clustering on an array column (pragmatic analog of the
    reference's community-detection step M5 for globular structure;
    BisectingKMeans covers the divisive-hierarchical case M6)."""
    from pyspark.ml.clustering import KMeans

    work = _to_vector_col(df, array_col, "__feat")
    model = KMeans(k=k, seed=seed, featuresCol="__feat", predictionCol=out_col).fit(work)
    return model.transform(work).drop("__feat")


def knn_graph(
    df: DataFrame,
    key_col: str,
    array_col: str,
    k: int = 10,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    max_distance: float = float("inf"),
) -> DataFrame:
    """Approximate KNN edge list via BucketedRandomProjectionLSH (reference
    M4: R/wrapper.R:294 FindNeighbors): (src, dst, dist), ≤k neighbors per
    src. LSH bounds candidate pairs (vs. O(n²) crossJoin); tune
    bucket_length/num_hash_tables for recall-vs-cost."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    work = _to_vector_col(df, array_col, "__feat").select(F.col(key_col).alias("__key"), "__feat")
    lsh = BucketedRandomProjectionLSH(
        inputCol="__feat", outputCol="__hashes", bucketLength=bucket_length, numHashTables=num_hash_tables, seed=290
    )
    model = lsh.fit(work)
    pairs = (
        model.approxSimilarityJoin(work, work, max_distance, distCol="dist")
        .filter(F.col("datasetA.__key") != F.col("datasetB.__key"))
        .select(
            F.col("datasetA.__key").alias("src"), F.col("datasetB.__key").alias("dst"), "dist"
        )
    )
    w = Window.partitionBy("src").orderBy(F.asc("dist"), F.asc("dst"))
    return pairs.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")


def snn_graph(knn_edges: DataFrame, min_shared: int = 1) -> DataFrame:
    """Shared-nearest-neighbor graph from a KNN edge list (reference M4:
    Seurat SNN): edge weight = |N(a) ∩ N(b)| via self-join on the shared
    neighbor key — one shuffle on dst."""
    a, b = knn_edges.alias("a"), knn_edges.alias("b")
    return (
        a.join(b, (F.col("a.dst") == F.col("b.dst")) & (F.col("a.src") < F.col("b.src")))
        .groupBy(F.col("a.src").alias("u"), F.col("b.src").alias("v"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def label_propagation(
    edges: DataFrame, nodes: DataFrame, key_col: str, max_iter: int = 10, seed_col: str | None = None
) -> DataFrame:
    """Community detection by synchronous label propagation over an edge
    list (reference M5 baseline: R/wrapper.R:296-303 FindClusters; exact
    Louvain modularity parity is out of scope — SURVEY §7.3, property
    tests instead). Each round: adopt the most frequent neighbor label
    (ties → smallest label, deterministic). Lineage checkpointed."""
    lbl = nodes.select(F.col(key_col).alias("node"), (F.col(seed_col) if seed_col else F.col(key_col)).alias("label"))
    und = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    for i in range(max_iter):
        neigh = (
            und.join(lbl.withColumnRenamed("node", "v"), "v")
            .groupBy("u", "label")
            .agg(F.count("*").alias("votes"))
        )
        w = Window.partitionBy("u").orderBy(F.desc("votes"), F.asc("label"))
        new_lbl = (
            neigh.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col("u").alias("node"), "label")
        )
        lbl = (
            lbl.join(new_lbl.withColumnRenamed("label", "__new"), "node", "left")
            .select("node", F.coalesce("__new", "label").alias("label"))
        )
        if (i + 1) % 5 == 0:
            lbl = lbl.localCheckpoint()
    return lbl


def cluster_transition_counts(df: DataFrame, label_a: str, label_b: str) -> DataFrame:
    """Cross-resolution cluster transition edges (reference M7:
    R/wrapper.R:350-359 clustree): count of entities per (label_a, label_b)."""
    return df.groupBy(F.col(label_a).alias("from_label"), F.col(label_b).alias("to_label")).agg(
        F.count("*").alias("n")
    )


def lisi_score(
    knn_edges: DataFrame, labels: DataFrame, key_col: str, label_col: str
) -> DataFrame:
    """Local Inverse Simpson Index per node (reference M11:
    R/integrate.R:188-212 compute_lisi): 1 / Σ p_l² over the label mix of
    each node's KNN neighborhood. Two joins + one agg, no UDF."""
    lab = labels.select(F.col(key_col).alias("dst"), F.col(label_col).alias("lbl"))
    mix = knn_edges.join(lab, "dst").groupBy("src", "lbl").agg(F.count("*").alias("n"))
    wtot = Window.partitionBy("src")
    p2 = mix.withColumn("p", F.col("n") / F.sum("n").over(wtot)).groupBy("src").agg(
        (1.0 / F.sum(F.col("p") * F.col("p"))).alias("lisi")
    )
    return p2


def centroid_mst_pseudotime(
    df: DataFrame,
    array_col: str,
    cluster_col: str,
    start_cluster,
) -> DataFrame:
    """Trajectory skeleton (reference M12: R/slingshot.R:8-55 slingshot):
    cluster centroids → MST over centroids (driver-side: #clusters is tiny
    by definition) → BFS distances from start cluster → per-entity
    pseudotime = centroid distance + projection along the local edge.

    Bulk data never leaves DataFrames; only the (k × d) centroid matrix is
    collected (SURVEY §3 design rule)."""
    comp = df.select(cluster_col, F.posexplode(to_double_array(array_col)).alias("dim", "x"))
    cent_long = comp.groupBy(cluster_col, "dim").agg(F.avg("x").alias("cx"))
    cent_rows = (
        cent_long.groupBy(cluster_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cx"))).alias("pairs"))
        .select(cluster_col, F.transform("pairs", lambda p: p["cx"]).alias("centroid"))
        .collect()
    )
    import math as _math

    cents = {r[cluster_col]: r["centroid"] for r in cent_rows}
    ks = sorted(cents)
    if start_cluster not in cents:
        raise ValueError(f"start_cluster {start_cluster!r} not found")
    # Prim's MST on the tiny centroid graph
    def d(a, b):
        return _math.sqrt(sum((x - y) ** 2 for x, y in zip(cents[a], cents[b])))

    in_tree, edges = {start_cluster}, []
    while len(in_tree) < len(ks):
        best = min(
            ((a, b, d(a, b)) for a in in_tree for b in ks if b not in in_tree),
            key=lambda t: (t[2], str(t[1])),
        )
        in_tree.add(best[1])
        edges.append(best)
    # BFS cumulative distance from start
    dist = {start_cluster: 0.0}
    frontier = [start_cluster]
    adj: dict = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    while frontier:
        nxt = []
        for u in frontier:
            for v, w in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + w
                    nxt.append(v)
        frontier = nxt
    base = F.create_map(*[x for k in ks for x in (F.lit(k), F.lit(dist[k]))])
    # pseudotime = cluster base distance + distance from own centroid
    cmap = F.create_map(*[x for k in ks for x in (F.lit(k), F.array(*[F.lit(c) for c in cents[k]]))])
    own = cmap[F.col(cluster_col)]
    v = to_double_array(array_col)
    local = F.sqrt(F.aggregate(F.zip_with(v, own, lambda x, c: (x - c) * (x - c)), F.lit(0.0), lambda a, z: a + z))
    return df.withColumn("pseudotime", base[F.col(cluster_col)] + local)


def harmony_lite(
    df: DataFrame,
    key_col: str,
    array_col: str,
    batch_col: str,
    k: int = 10,
    n_iter: int = 3,
    seed: int = 290,
) -> DataFrame:
    """Harmony-style iterative batch correction (reference M8:
    R/integrate.R:100-123 RunHarmony — soft k-means + per-cluster linear
    correction; this is the hard-assignment simplification, flagged
    non-parity per SURVEY §2.8 M8).

    Each iteration: (1) KMeans in the current embedding, (2) per-(cluster,
    batch) mean offset from the cluster mean, (3) subtract the offset from
    each vector. All offsets are tiny aggregate tables joined back —
    nothing collects to the driver; lineage checkpointed per iteration.
    Returns df + `corrected` array column."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    work = df.select(F.col(key_col).alias("__key"), F.col(batch_col).alias("__batch"),
                     to_double_array(array_col).alias("__v"))
    for it in range(n_iter):
        vec = work.withColumn("__feat", array_to_vector("__v"))
        model = KMeans(k=k, seed=seed + it, featuresCol="__feat", predictionCol="__c").fit(vec)
        assigned = model.transform(vec).drop("__feat")
        comp = assigned.select("__key", "__batch", "__c", F.posexplode("__v").alias("__d", "__x"))
        cluster_mean = comp.groupBy("__c", "__d").agg(F.avg("__x").alias("__cm"))
        batch_mean = comp.groupBy("__c", "__batch", "__d").agg(F.avg("__x").alias("__bm"))
        offsets = (
            batch_mean.join(cluster_mean, ["__c", "__d"])
            .select("__c", "__batch", "__d", (F.col("__bm") - F.col("__cm")).alias("__off"))
        )
        corrected = (
            comp.join(offsets, ["__c", "__batch", "__d"], "left")
            .withColumn("__xc", F.col("__x") - F.coalesce("__off", F.lit(0.0)))
            .groupBy("__key", "__batch")
            .agg(F.array_sort(F.collect_list(F.struct("__d", "__xc"))).alias("__pairs"))
            .select(
                "__key", "__batch", F.transform("__pairs", lambda p: p["__xc"]).alias("__v")
            )
        )
        work = corrected.localCheckpoint()
    out = work.select(F.col("__key").alias(key_col), F.col("__v").alias("corrected"))
    return df.join(out, key_col)


def cca_integrate_lite(
    df: DataFrame,
    key_col: str,
    array_col: str,
    batch_col: str,
    n_components: int = 10,
) -> tuple[DataFrame, list[float]]:
    """CCA-style integration, simplified (reference M9: R/integrate.R:125-153
    Seurat IntegrateLayers CCAIntegration — per-batch split, scale, joint
    reduction; anchor matching is NOT reproduced, flagged non-parity per
    SURVEY §2.8 M9).

    Steps: (1) per-batch per-dimension standardization (removes batch
    location/scale effects — the reference's per-layer ScaleData), then
    (2) joint PCA over the standardized vectors (the shared low-rank
    space CCA approximates when batches share structure). Returns
    (df + `integrated` array column, explained variance ratios)."""
    comp = df.select(
        F.col(key_col).alias("__key"),
        F.col(batch_col).alias("__batch"),
        F.posexplode(to_double_array(array_col)).alias("__d", "__x"),
    )
    wb = Window.partitionBy("__batch", "__d")
    std = comp.withColumn(
        "__z",
        (F.col("__x") - F.avg("__x").over(wb))
        / F.coalesce(F.nullif(F.stddev_samp("__x").over(wb), F.lit(0.0)), F.lit(1.0)),
    )
    assembled = (
        std.groupBy("__key")
        .agg(F.array_sort(F.collect_list(F.struct("__d", "__z"))).alias("__pairs"))
        .select("__key", F.transform("__pairs", lambda p: p["__z"]).alias("__zv"))
    )
    embedded, ratios = pca_embed(assembled, "__zv", n_components=n_components, out_col="integrated")
    out = embedded.select(F.col("__key").alias(key_col), "integrated")
    return df.join(out, key_col), ratios


def classical_mds_2d(
    df: DataFrame,
    key_col: str,
    array_col: str,
    sample_n: int = 500,
    seed: int = 290,
) -> DataFrame:
    """2-D embedding for visualization via classical MDS on a seeded
    deterministic sample (reference M10: R/integrate.R:161-177 RunUMAP —
    SURVEY defers exact UMAP [no native lib] and prescribes a sampled
    applyInPandas embedding as the plot-path fallback; classical MDS is
    the deterministic choice).

    The sample (≤ sample_n rows, md5-seeded per SURVEY §7.2) is embedded
    by double-centering its Gram matrix and taking the top-2 eigenvectors
    (numpy eigh inside a single-group applyInPandas — bulk data never
    leaves DataFrames, the O(n²) matrix is bounded by sample_n).
    Returns (key, mds1, mds2) for the sampled rows."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    from utils_spark.operators.sampling import random_subset

    sampled = random_subset(df.select(key_col, array_col), key_col, sample_n, seed=seed)
    schema = StructType(
        [
            StructField("key", StringType()),
            StructField("mds1", DoubleType()),
            StructField("mds2", DoubleType()),
        ]
    )

    def embed(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf[key_col].astype(str).to_numpy()
        X = np.array([np.asarray(v, dtype=float) for v in pdf[array_col]])
        n = len(X)
        if n < 3:
            return pd.DataFrame({"key": keys, "mds1": 0.0, "mds2": 0.0})
        sq = (X * X).sum(axis=1)
        d2 = sq[:, None] + sq[None, :] - 2 * (X @ X.T)
        j = np.eye(n) - np.ones((n, n)) / n
        b = -0.5 * j @ d2 @ j
        vals, vecs = np.linalg.eigh(b)
        top = np.argsort(vals)[::-1][:2]
        coords = vecs[:, top] * np.sqrt(np.clip(vals[top], 0, None))
        # deterministic sign convention: largest-|coord| entry positive
        for c in range(2):
            i = int(np.argmax(np.abs(coords[:, c])))
            if coords[i, c] < 0:
                coords[:, c] = -coords[:, c]
        return pd.DataFrame({"key": keys, "mds1": coords[:, 0], "mds2": coords[:, 1]})

    from pyspark.sql import functions as _F

    return (
        sampled.withColumn("__g", _F.lit(1))
        .groupBy("__g")
        .applyInPandas(lambda pdf: embed(pdf.drop(columns="__g")), schema)
    )
