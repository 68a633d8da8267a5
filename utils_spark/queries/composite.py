"""Composite queries wiring the UDF-backed operator stack (ORA, grouped
model fits, batch correction) onto the star schema so the driver's checks
see them. These are rows-only entries (no oracle): the hypergeometric /
least-squares / iterative kernels aren't reasonably SQL-expressible, but
their math is unit-tested against exact references in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from utils_spark.io import load_table
from utils_spark.registry import register


@register(
    "ora_enrichment",
    # full SQL oracle: the hypergeometric survival function is reproduced in
    # DuckDB via lgamma sums (term counts are small), BH via windows —
    # upgrading this from rows-only to an exact cross-engine check of the
    # entire enrichment stack
    oracle="""
    WITH mem AS (
      SELECT DISTINCT p_partkey AS item, unnest(string_split(p_type, ' ')) AS term FROM part
    ),
    fg AS (SELECT DISTINCT p_partkey AS item FROM part WHERE p_size < 10),
    u AS (SELECT COUNT(DISTINCT p_partkey) AS m FROM part),
    nfg AS (SELECT COUNT(*) AS n FROM fg),
    sizes AS (
      SELECT term, COUNT(DISTINCT item) AS n_term FROM mem GROUP BY term
      HAVING COUNT(DISTINCT item) BETWEEN 2 AND 5000
    ),
    hits AS (
      SELECT m.term, COUNT(DISTINCT m.item) AS k_hits
      FROM mem m JOIN fg f ON m.item = f.item GROUP BY m.term
    ),
    res AS (
      SELECT s.term, s.n_term, COALESCE(h.k_hits, 0) AS k_hits,
             (SELECT m FROM u) AS m_universe, (SELECT n FROM nfg) AS n_foreground
      FROM sizes s LEFT JOIN hits h ON s.term = h.term
    ),
    pv AS (
      SELECT term, n_term, k_hits, m_universe, n_foreground,
             LEAST(1.0, COALESCE(list_sum(list_transform(
               range(k_hits, LEAST(n_term, n_foreground) + 1),
               x -> exp(  lgamma(n_term + 1.0) - lgamma(x + 1.0) - lgamma(n_term - x + 1.0)
                        + lgamma(m_universe - n_term + 1.0) - lgamma(n_foreground - x + 1.0)
                        - lgamma(m_universe - n_term - n_foreground + x + 1.0)
                        - (lgamma(m_universe + 1.0) - lgamma(n_foreground + 1.0)
                           - lgamma(m_universe - n_foreground + 1.0))))), 0.0)) AS pvalue
      FROM res
    ),
    adj AS (
      SELECT *,
             LEAST(1.0, MIN(pvalue * cnt / rnk)
               OVER (ORDER BY pvalue DESC, term DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS p_adjusted
      FROM (SELECT *, row_number() OVER (ORDER BY pvalue, term) AS rnk,
                   COUNT(*) OVER () AS cnt
            FROM pv)
    )
    SELECT term, CAST(n_term AS BIGINT) AS n_term, CAST(k_hits AS BIGINT) AS k_hits,
           CAST(m_universe AS BIGINT) AS m_universe, CAST(n_foreground AS BIGINT) AS n_foreground,
           ROUND(pvalue, 6) AS pvalue, ROUND(p_adjusted, 6) AS p_adjusted
    FROM adj
    """,
    tags=("composite", "M17", "enrichment"),
)
def ora_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Over-representation analysis on the star schema (reference M17:
    R/funx_enrichment.R:89-140): items = parts, terms = words of p_type
    ('PROMO', 'BRUSHED', ...), foreground = small parts (p_size < 10).
    Which type-words are over-represented among small parts? The
    hypergeometric p-values (Python lgamma pandas_udf) are hash-compared
    against a DuckDB lgamma-sum oracle — exact cross-engine verification
    of a UDF-backed statistical operator."""
    from utils_spark.operators.enrichment import over_representation

    p = load_table(spark, sf_dir, "part")
    memberships = p.select(
        F.col("p_partkey").alias("item"), F.explode(F.split("p_type", " ")).alias("term")
    )
    foreground = p.filter(F.col("p_size") < 10).select(F.col("p_partkey").alias("item"))
    universe = p.select(F.col("p_partkey").alias("item"))
    res = over_representation(foreground, memberships, universe=universe)
    return res.select(
        "term",
        F.col("n_term").cast("long").alias("n_term"),
        F.col("k_hits").cast("long").alias("k_hits"),
        F.col("m_universe").cast("long").alias("m_universe"),
        F.col("n_foreground").cast("long").alias("n_foreground"),
        F.round("pvalue", 6).alias("pvalue"),
        F.round("p_adjusted", 6).alias("p_adjusted"),
    )


@register(
    "grouped_trend_fits",
    oracle=None,  # least-squares + F sf in applyInPandas; unit-tested vs closed forms
    tags=("composite", "M14", "M15", "modelfit"),
)
def grouped_trend_fits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group association tests (reference M14: tradeSeq associationTest
    shape): within each (l_returnflag, l_linestatus) group, does discount
    explain net price? applyInPandas grouped fit + BH across groups."""
    from utils_spark.operators.modelfit import grouped_polyfit
    from utils_spark.operators.stats import bh_adjust

    li = load_table(spark, sf_dir, "lineitem").select(
        F.concat_ws("_", "l_returnflag", "l_linestatus").alias("grp"),
        F.col("l_discount").alias("x"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("y"),
    )
    fits = grouped_polyfit(li, "grp", "x", "y", degree=1)
    return bh_adjust(fits, "pvalue", out_col="p_adjusted", tiebreak_col="group")


@register(
    "spline_trend_fits",
    oracle=None,  # spline least-squares + F sf in applyInPandas; basis
    # invariants and signal/noise discrimination unit-tested
    tags=("composite", "M14", "modelfit", "spline"),
)
def spline_trend_fits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group natural-cubic-spline association tests (reference M14:
    R/tradeseq.R:43-128 fits SMOOTHS, not lines — VERDICT r1 item 5):
    within each event_type, does hour-of-day explain the event value as a
    smooth? ns(df=4) basis per group, exact F-test, BH across groups."""
    from utils_spark.operators.modelfit import grouped_splinefit
    from utils_spark.operators.stats import bh_adjust

    e = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        (F.hour("ts") + F.minute("ts") / 60.0).alias("x"),
        F.col("value").alias("y"),
    )
    fits = grouped_splinefit(e, "grp", "x", "y", spline_df=4)
    return bh_adjust(fits, "pvalue", out_col="p_adjusted", tiebreak_col="group").select(
        "group",
        "n",
        F.round("r2", 6).alias("r2"),
        F.round("f_stat", 4).alias("f_stat"),
        F.round("pvalue", 6).alias("pvalue"),
        F.round("p_adjusted", 6).alias("p_adjusted"),
    )


@register(
    "batch_correction",
    oracle=None,  # iterative centroid correction; property-tested in tests/test_ml.py
    tags=("composite", "M8", "integration"),
)
def batch_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmony batch correction on embeddings (reference M8:
    R/integrate.R:100-123 RunHarmony): treat label parity as a 'batch';
    soft cluster responsibilities + mixtures of per-(cluster, batch)
    offsets (`harmony_soft` — the Harmony model core; the diversity
    penalty stays flagged out). Property tests assert batch separation
    shrinks for both the soft and the hard-assignment (`harmony_lite`)
    variants."""
    from utils_spark.operators.ml import harmony_soft

    e = load_table(spark, sf_dir, "embeddings")
    d = e.select(
        "vec_id",
        (F.col("label") % 2).cast("string").alias("batch"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    corrected = harmony_soft(d, "vec_id", "vec", "batch", k=4, n_iter=2, sigma=1.0)
    return corrected.select("vec_id", "batch", F.round(F.element_at("corrected", 1), 6).alias("c1"))


@register(
    "factor_decomposition",
    oracle=None,  # alternating least squares is iterative/seeded; recovery
    # of a planted low-rank matrix is property-tested in tests/test_ml.py
    tags=("composite", "M20", "ml", "factorization"),
)
def factor_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITFAM-analog low-rank factorization (reference M20:
    R/bitfam.R:3-13): factorize the part×supplier quantity matrix from
    lineitem with nonnegative ALS (rank 4) and return per-part factor
    norms — the 'activity' summary of the decomposition."""
    from utils_spark.operators.ml import als_factorize

    li = load_table(spark, sf_dir, "lineitem")
    mat = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    row_f, _col_f = als_factorize(mat, "l_partkey", "l_suppkey", "qty", rank=4, max_iter=8)
    norm = F.sqrt(F.aggregate(F.transform("features", lambda x: x * x), F.lit(0.0), lambda a, z: a + z))
    return row_f.select(F.col("l_partkey").cast("long").alias("l_partkey"), F.round(norm, 4).alias("factor_norm"))


@register(
    "pca_embedding",
    oracle=None,  # eigenvector sign/rotation is implementation-defined;
    # variance ordering property-tested in tests/test_ml.py
    tags=("composite", "M1", "ml"),
)
def pca_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib truncated PCA over the embeddings table (reference M1):
    returns (vec_id, label, pc1, pc2) with explained-variance-ordered
    components."""
    from utils_spark.operators.ml import pca_embed

    e = load_table(spark, sf_dir, "embeddings")
    out, _ratios = pca_embed(e, "embedding", n_components=2)
    return out.select(
        "vec_id",
        "label",
        F.round(F.element_at("pca", 1), 6).alias("pc1"),
        F.round(F.element_at("pca", 2), 6).alias("pc2"),
    )


@register(
    "clustree_transitions",
    oracle=None,  # kmeans labels are seed-stable but arbitrary; structure
    # checked by the property tests on blobs
    tags=("composite", "M5", "M6", "M7", "ml"),
)
def clustree_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution clustering sweep + cluster-tree transition edges
    (reference M5/M7: FindClusters at several resolutions → clustree):
    KMeans at k=3 and k=6 on embeddings, then (k3 label → k6 label)
    transition counts."""
    from utils_spark.operators.ml import cluster_transition_counts, kmeans_clusters

    e = load_table(spark, sf_dir, "embeddings")
    k3 = kmeans_clusters(e, "embedding", k=3, out_col="k3")
    k6 = kmeans_clusters(k3, "embedding", k=6, out_col="k6")
    return cluster_transition_counts(k6, "k3", "k6")


@register(
    "term_semantic_clusters",
    oracle="""
    WITH RECURSIVE parts AS (SELECT p_name, COUNT(*) AS n FROM part GROUP BY 1),
    tot AS (SELECT SUM(n) AS t FROM parts),
    noun AS (SELECT split_part(p_name, ' ', 2) AS node, SUM(n) AS n FROM parts GROUP BY 1),
    nodes AS (
      SELECT node, -ln(CAST(n AS DOUBLE) / (SELECT t FROM tot)) AS ic FROM noun
      UNION ALL
      SELECT p_name, -ln(CAST(n AS DOUBLE) / (SELECT t FROM tot)) FROM parts
    ),
    anc AS (
      SELECT p_name AS term, split_part(p_name, ' ', 2) AS anc FROM parts
      UNION ALL SELECT p_name, p_name FROM parts
    ),
    mica AS (
      SELECT a.term AS ta, b.term AS tb, MAX(n.ic) AS mica_ic
      FROM anc a JOIN anc b ON a.anc = b.anc AND a.term < b.term
      JOIN nodes n ON n.node = a.anc
      GROUP BY 1, 2
    ),
    sims AS (
      SELECT ta, tb, 2 * mica_ic / (na.ic + nb.ic) AS sim
      FROM mica JOIN nodes na ON na.node = ta JOIN nodes nb ON nb.node = tb
    ),
    edges AS (
      SELECT ta AS s, tb AS d FROM sims WHERE sim >= 0.4995
      UNION SELECT tb, ta FROM sims WHERE sim >= 0.4995
    ),
    reach(node, via) AS (
      SELECT s, s FROM edges
      UNION SELECT e.d, r.via FROM reach r JOIN edges e ON e.s = r.node
    ),
    cc AS (SELECT node AS term, MIN(via) AS component FROM reach GROUP BY node),
    assigned AS (
      SELECT p.p_name AS term, p.n, COALESCE(cc.component, p.p_name) AS component
      FROM parts p LEFT JOIN cc ON cc.term = p.p_name
    ),
    reps AS (
      SELECT component, term AS representative FROM (
        SELECT component, term,
               row_number() OVER (PARTITION BY component ORDER BY n DESC, term) AS rn
        FROM assigned
      ) WHERE rn = 1
    )
    SELECT a.term, a.component, r.representative, CAST(a.n AS BIGINT) AS n_parts
    FROM assigned a JOIN reps r ON a.component = r.component
    """,
    tags=("composite", "M19", "enrichment", "semantic-similarity"),
)
def term_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IC-based semantic-similarity term clustering (reference M19:
    R/funx_enrichment.R:174-234 calculateSimMatrix Lin + rrvgo
    reduceSimMatrix): ontology = part names under their noun genus,
    IC = −ln(annotation frequency), Lin similarity via the
    most-informative-common-ancestor join, threshold graph → connected
    components → representative by annotation count. The full pipeline —
    MICA join, Lin scores, iterative CC, representative ranking — is
    reproduced in the DuckDB oracle (recursive CTE), making this an
    exactly-oracled graph+IC composite."""
    from utils_spark.operators.enrichment import reduce_term_clusters, semantic_similarity_pairs

    p = load_table(spark, sf_dir, "part")
    parts = p.groupBy("p_name").agg(F.count("*").alias("n"))
    total = parts.agg(F.sum("n")).first()[0]
    noun = F.element_at(F.split("p_name", " "), 2)
    nodes = (
        parts.groupBy(noun.alias("node")).agg(F.sum("n").alias("n"))
        .unionByName(parts.select(F.col("p_name").alias("node"), "n"))
        .select("node", (-F.log(F.col("n").cast("double") / F.lit(float(total)))).alias("ic"))
    )
    term_anc = (
        parts.select(F.col("p_name").alias("term"), noun.alias("anc"))
        .unionByName(parts.select(F.col("p_name").alias("term"), F.col("p_name").alias("anc")))
    )
    sims = semantic_similarity_pairs(term_anc, nodes, metric="lin")
    clustered = reduce_term_clusters(
        sims, parts.select(F.col("p_name").alias("term"), F.col("n").alias("score")), threshold=0.4995
    )
    return (
        clustered.join(parts.select(F.col("p_name").alias("term"), "n"), "term")
        .select("term", "component", "representative", F.col("n").cast("long").alias("n_parts"))
    )


@register(
    "pseudotime_lineages",
    oracle=None,  # iterative curve fitting; exact numpy-replica + monotone
    # property tests in tests/test_ml.py
    tags=("composite", "M12", "ml", "trajectory"),
)
def pseudotime_lineages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lineage principal-curve pseudotime over embeddings (reference
    M12: R/slingshot.R:8-55 getLineages + getCurves): KMeans clusters →
    MST lineages from cluster 0 → iterative principal-curve fit →
    per-(lineage, cluster) pseudotime profile. Deterministic (seeded
    KMeans, tie-broken binning)."""
    from utils_spark.operators.ml import kmeans_clusters, principal_curve_pseudotime

    e = load_table(spark, sf_dir, "embeddings")
    clustered = kmeans_clusters(e, "embedding", k=4, out_col="cl")
    pt = principal_curve_pseudotime(
        clustered, "vec_id", "embedding", "cl", start_cluster=0, approx_points=20, n_iter=2
    )
    lab = clustered.select(F.col("vec_id"), "cl")
    return (
        pt.join(lab, "vec_id")
        .groupBy("lineage_id", "cl")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("pseudotime"), 4).alias("mean_pt"),
            F.round(F.expr("percentile(pseudotime, 0.5)"), 4).alias("median_pt"),
        )
    )


@register(
    "louvain_communities",
    oracle=None,  # modularity optimization is iterative/graph-global;
    # properties (Q >= label-prop's Q, blob purity) tested in tests/test_ml.py
    tags=("composite", "M5", "ml", "louvain"),
)
def louvain_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Louvain modularity communities over the embeddings KNN→SNN graph
    (reference M5: R/wrapper.R:296-303 FindClusters algorithm 1 = Louvain).
    Deterministic end-to-end (seeded LSH neighbors, parity-gated sweeps,
    smallest-id tie-breaks): returns the community-size histogram — one row
    per community size with the number of communities at that size — plus
    the per-size member checksum, so the driver's rows-only check is stable
    across runs."""
    from utils_spark.operators.ml import knn_graph, louvain_communities as louvain
    from utils_spark.operators.ml import snn_graph

    e = load_table(spark, sf_dir, "embeddings")
    edges = knn_graph(e, "vec_id", "embedding", k=10, bucket_length=8.0)
    snn = snn_graph(edges, min_shared=2).withColumnRenamed("shared", "weight")
    asg = louvain(snn, e, "vec_id", weight_col="weight", max_iter=10, levels=1)
    sizes = asg.groupBy("community").agg(
        F.count("*").alias("size"), F.sum("node").alias("member_checksum")
    )
    return sizes.groupBy("size").agg(
        F.count("*").alias("n_communities"),
        F.sum("member_checksum").cast("long").alias("checksum"),
    )


@register(
    "knn_snn_lisi",
    oracle=None,  # LSH neighbor sets are seed-stable approximations;
    # purity/LISI properties tested on blobs in tests/test_ml.py
    tags=("composite", "M4", "M11", "ml"),
)
def knn_snn_lisi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNN graph → label-diversity (LISI) per node over embeddings
    (reference M4/M11): per-label median LISI — how label-mixed each
    vector's neighborhood is."""
    from utils_spark.operators.ml import knn_graph, lisi_score

    e = load_table(spark, sf_dir, "embeddings")
    edges = knn_graph(e, "vec_id", "embedding", k=10, bucket_length=8.0)
    lisi = lisi_score(edges, e, "vec_id", "label")
    labeled = lisi.join(e.select(F.col("vec_id").alias("src"), "label"), "src")
    return labeled.groupBy("label").agg(
        F.round(F.expr("percentile(lisi, 0.5)"), 4).alias("median_lisi"),
        F.count("*").alias("n"),
    )


@register(
    "denoised_feature_selection",
    oracle=None,  # loess trend is an iterative robust fit; recovery
    # properties tested in tests/test_modelfit.py
    tags=("composite", "M2", "modelfit"),
)
def denoised_feature_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full modelGeneVar pipeline (reference M2: R/wrapper.R:259-264):
    per-feature mean/variance -> robust loess technical trend ->
    biological variance = total - trend -> top-20 features by bio_var."""
    from pyspark.sql import Window

    from utils_spark.operators.modelfit import loess_trend

    li = load_table(spark, sf_dir, "lineitem")
    mv = (
        li.groupBy(F.col("l_partkey").cast("string").alias("feature"))
        .agg(F.avg("l_quantity").alias("mean"), F.var_samp("l_quantity").alias("var"))
        .filter(F.col("var").isNotNull())
    )
    fitted = loess_trend(mv, "feature", "mean", "var")
    w = Window.orderBy(F.desc("bio_var"), F.asc("feature"))
    return (
        fitted.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("feature", F.round("mean", 4).alias("mean"),
                F.round("variance", 4).alias("variance"),
                F.round("trend", 4).alias("trend"),
                F.round("bio_var", 4).alias("bio_var"))
    )
