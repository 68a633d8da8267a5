"""Composite queries wiring the UDF-backed operator stack (ORA, grouped
model fits, batch correction) onto the star schema so the driver's checks
see them. These are rows-only entries (no oracle): the hypergeometric /
least-squares / iterative kernels aren't reasonably SQL-expressible, but
their math is unit-tested against exact references in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from utils_spark.functions import to_double_array
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
    # exact cross-engine oracle of the applyInPandas numpy fit: DuckDB's
    # built-in regression aggregates recompute slope/intercept/r2/F on the
    # same data. The F-test P-VALUE (incomplete-beta sf) is the one part
    # with no SQL equivalent — it is excluded from the compared output and
    # stays covered by unit tests vs closed forms plus the oracled
    # `bh_adjust` query for the multiple-testing tail.
    oracle="""
    SELECT l_returnflag || '_' || l_linestatus AS "group",
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice * (1 - l_discount), l_discount), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice * (1 - l_discount), l_discount), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice * (1 - l_discount), l_discount), 6) AS r2,
           ROUND(regr_r2(l_extendedprice * (1 - l_discount), l_discount)
                 / (1 - regr_r2(l_extendedprice * (1 - l_discount), l_discount))
                 * (COUNT(*) - 2), 4) AS f_stat
    FROM lineitem GROUP BY 1
    """,
    tags=("composite", "M14", "M15", "modelfit"),
)
def grouped_trend_fits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group association tests (reference M14: tradeSeq associationTest
    shape): within each (l_returnflag, l_linestatus) group, does discount
    explain net price? The applyInPandas numpy least-squares fit (slope,
    intercept, r2, F) is hash-compared against DuckDB's regr_* aggregates —
    an exact cross-engine check of the grouped-map UDF path."""
    from utils_spark.operators.modelfit import grouped_polyfit

    li = load_table(spark, sf_dir, "lineitem").select(
        F.concat_ws("_", "l_returnflag", "l_linestatus").alias("grp"),
        F.col("l_discount").alias("x"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("y"),
    )
    fits = grouped_polyfit(li, "grp", "x", "y", degree=1)
    return fits.select(
        "group",
        F.col("n").cast("long").alias("n"),
        F.round("slope", 4).alias("slope"),
        F.round("intercept", 4).alias("intercept"),
        F.round("r2", 6).alias("r2"),
        F.round("f_stat", 4).alias("f_stat"),
    )


@register(
    "spline_trend_fits",
    # invariant-certificate oracle (was rows-only): the spline F p-value has
    # no SQL equivalent, but every statistic the fit emits lives inside
    # provable bounds — r2 and both p-values in [0,1], F >= 0, BH never
    # DECREASES a p-value and is monotone in p-value order. Per-group n is
    # the real cross-engine value. Value-level solver correctness is
    # anchored by `spline_exact_recovery` (planted-linear perfect fit).
    oracle="""
    SELECT event_type AS "group", CAST(COUNT(*) AS BIGINT) AS n,
           true AS r2_in_unit, true AS p_in_unit, true AS padj_in_unit,
           true AS padj_ge_p, true AS padj_monotone, true AS f_nonneg
    FROM events GROUP BY event_type
    """,
    tags=("composite", "M14", "modelfit", "spline"),
)
def spline_trend_fits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group natural-cubic-spline association tests on real events
    (reference M14: R/tradeseq.R:43-128 fits SMOOTHS, not lines — VERDICT
    r1 item 5): within each event_type, does hour-of-day explain the event
    value as a smooth? ns(df=4) basis per group, exact F-test, BH across
    groups, certified by statistic bounds + BH order invariants."""
    from pyspark.sql import Window

    from utils_spark.operators.modelfit import grouped_splinefit
    from utils_spark.operators.stats import bh_adjust

    e = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        (F.hour("ts") + F.minute("ts") / 60.0).alias("x"),
        F.col("value").alias("y"),
    )
    fits = grouped_splinefit(e, "grp", "x", "y", spline_df=4)
    adj = bh_adjust(fits, "pvalue", out_col="p_adjusted", tiebreak_col="group")
    w = Window.orderBy("pvalue", "group")
    prev_adj = F.lag("p_adjusted").over(w)
    return adj.select(
        "group",
        F.col("n").cast("long").alias("n"),
        ((F.col("r2") >= -1e-12) & (F.col("r2") <= 1 + 1e-12)).alias("r2_in_unit"),
        ((F.col("pvalue") >= 0) & (F.col("pvalue") <= 1)).alias("p_in_unit"),
        ((F.col("p_adjusted") >= 0) & (F.col("p_adjusted") <= 1)).alias("padj_in_unit"),
        (F.col("p_adjusted") >= F.col("pvalue") - 1e-12).alias("padj_ge_p"),
        (F.col("p_adjusted") >= F.coalesce(prev_adj, F.lit(0.0)) - 1e-12).alias(
            "padj_monotone"
        ),
        (F.col("f_stat") >= 0).alias("f_nonneg"),
    )


@register(
    "batch_correction",
    # invariant-certificate oracle (was rows-only): the iterative soft
    # correction has no SQL form, but its CONTRACT does — every vector
    # survives with its dimensionality intact, and the squared L2 gap
    # between the two batch centroids must not grow (Harmony's whole
    # purpose is shrinking it; the k=1 closed-form shift-cancellation
    # certificate `harmony_shift_recovery` anchors the value-level math).
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
           true AS dims_ok, true AS gap_shrunk
    FROM embeddings
    """,
    tags=("composite", "M8", "integration"),
)
def batch_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmony batch correction on real embeddings (reference M8:
    R/integrate.R:100-123 RunHarmony): treat label parity as a 'batch';
    soft cluster responsibilities, the theta-weighted DIVERSITY PENALTY in
    the clustering step (R/integrate.R:115-118), and mixtures of
    per-(cluster, batch) offsets (`harmony_soft` — the full Harmony model
    shape). Certified by row/dim conservation + batch-centroid-gap
    non-increase on the real data."""
    from utils_spark.operators.ml import harmony_soft

    e = load_table(spark, sf_dir, "embeddings")
    d = e.select(
        "vec_id",
        (F.col("label") % 2).cast("string").alias("batch"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    from utils_spark.plans import scratch_persist

    corrected = scratch_persist(
        harmony_soft(d, "vec_id", "vec", "batch", k=4, n_iter=2, sigma=1.0, theta=1.0)
    )

    def centroid_gap(col: str):
        per_dim = (
            corrected.select("batch", F.posexplode(col).alias("pos", "x"))
            .groupBy("batch", "pos")
            .agg(F.avg("x").alias("m"))
        )
        paired = per_dim.groupBy("pos").agg(
            F.max(F.when(F.col("batch") == "0", F.col("m"))).alias("m0"),
            F.max(F.when(F.col("batch") == "1", F.col("m"))).alias("m1"),
        )
        return paired.agg(
            F.sum((F.col("m0") - F.col("m1")) * (F.col("m0") - F.col("m1"))).alias("g")
        )

    before = centroid_gap("vec").select(F.col("g").alias("g_before"))
    after = centroid_gap("corrected").select(F.col("g").alias("g_after"))
    counts = corrected.agg(
        F.count("*").alias("n_vecs"),
        (
            F.sum(
                F.when(F.size("corrected") != F.size("vec"), 1).otherwise(0)
            )
            == 0
        ).alias("dims_ok"),
    )
    return (
        counts.crossJoin(F.broadcast(before))
        .crossJoin(F.broadcast(after))
        .select(
            "n_vecs",
            "dims_ok",
            (F.col("g_after") <= F.col("g_before") + 1e-9).alias("gap_shrunk"),
        )
    )


@register(
    "factor_decomposition",
    # exact-recovery oracle (VERDICT r2 item 2): the input matrix is
    # PLANTED exactly rank-2 nonnegative (M[r,c] = u1·v1 + u2·v2 with
    # small-integer factors), so a rank-4 nonnegative ALS must reconstruct
    # it; measured max |residual| is ~4e-5 (float32 factors + reg 1e-6),
    # an order of magnitude inside the ROUND(.,3) = 0.000 certificate. The
    # oracle asserts per-row perfect reconstruction — a wrong factorization
    # (wrong solve, id collision, dropped block) breaks it immediately.
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey, 0.0 AS max_abs_resid
    FROM part WHERE p_partkey < 60
    """,
    tags=("composite", "M20", "ml", "factorization"),
)
def factor_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITFAM-analog low-rank factorization (reference M20: R/bitfam.R:3-13)
    certified by exact recovery: a planted rank-2 nonnegative part×supplier
    matrix is factorized with rank-4 nonnegative ALS and every row's max
    reconstruction residual must round to 0.000 — the distributed
    block-partitioned solve provably recovered the planted structure.
    Real-data (non-low-rank) behavior stays property-tested in
    tests/test_ml.py (planted-noise recovery)."""
    from utils_spark.operators.ml import als_factorize

    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 60).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    r, c = F.col("p_partkey"), F.col("s_suppkey")
    mat = F.broadcast(p).crossJoin(s).select(
        "p_partkey",
        "s_suppkey",
        (
            (1 + F.pmod(r, F.lit(7))) * (1 + F.pmod(c, F.lit(5)))
            + (1 + F.pmod(r, F.lit(3))) * (1 + F.pmod(c, F.lit(4)))
        ).cast("double").alias("qty"),
    )
    row_f, col_f = als_factorize(
        mat, "p_partkey", "s_suppkey", "qty", rank=4, reg=1e-6, max_iter=20
    )
    rf = row_f.withColumnRenamed("features", "rf")
    cf = col_f.withColumnRenamed("features", "cf")
    pred = F.aggregate(
        F.zip_with(to_double_array("rf"), to_double_array("cf"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    resid = (
        mat.join(rf, "p_partkey")
        .join(cf, "s_suppkey")
        .withColumn("resid", F.abs(F.col("qty") - pred))
        .groupBy(F.col("p_partkey").cast("long").alias("p_partkey"))
        .agg(F.round(F.max("resid"), 3).alias("max_abs_resid"))
    )
    return resid


@register(
    "pca_embedding",
    # invariant-certificate oracle (was rows-only): eigenvector sign and
    # rotation are implementation-defined so raw projections cannot be
    # hash-compared across engines — but the invariants EVERY correct
    # truncated PCA satisfies can: explained-variance ratios sorted
    # descending and summing <= 1, a fixed output dimensionality on every
    # row, and var(pc1) >= var(pc2) (projection variances are the
    # eigenvalues — translation-invariant, so centering convention doesn't
    # matter). Per-label row counts are the real cross-engine value check.
    # Value-level correctness of the projection itself is anchored by the
    # planted-subspace `pca_exact_recovery` certificate.
    oracle="""
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
           true AS dims_ok, true AS ratios_sorted, true AS ratios_bounded,
           true AS var_ordered
    FROM embeddings GROUP BY label
    """,
    tags=("composite", "M1", "ml"),
)
def pca_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib truncated PCA over the real embeddings table (reference M1:
    R/wrapper.R:285-291 prcomp_irlba), certified by PCA invariants per
    label stratum: component count, ratio ordering/bounds, and
    eigenvalue-ordered projection variances."""
    from utils_spark.operators.ml import pca_embed

    e = load_table(spark, sf_dir, "embeddings")
    out, ratios = pca_embed(e, "embedding", n_components=2)
    ratios_sorted = all(
        ratios[i] >= ratios[i + 1] - 1e-12 for i in range(len(ratios) - 1)
    )
    ratios_bounded = (
        all(-1e-12 <= r <= 1 + 1e-12 for r in ratios) and sum(ratios) <= 1 + 1e-9
    )
    stats = out.select(
        "label",
        F.size("pca").alias("sz"),
        F.element_at("pca", 1).alias("pc1"),
        F.element_at("pca", 2).alias("pc2"),
    )
    glob = stats.agg(F.var_samp("pc1").alias("v1"), F.var_samp("pc2").alias("v2"))
    per = stats.groupBy("label").agg(
        F.count("*").alias("n"),
        ((F.min("sz") == 2) & (F.max("sz") == 2)).alias("dims_ok"),
    )
    return per.crossJoin(F.broadcast(glob)).select(
        "label",
        "n",
        "dims_ok",
        F.lit(bool(ratios_sorted)).alias("ratios_sorted"),
        F.lit(bool(ratios_bounded)).alias("ratios_bounded"),
        (F.col("v1") >= F.col("v2") - 1e-6 * (F.col("v1") + F.col("v2") + 1)).alias(
            "var_ordered"
        ),
    )


@register(
    "clustree_transitions",
    # exact oracle: the two clustering resolutions are planted nested
    # md5-bucket labelings (k6 strictly refines k3), so every transition
    # edge the clustree operator emits is SQL-derivable. KMeans labelings
    # (arbitrary label ids) stay covered by cluster_pipeline + property
    # tests; this certifies the M7 transition-graph operator itself.
    oracle="""
    WITH lab AS (
      SELECT CAST(CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) % 3
               AS INT) AS k3,
             CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':b'), 1, 15) AS BIGINT) % 2
               AS bit
      FROM embeddings
    )
    SELECT k3 AS from_label, CAST(k3 * 2 + bit AS INT) AS to_label,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lab GROUP BY 1, 2
    """,
    tags=("composite", "M5", "M6", "M7", "ml"),
)
def clustree_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-tree transition edges across two clustering resolutions
    (reference M7: R/wrapper.R:350-359 clustree). The resolutions here are
    deterministic md5-bucket labelings with planted nesting (each k3
    community splits into two k6 communities) so the transition counts have
    an exact SQL oracle — certifying the cross-resolution transition
    operator and the cross-engine md5 bucketing it rides on. KMeans-label
    sweeps (arbitrary ids, not SQL-oracle-able) remain exercised by
    cluster_pipeline and the blob property tests."""
    from utils_spark.functions import md5_long
    from utils_spark.operators.ml import cluster_transition_counts

    e = load_table(spark, sf_dir, "embeddings")
    key = F.col("vec_id").cast("string")
    k3 = F.pmod(md5_long(key), F.lit(3)).cast("int")
    bit = F.pmod(md5_long(F.concat(key, F.lit(":b"))), F.lit(2))
    labeled = e.select(k3.alias("k3"), (k3 * 2 + bit).cast("int").alias("k6"))
    return cluster_transition_counts(labeled, "k3", "k6")


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
    # exact oracle via planted collinear geometry (VERDICT r2 item 2):
    # positions are the integer vec_ids along one axis, clusters are the 4
    # contiguous quartiles. The centroid MST is then the path 0-1-2-3 (one
    # lineage), the resampled centroid polyline IS the segment from the
    # cluster-0 centroid a0 to the cluster-3 centroid a3, and the
    # projection arc-length has the closed form
    #   pt = clamp(pos - a0, 0, a3 - a0)
    # which the oracle reproduces with least/greatest. Centroid averages
    # are exact (integer sums < 2^53), so both engines agree to the last
    # ulp modulo the polyline's ~1e-12 cumsum drift — absorbed by ROUND 6.
    # The iterative refit path (n_iter > 0) is not SQL-expressible and
    # stays covered by the numpy-replica + monotonicity tests.
    oracle="""
    WITH pos AS (
      SELECT vec_id, CAST(vec_id AS DOUBLE) AS p,
             CAST((vec_id * 4) // (SELECT COUNT(*) FROM embeddings) AS INT) AS cl
      FROM embeddings
    ),
    ends AS (
      SELECT (SELECT AVG(p) FROM pos WHERE cl = 0) AS a0,
             (SELECT AVG(p) FROM pos WHERE cl = 3) AS a3
    ),
    pt AS (
      SELECT cl, LEAST(GREATEST(p - a0, 0), a3 - a0) AS pt
      FROM pos, ends
    )
    SELECT 0 AS lineage_id, cl, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(pt), 6) AS mean_pt,
           ROUND(MEDIAN(pt), 6) AS median_pt
    FROM pt GROUP BY cl
    """,
    tags=("composite", "M12", "ml", "trajectory"),
)
def pseudotime_lineages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lineage principal-curve pseudotime (reference M12:
    R/slingshot.R:8-55 getLineages + getCurves), certified on a planted
    collinear trajectory: positions = vec_id along one axis, clusters = the
    4 contiguous quartiles. The REAL operator runs (centroid MST → lineage
    path → polyline resampling → vectorized projection); collinearity gives
    the projection arc-length a closed form the SQL oracle reproduces
    exactly. Iterative refits (n_iter > 0, not SQL-expressible) stay
    covered by the numpy-replica and monotonicity tests in tests/test_ml.py."""
    from utils_spark.operators.ml import principal_curve_pseudotime

    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    n_total = e.count()
    planted = e.select(
        "vec_id",
        ((F.col("vec_id") * 4) / n_total).cast("long").cast("int").alias("cl"),
        F.array(
            F.col("vec_id").cast("double"), F.lit(0.0), F.lit(0.0), F.lit(0.0)
        ).alias("vec"),
    )
    pt = principal_curve_pseudotime(
        planted, "vec_id", "vec", "cl", start_cluster=0, approx_points=20, n_iter=0
    )
    lab = planted.select(F.col("vec_id"), "cl")
    return (
        pt.join(lab, "vec_id")
        .groupBy("lineage_id", "cl")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("pseudotime"), 6).alias("mean_pt"),
            F.round(F.expr("percentile(pseudotime, 0.5)"), 6).alias("median_pt"),
        )
    )


@register(
    "louvain_communities",
    # exact oracle via a PLANTED community structure (VERDICT r2 item 2):
    # embeddings are rebuilt as disjoint 5-point micro-clusters separated by
    # >=1e4 (within-diameter 4), so the true KNN graph is the 5-clique of
    # each micro-cluster, the SNN graph is exactly those cliques, and the
    # modularity-optimal partition of disjoint cliques is provably the
    # cliques themselves (merging disconnected communities strictly lowers
    # Q; intra-clique splits lose to local moving since 2m >> (s-1)^2).
    # The full REAL pipeline (LSH KNN -> SNN -> distributed Louvain) runs;
    # the oracle derives the provable answer from the planted layout. The
    # size histogram is robust to a (probability ~1e-5) missed LSH edge —
    # the clique stays SNN-connected, so its community is unchanged.
    oracle="""
    WITH cl AS (SELECT vec_id, vec_id // 5 AS q FROM embeddings),
    s AS (SELECT q, COUNT(*) AS sz, SUM(vec_id) AS cs FROM cl GROUP BY q)
    SELECT CAST(sz AS BIGINT) AS size, CAST(COUNT(*) AS BIGINT) AS n_communities,
           CAST(SUM(cs) AS BIGINT) AS checksum
    FROM s GROUP BY sz
    """,
    tags=("composite", "M5", "ml", "louvain"),
)
def louvain_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Louvain modularity communities over a KNN→SNN graph (reference M5:
    R/wrapper.R:296-303 FindClusters algorithm 1 = Louvain), certified
    end-to-end: vectors are planted disjoint 5-point micro-clusters
    (separation ≥ 1e4, diameter 4), the LSH-KNN (k=4) graph of which is the
    per-cluster 5-clique, SNN keeps exactly those cliques, and Louvain's
    modularity-optimal partition of disjoint cliques is provably the
    cliques — so the community-size histogram + member checksum have an
    exact SQL oracle. Real-data (non-provable) community behavior stays
    property-tested in tests/test_ml.py (Q ≥ label-prop's Q, blob purity)."""
    from utils_spark.operators.ml import knn_graph, louvain_communities as louvain
    from utils_spark.operators.ml import snn_graph

    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    q = (F.col("vec_id") / 5).cast("long")  # micro-cluster id (vec_id // 5)
    m = F.pmod(F.col("vec_id"), F.lit(5)).cast("double")  # member offset 0..4
    planted = e.select(
        "vec_id",
        F.array(
            (F.pmod(q, F.lit(50)) * 10000.0 + m).cast("double"),
            ((q / 50).cast("long") * 10000.0).cast("double"),
            F.lit(0.0),
            F.lit(0.0),
        ).alias("vec"),
    )
    from utils_spark.plans import cut_lineage, scaled_shuffle_partitions

    # the KNN/SNN build shuffles the bounded vector set several times —
    # size its parallelism from the measured vector count (no-op at scale;
    # louvain() applies the same guard to its own sweeps internally)
    n_vec = planted.count()
    from utils_spark.plans import interpreted_execution

    # measurement-gated guards (both strict NO-OPs at corpus scale): sized
    # shuffle parallelism AND interpreted execution — every plan in this
    # pipeline is one-shot over the measured bounded vector set, so
    # whole-stage codegen only buys per-plan compile latency here
    with scaled_shuffle_partitions(spark, n_vec, 5_000), interpreted_execution(spark, n_vec, 100_000):
        # checkpoint the KNN edges before the SNN self-join: un-materialized,
        # the LSH-join subplan appears TWICE in the self-join (double
        # planning; exchange reuse only partially saves execution)
        edges = cut_lineage(knn_graph(planted, "vec_id", "vec", k=4, bucket_length=250.0))
        snn = snn_graph(edges, min_shared=1).withColumnRenamed("shared", "weight")
        asg = louvain(snn, planted, "vec_id", weight_col="weight", max_iter=10, levels=2)
        sizes = asg.groupBy("community").agg(
            F.count("*").alias("size"), F.sum("node").alias("member_checksum")
        )
        out = sizes.groupBy("size").agg(
            F.count("*").alias("n_communities"),
            F.sum("member_checksum").cast("long").alias("checksum"),
        )
        # materialize INSIDE the guard: the lazy plan would otherwise run
        # its shuffles under the restored session-wide setting
        return cut_lineage(out)


@register(
    "knn_snn_lisi",
    # exact oracle via planted geometry (VERDICT r2 item 2): 5 label
    # clusters separated by ~1000 with within-diameter < 35, so every true
    # k=10 neighborhood is label-pure and LISI = 1/sum(p^2) = 1.0 exactly
    # for every node. A pass certifies (a) the LSH KNN returned ONLY true
    # within-cluster neighbors (purity: one cross-cluster edge in any
    # top-10 would break the 1.0), (b) every node found >= 1 neighbor
    # (the per-label n), and (c) the LISI aggregation math. Mixed-label
    # (non-provable) LISI behavior stays property-tested in tests/test_ml.py.
    oracle="""
    SELECT CAST(vec_id % 5 AS INT) AS label, 1.0 AS median_lisi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM embeddings GROUP BY 1
    """,
    tags=("composite", "M4", "M11", "ml"),
)
def knn_snn_lisi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNN graph → label-diversity (LISI) per node (reference M4/M11:
    R/wrapper.R:294 FindNeighbors + R/integrate.R:188-212 compute_lisi),
    certified on planted well-separated label clusters: label = vec_id % 5,
    cluster centers 1000 apart, within-cluster spread < 35 — every true
    neighborhood is label-pure, so per-label median LISI is provably 1.0
    and the oracle is exact. Certifies LSH-KNN neighborhood purity plus the
    LISI aggregation pipeline cross-engine."""
    from utils_spark.operators.ml import knn_graph, lisi_score

    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    g = F.pmod(F.col("vec_id"), F.lit(5))
    planted = e.select(
        "vec_id",
        g.cast("int").alias("label"),
        F.array(
            (g * 1000 + F.pmod(F.col("vec_id"), F.lit(23))).cast("double"),
            F.pmod(F.col("vec_id"), F.lit(19)).cast("double"),
            F.pmod(F.col("vec_id"), F.lit(17)).cast("double"),
            F.lit(0.0),
        ).alias("vec"),
    )
    edges = knn_graph(planted, "vec_id", "vec", k=10, bucket_length=1000.0)
    lisi = lisi_score(edges, planted, "vec_id", "label")
    labeled = lisi.join(planted.select(F.col("vec_id").alias("src"), "label"), "src")
    return labeled.groupBy("label").agg(
        F.round(F.expr("percentile(lisi, 0.5)"), 4).alias("median_lisi"),
        F.count("*").alias("n"),
    )


@register(
    "denoised_feature_selection",
    # invariant-certificate oracle (was rows-only): the robust loess trend
    # is iterative with no SQL form, but the pipeline's contract is fully
    # checkable — the feature universe (count of l_partkeys with a defined
    # sample variance, i.e. >= 2 rows) is a real cross-engine value, the
    # variance decomposition bio_var = total - trend must hold exactly on
    # every feature, and the 20 returned features must dominate every
    # non-returned feature by bio_var (the selection IS a top-k). Trend
    # recovery on planted signal is anchored by `loess_exact_recovery`.
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_features,
           CAST(20 AS BIGINT) AS n_selected,
           true AS decomposition_exact, true AS selection_is_topk,
           true AS trend_defined
    FROM (SELECT l_partkey FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 2) t
    """,
    tags=("composite", "M2", "modelfit"),
)
def denoised_feature_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full modelGeneVar pipeline on real lineitem (reference M2:
    R/wrapper.R:259-264): per-feature mean/variance -> robust loess
    technical trend -> biological variance = total - trend -> top-20
    features by bio_var, certified by decomposition exactness + top-k
    dominance + the real feature-universe count."""
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
    from utils_spark.plans import scratch_persist

    ranked = scratch_persist(fitted.withColumn("rnk", F.row_number().over(w)))
    sel = F.col("rnk") <= 20
    return ranked.agg(
        F.count("*").alias("n_features"),
        F.sum(F.when(sel, 1).otherwise(0)).cast("long").alias("n_selected"),
        (
            F.max(F.abs(F.col("variance") - F.col("trend") - F.col("bio_var"))) < 1e-9
        ).alias("decomposition_exact"),
        (
            F.min(F.when(sel, F.col("bio_var")))
            >= F.coalesce(F.max(F.when(~sel, F.col("bio_var"))), F.lit(float("-inf")))
        ).alias("selection_is_topk"),
        (F.sum(F.when(F.col("trend").isNull() | F.isnan("trend"), 1).otherwise(0)) == 0).alias(
            "trend_defined"
        ),
    )


@register(
    "spline_exact_recovery",
    # exact-recovery certificate for the M14 spline solver (same pattern as
    # factor_decomposition): y is planted EXACTLY linear in x, and linear
    # functions are natural cubic splines (zero second derivative, linear
    # tails), i.e. provably inside the span of {1, ns_1..ns_4} for ANY knot
    # placement — so the least-squares fit must reproduce y to float
    # precision: r2 rounds to 1, the F p-value underflows to 0. A wrong
    # basis, knot rule, solve, or F machinery breaks the certificate.
    oracle="""
    SELECT event_type AS grp, COUNT(*) AS n, 1.0 AS r2, 0.0 AS pvalue
    FROM events GROUP BY event_type
    """,
    tags=("composite", "M14", "modelfit", "spline", "certificate"),
)
def spline_exact_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Natural-cubic-spline exact recovery (reference M14:
    R/tradeseq.R:43-128): per event_type, fit y = 2 + 3x (x = fractional
    hour-of-day) with the ns(df=4) solver used by `spline_trend_fits`.
    Linear y lies exactly in the spline span, so every group must report
    a perfect fit — certifying basis construction, knot placement, the
    grouped least-squares solve and the exact F-test end-to-end with a
    SQL-trivial oracle. Real-data smooth fits stay in `spline_trend_fits`."""
    from utils_spark.operators.modelfit import grouped_splinefit

    e = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        (F.hour("ts") + F.minute("ts") / 60.0).alias("x"),
    )
    planted = e.withColumn("y", F.lit(2.0) + F.lit(3.0) * F.col("x"))
    fits = grouped_splinefit(planted, "grp", "x", "y", spline_df=4)
    return fits.select(
        F.col("group").alias("grp"),
        F.col("n").cast("long").alias("n"),
        F.round("r2", 6).alias("r2"),
        F.round("pvalue", 6).alias("pvalue"),
    )


@register(
    "pca_exact_recovery",
    # exact-recovery certificate for the M1 PCA stack: inputs are planted
    # EXACTLY in a 2-D (non-axis-aligned) subspace, so top-2 PCA must (a)
    # explain all variance and (b) be an isometry on point differences —
    # both rotation/sign-free invariants with a constant SQL oracle. A
    # wrong gram accumulation, eigen-solve, or projection breaks either.
    oracle="""
    SELECT COUNT(*) AS n_vecs, 1.0 AS var_ratio_top2, 0.0 AS max_dist_err
    FROM embeddings
    """,
    tags=("composite", "M1", "ml", "pca", "certificate"),
)
def pca_exact_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA exact recovery (reference M1: R/wrapper.R:285-291
    prcomp_irlba): vectors v = a·u1 + b·u2 (a, b small integers from
    vec_id; u1, u2 fixed independent 6-dim directions) span a 2-D
    subspace, so PCA(k=2) must report explained-variance ratio 1 and
    preserve consecutive-pair distances exactly (projection onto the
    containing subspace is an isometry on differences, regardless of the
    rotation/sign MLlib picks — which is why raw coordinates can't be
    oracled but these invariants can). Real-data PCA stays rows-only in
    `pca_embedding`."""
    from utils_spark.operators.ml import pca_embed

    u1 = [1.0, 2.0, 0.0, 1.0, 0.0, 3.0]
    u2 = [0.0, 1.0, 1.0, 0.0, 2.0, 1.0]
    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    a = (F.pmod(F.col("vec_id"), F.lit(7)) + 1).cast("double")
    b = (F.pmod(F.col("vec_id"), F.lit(11)) + 1).cast("double")
    planted = e.select(
        "vec_id",
        F.array(*[a * F.lit(x1) + b * F.lit(x2) for x1, x2 in zip(u1, u2)]).alias("vec"),
    )
    embedded, ratios = pca_embed(planted, "vec", n_components=2, out_col="pca")
    nxt = embedded.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("vec").alias("vec_n"),
        F.col("pca").alias("pca_n"),
    )

    def _dist(x, y):
        return F.sqrt(
            F.aggregate(
                F.zip_with(x, y, lambda p, q: (p - q) * (p - q)),
                F.lit(0.0),
                lambda acc, z: acc + z,
            )
        )

    pairs = embedded.join(nxt, "vec_id").select(
        (_dist(F.col("pca"), F.col("pca_n")) - _dist(F.col("vec"), F.col("vec_n"))).alias("err")
    )
    return (
        embedded.agg(F.count("*").alias("n_vecs"))
        .crossJoin(F.broadcast(pairs.agg(F.round(F.max(F.abs("err")), 6).alias("max_dist_err"))))
        .select(
            "n_vecs",
            F.lit(round(float(sum(ratios[:2])), 6)).alias("var_ratio_top2"),
            "max_dist_err",
        )
    )


@register(
    "harmony_null_correction",
    # null-invariance certificate for the M8 Harmony stack: the two
    # batches are EXACT copies of the same point set, so every
    # per-(cluster, batch) soft centroid equals the cluster centroid, the
    # diversity penalty's O/E ratio is exactly 1, and the correction must
    # be identically zero. Any asymmetry bug in responsibilities, the
    # penalty, offset estimation, or offset application yields a nonzero
    # correction and breaks the constant oracle.
    oracle="""
    SELECT 2 * COUNT(*) AS n_points, 0.0 AS max_abs_correction
    FROM embeddings WHERE vec_id < 200
    """,
    tags=("composite", "M8", "integration", "certificate"),
)
def harmony_null_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmony null-correction invariance (reference M8:
    R/integrate.R:100-123 RunHarmony): run the full soft-assignment +
    diversity-penalty + mixture-of-offsets model on two batches that are
    exact duplicates of one point set. A correct implementation corrects
    nothing — max |corrected − original| rounds to 0 — certifying the
    whole iterative stack against a constant SQL oracle. Real-batch
    behavior stays property-tested behind `batch_correction`."""
    from utils_spark.operators.ml import harmony_soft

    base = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select(
            "vec_id",
            F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double")).alias("vec"),
        )
    )
    dup = base.select((F.col("vec_id") + 1000).alias("vec_id"), "vec")
    both = base.withColumn("batch", F.lit("a")).unionByName(
        dup.withColumn("batch", F.lit("b"))
    )
    corrected = harmony_soft(both, "vec_id", "vec", "batch", k=4, n_iter=2, sigma=1.0, theta=1.0)
    err = F.aggregate(
        F.zip_with("corrected", "vec", lambda c, v: F.abs(c - v)),
        F.lit(0.0),
        lambda acc, z: F.greatest(acc, z),
    )
    return corrected.agg(
        F.count("*").alias("n_points"),
        F.round(F.max(err), 6).alias("max_abs_correction"),
    )


@register(
    "loess_exact_recovery",
    # exact-recovery certificate for the M2 loess trend: variance is
    # planted EXACTLY linear in the mean, and tricube-weighted local
    # LINEAR regression reproduces any global line exactly (weighted
    # least squares through collinear points is the line; zero residuals
    # keep every robustness pass at identity) — so bio_var must round to
    # 0 for every feature. Wrong neighborhoods, weights, or robustness
    # logic all break the constant oracle.
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS n_features, 0.0 AS max_abs_bio
    FROM lineitem WHERE l_partkey <= 2000
    """,
    tags=("composite", "M2", "modelfit", "loess", "certificate"),
)
def loess_exact_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loess trend exact recovery (reference M2: R/wrapper.R:259-264
    scran::modelGeneVar): per-feature means come from real lineitem
    aggregates, but the 'variance' is planted as 0.5 + 2·mean — exactly
    linear — so the degree-1 loess trend must equal it and biological
    variance must vanish everywhere. Certifies the neighborhood/tricube/
    robustness machinery with a SQL-trivial oracle; real-data trend fits
    stay rows-only in `denoised_feature_selection`."""
    from utils_spark.operators.modelfit import loess_trend

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") <= 2000)
    mv = li.groupBy(F.col("l_partkey").cast("string").alias("feature")).agg(
        F.avg("l_quantity").alias("mean")
    )
    planted = mv.withColumn("var", F.lit(0.5) + F.lit(2.0) * F.col("mean"))
    fitted = loess_trend(planted, "feature", "mean", "var")
    return fitted.agg(
        F.count("*").cast("long").alias("n_features"),
        F.round(F.max(F.abs("bio_var")), 6).alias("max_abs_bio"),
    )


@register(
    "cca_anchor_identity",
    # identity-anchor certificate for the M9 CCA anchor stack (the last
    # implemented ML operator with no driver surface): the query batch is
    # an EXACT duplicate of the reference batch, so (a) per-batch
    # standardization + joint PCA produce bit-identical coordinates for
    # every duplicate pair, (b) each pair is mutually nearest at distance
    # 0 — always an LSH candidate (identical vectors share every hash) and
    # never pruned by the median-distance filter (0 <= 1.5*median) — so
    # ALL n identity pairs must appear among the anchors with exactly zero
    # displacement. A wrong KNN direction, intersection, filter, or joint
    # space breaks the constant oracle.
    oracle="""
    SELECT COUNT(*) AS n_cells, COUNT(*) AS n_identity_anchors, 0.0 AS max_abs_disp
    FROM embeddings WHERE vec_id < 200
    """,
    tags=("composite", "M9", "integration", "certificate"),
)
def cca_anchor_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCA anchor identity certificate (reference M9: R/integrate.R:125-153
    Seurat FindIntegrationAnchors): run the real joint-space + MNN-anchor
    stack (`cca_integrate_lite` -> `mnn_anchors`) on two batches that are
    exact copies of one point set. Every point's duplicate must be found
    as an anchor (mutual nearest at distance zero, surviving the distance
    filter) with zero displacement in the joint space. Real-batch anchor
    correction stays property-tested in tests/test_ml.py."""
    from utils_spark.operators.ml import cca_integrate_lite, mnn_anchors

    base = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select(
            "vec_id",
            F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double")).alias("vec"),
        )
    )
    dup = base.select((F.col("vec_id") + 1000).alias("vec_id"), "vec")
    both = base.withColumn("batch", F.lit("a")).unionByName(
        dup.withColumn("batch", F.lit("b"))
    )
    joint, _ratios = cca_integrate_lite(both, "vec_id", "vec", "batch", n_components=4)
    zs = joint.select("vec_id", "batch", to_double_array("integrated").alias("__v"))
    ref = zs.filter(F.col("batch") == "a").select(F.col("vec_id").alias("__key"), "__v")
    q = zs.filter(F.col("batch") == "b").select(F.col("vec_id").alias("__key"), "__v")
    anchors = mnn_anchors(ref, q, k_anchor=3)
    ident = anchors.filter(F.col("__q") == F.col("__r") + 1000)
    disp = (
        ident.join(ref.select(F.col("__key").alias("__r"), F.col("__v").alias("__zr")), "__r")
        .join(q.select(F.col("__key").alias("__q"), F.col("__v").alias("__zq")), "__q")
        .select(
            F.aggregate(
                F.zip_with("__zr", "__zq", lambda a, b: F.abs(a - b)),
                F.lit(0.0),
                lambda acc, z: F.greatest(acc, z),
            ).alias("d")
        )
    )
    return (
        base.agg(F.count("*").alias("n_cells"))
        .crossJoin(F.broadcast(ident.agg(F.count("*").alias("n_identity_anchors"))))
        .crossJoin(F.broadcast(disp.agg(F.round(F.coalesce(F.max("d"), F.lit(0.0)), 6).alias("max_abs_disp"))))
    )


@register(
    "cluster_blobs_certificate",
    # exact-recovery certificate for the E3 cluster pipeline (PCA ->
    # divisive/hierarchical clustering -> KMeans -> clustree edges): the
    # input is a planted 2-level blob hierarchy (3 super-blobs 100 apart,
    # each split into 2 sub-blobs 40 apart, jitter 0.2), so BisectingKMeans
    # at k=3 must recover the supers, KMeans at k=6 the subs, every cluster
    # must be label-pure, and the cross-resolution transition table must
    # have exactly 6 pure edges. Certifies M1+M6+M7 and the composed E3
    # stack (`cluster_pipeline` stays rows-only for real data).
    oracle="""
    SELECT COUNT(*) AS n_points,
           CAST(3 AS BIGINT) AS lo_clusters, CAST(6 AS BIGINT) AS hi_clusters,
           CAST(6 AS BIGINT) AS n_edges, true AS lo_pure, true AS hi_pure
    FROM embeddings
    """,
    tags=("composite", "E3", "M1", "M6", "M7", "ml", "certificate"),
)
def cluster_blobs_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-pipeline exact recovery (reference E3: R/wrapper.R:259-264
    get_denoisedPCs -> 267-324 get_clusters -> 350-359 get_clustree):
    planted hierarchical blobs through the real PCA -> BisectingKMeans(3)
    -> KMeans(6) -> transition-count stack; recovered structure is provable
    so the oracle is constant SQL."""
    from utils_spark.operators.ml import (
        bisecting_clusters,
        cluster_transition_counts,
        kmeans_clusters,
        pca_embed,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    sup = F.pmod(F.col("vec_id"), F.lit(3))
    sub = F.pmod(F.col("vec_id"), F.lit(6))  # sub s belongs to super s % 3

    def jit(p: int):
        return (F.pmod(F.col("vec_id") * p, F.lit(97)).cast("double") / 97.0 - 0.5) * 0.2

    vec = F.array(
        F.when(sup == 0, 100.0).otherwise(0.0) + jit(7),
        F.when(sup == 1, 100.0).otherwise(0.0) + jit(11),
        F.when(sup == 2, 100.0).otherwise(0.0) + jit(13),
        F.when(sub < 3, 20.0).otherwise(-20.0) + jit(17),
        jit(19),
        jit(23),
    )
    planted = e.select(
        "vec_id", sup.alias("true_super"), sub.alias("true_sub"), vec.alias("vec")
    )
    embedded, _ratios = pca_embed(planted, "vec", n_components=4)
    lo = bisecting_clusters(embedded, "pca", k=3, out_col="res_lo")
    hi = kmeans_clusters(lo, "pca", k=6, out_col="res_hi")
    edges = cluster_transition_counts(hi, "res_lo", "res_hi")
    lo_pure = (
        hi.groupBy("res_lo")
        .agg(F.countDistinct("true_super").alias("k"))
        .agg((F.max("k") == 1).alias("lo_pure"))
    )
    hi_pure = (
        hi.groupBy("res_hi")
        .agg(F.countDistinct("true_sub").alias("k"))
        .agg((F.max("k") == 1).alias("hi_pure"))
    )
    return (
        hi.agg(
            F.count("*").alias("n_points"),
            F.countDistinct("res_lo").alias("lo_clusters"),
            F.countDistinct("res_hi").alias("hi_clusters"),
        )
        .crossJoin(F.broadcast(edges.agg(F.count("*").alias("n_edges"))))
        .crossJoin(F.broadcast(lo_pure))
        .crossJoin(F.broadcast(hi_pure))
    )


@register(
    "harmony_shift_recovery",
    # closed-form offset certificate for the M8 correction arithmetic,
    # complementing `harmony_null_correction` (which certifies the
    # symmetric null where every offset is zero): with k=1 the soft
    # responsibility is EXACTLY 1 (softmax over one logit), the single
    # per-batch offset is batch_mean - global_mean = +-c/2 for a planted
    # constant shift c, so the correction must map both copies of every
    # point to the SAME location — max pairwise gap rounds to 0. Wrong
    # offset estimation, sign, or application breaks the constant oracle
    # with any nonzero c.
    oracle="""
    SELECT COUNT(*) AS n_pairs, 0.0 AS max_pair_gap
    FROM embeddings WHERE vec_id < 300
    """,
    tags=("composite", "M8", "integration", "certificate"),
)
def harmony_shift_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmony constant-shift recovery (reference M8: R/integrate.R:100-123
    RunHarmony): batch b is batch a translated by a fixed vector; with a
    single mixture component the correction is closed-form (subtract the
    half-shift from each side), so corrected duplicate pairs must coincide
    exactly — certifying offset estimation + application end-to-end."""
    from utils_spark.operators.ml import harmony_soft

    shift = [10.0, -5.0, 3.0, 0.0, 2.0, -8.0, 1.0, 4.0]
    base = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 300)
        .select(
            "vec_id",
            F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double")).alias("vec"),
        )
    )
    shifted = base.select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.zip_with(
            "vec", F.array(*[F.lit(s) for s in shift]), lambda a, b: a + b
        ).alias("vec"),
    )
    both = base.withColumn("batch", F.lit("a")).unionByName(
        shifted.withColumn("batch", F.lit("b"))
    )
    corrected = harmony_soft(both, "vec_id", "vec", "batch", k=1, n_iter=2, sigma=1.0)
    ca = corrected.filter(F.col("batch") == "a").select("vec_id", F.col("corrected").alias("ca"))
    cb = corrected.filter(F.col("batch") == "b").select(
        (F.col("vec_id") - 1000).alias("vec_id"), F.col("corrected").alias("cb")
    )
    gap = F.aggregate(
        F.zip_with("ca", "cb", lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, z: F.greatest(acc, z),
    )
    return ca.join(cb, "vec_id").agg(
        F.count("*").alias("n_pairs"),
        F.round(F.max(gap), 6).alias("max_pair_gap"),
    )


@register(
    "sweep_exact_recovery",
    # exact-recovery certificate for the M15 parameter sweep: y is planted
    # EXACTLY linear in x, and a degree-d polynomial least squares contains
    # the line for EVERY d >= 1 — so every (group, degree) cell of the
    # sweep grid must report a perfect fit with slope exactly 3. A wrong
    # grid fan-out, degree wiring, solve, or F machinery breaks it.
    oracle="""
    SELECT event_type AS grp, CAST(d.degree AS BIGINT) AS degree, COUNT(*) AS n,
           1.0 AS r2, 0.0 AS pvalue, 3.0 AS slope
    FROM events CROSS JOIN (SELECT unnest([1, 2, 3]) AS degree) d
    GROUP BY event_type, d.degree
    """,
    tags=("composite", "M15", "modelfit", "certificate"),
)
def sweep_exact_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Param-sweep exact recovery (reference M15: R/tradeseq.R:16 evaluateK
    / BiocParallel grid fan-out): per event_type, sweep polynomial degree
    over {1,2,3} on planted y = 2 + 3x. Every cell of the (group x degree)
    grid must recover the line perfectly — certifying the whole sweep
    plumbing with a SQL-trivial oracle. Real-data sweeps stay unit-tested
    in tests/test_modelfit.py."""
    from utils_spark.operators.modelfit import param_sweep_fits

    e = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        (F.hour("ts") + F.minute("ts") / 60.0).alias("x"),
    )
    planted = e.withColumn("y", F.lit(2.0) + F.lit(3.0) * F.col("x"))
    fits = param_sweep_fits(planted, "grp", "x", "y", degrees=[1, 2, 3])
    return fits.select(
        F.col("group").alias("grp"),
        F.col("degree").cast("long").alias("degree"),
        F.col("n").cast("long").alias("n"),
        F.round("r2", 6).alias("r2"),
        F.round("pvalue", 6).alias("pvalue"),
        F.round("slope", 6).alias("slope"),
    )


@register(
    "mds_exact_recovery",
    # exact-recovery certificate for the M10 embedding fallback: inputs are
    # planted EXACTLY in a 2-D subspace, so classical MDS into 2-D must be
    # an isometry — every pairwise distance is preserved to float
    # precision (double-centered Gram has exact rank 2; eigh recovers it).
    # sample_n >= the input size, so the deterministic sample is ALL rows
    # and the oracle's count is exact. Rotation/sign ambiguity cancels in
    # distances, which is why coordinates can't be oracled but this can.
    oracle="""
    SELECT COUNT(*) AS n_points, 0.0 AS max_dist_err
    FROM embeddings WHERE vec_id < 300
    """,
    tags=("composite", "M10", "ml", "mds", "certificate"),
)
def mds_exact_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical-MDS exact recovery (reference M10: R/integrate.R:161-177
    RunUMAP — SURVEY defers exact UMAP [no native lib in env] and
    prescribes the sampled deterministic embedding as the plot path):
    vectors v = a·u1 + b·u2 span a 2-D subspace, so the 2-D MDS embedding
    must preserve consecutive-pair distances exactly. Certifies the
    sampling, Gram double-centering, eigen-solve, and coordinate scaling
    end-to-end with a constant SQL oracle."""
    from utils_spark.operators.ml import classical_mds_2d

    u1 = [1.0, 2.0, 0.0, 1.0, 0.0, 3.0]
    u2 = [0.0, 1.0, 1.0, 0.0, 2.0, 1.0]
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300).select("vec_id")
    a = (F.pmod(F.col("vec_id"), F.lit(7)) + 1).cast("double")
    b = (F.pmod(F.col("vec_id"), F.lit(11)) + 1).cast("double")
    planted = e.select(
        "vec_id",
        F.array(*[a * F.lit(x1) + b * F.lit(x2) for x1, x2 in zip(u1, u2)]).alias("vec"),
    )
    mds = classical_mds_2d(planted, "vec_id", "vec", sample_n=1000)
    embedded = planted.join(
        mds.select(F.col("key").cast("long").alias("vec_id"), "mds1", "mds2"), "vec_id"
    )
    nxt = embedded.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("vec").alias("vec_n"),
        F.col("mds1").alias("m1n"),
        F.col("mds2").alias("m2n"),
    )

    def _dist6(x, y):
        return F.sqrt(
            F.aggregate(
                F.zip_with(x, y, lambda p, q: (p - q) * (p - q)),
                F.lit(0.0),
                lambda acc, z: acc + z,
            )
        )

    d2 = F.sqrt(
        (F.col("mds1") - F.col("m1n")) * (F.col("mds1") - F.col("m1n"))
        + (F.col("mds2") - F.col("m2n")) * (F.col("mds2") - F.col("m2n"))
    )
    pairs = embedded.join(nxt, "vec_id").select(
        (d2 - _dist6(F.col("vec"), F.col("vec_n"))).alias("err")
    )
    return embedded.agg(F.count("*").alias("n_points")).crossJoin(
        F.broadcast(pairs.agg(F.round(F.max(F.abs("err")), 6).alias("max_dist_err")))
    )


@register(
    "start_vs_end_test",
    # the operator is pure window + conditional aggregation, so the oracle
    # replicates it directly on real data (no certificate needed): same
    # percent_rank tie semantics, same Welch z arithmetic, 6dp rounding
    oracle="""
    WITH w AS (
      SELECT event_type AS grp, value,
             percent_rank() OVER (PARTITION BY event_type ORDER BY ts) AS q
      FROM events
    ),
    tagged AS (
      SELECT grp, value,
             CASE WHEN q <= 0.25 THEN 'start' WHEN q >= 0.75 THEN 'end' END AS seg
      FROM w WHERE q <= 0.25 OR q >= 0.75
    ),
    agg AS (
      SELECT grp,
             AVG(CASE WHEN seg = 'start' THEN value END) AS mean_start,
             AVG(CASE WHEN seg = 'end' THEN value END) AS mean_end,
             VAR_SAMP(CASE WHEN seg = 'start' THEN value END) AS var_start,
             VAR_SAMP(CASE WHEN seg = 'end' THEN value END) AS var_end,
             COUNT(CASE WHEN seg = 'start' THEN 1 END) AS n_start,
             COUNT(CASE WHEN seg = 'end' THEN 1 END) AS n_end
      FROM tagged GROUP BY grp
    )
    SELECT grp, CAST(n_start AS BIGINT) AS n_start, CAST(n_end AS BIGINT) AS n_end,
           ROUND(mean_end - mean_start, 6) AS delta,
           ROUND((mean_end - mean_start)
                 / sqrt(var_start / n_start + var_end / n_end), 6) AS z_stat
    FROM agg
    """,
    tags=("composite", "M14", "modelfit", "trajectory"),
)
def start_vs_end_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Start-vs-end differential test per trajectory (reference M14:
    R/tradeseq.R startVsEndTest): Welch z between the first and last 25%
    of each event_type's time-ordered values — window ntile + conditional
    aggregation, no UDF, directly replicated by the SQL oracle on real
    data."""
    from utils_spark.operators.modelfit import start_vs_end_test as sve

    e = load_table(spark, sf_dir, "events")
    out = sve(e, "event_type", "ts", "value", frac=0.25)
    return out.select(
        F.col("event_type").alias("grp"),
        F.col("n_start").cast("long").alias("n_start"),
        F.col("n_end").cast("long").alias("n_end"),
        F.round("delta", 6).alias("delta"),
        F.round("z_stat", 6).alias("z_stat"),
    )


@register(
    "condition_diff_recovery",
    # exact-recovery certificate for the M14 between-condition contrast:
    # each condition's y is planted EXACTLY linear with a different slope
    # (3 vs 5), so the per-condition least-squares fits must recover both
    # slopes and their difference to float precision. z is omitted: zero
    # residuals make it infinite by construction (se = 0), which has no
    # stable cross-engine representation.
    oracle="""
    SELECT event_type AS grp, 3.0 AS slope_a, 5.0 AS slope_b, -2.0 AS slope_diff,
           CAST(COUNT(CASE WHEN event_id % 2 = 0 THEN 1 END) AS BIGINT) AS n_a,
           CAST(COUNT(CASE WHEN event_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_b
    FROM events GROUP BY event_type
    """,
    tags=("composite", "M14", "modelfit", "certificate"),
)
def condition_diff_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Between-condition trajectory contrast exact recovery (reference
    M14: R/tradeseq.R:65-93 conditionTest): conditions are event-id
    parity, y is planted 2 + 3x under 'a' and 2 + 5x under 'b', and the
    grouped applyInPandas contrast must report slopes (3, 5) and
    difference -2 exactly for every group."""
    from utils_spark.operators.modelfit import condition_diff_test

    e = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"),
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("cond"),
        (F.hour("ts") + F.minute("ts") / 60.0).alias("x"),
        "event_id",
    )
    planted = e.withColumn(
        "y",
        F.lit(2.0) + F.when(F.col("cond") == "a", F.lit(3.0)).otherwise(F.lit(5.0)) * F.col("x"),
    )
    fits = condition_diff_test(planted, "grp", "cond", "x", "y", "a", "b")
    return fits.select(
        F.col("group").alias("grp"),
        F.round("slope_a", 6).alias("slope_a"),
        F.round("slope_b", 6).alias("slope_b"),
        F.round("slope_diff", 6).alias("slope_diff"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
    )


def _pagerank_oracle(n_iter: int = 5, damping: float = 0.85) -> str:
    """Generated N-step SQL twin of ``ml.pagerank`` on the customer↔supplier
    interaction graph: each CTE round applies
    r_{k+1}(v) = (1-d)/N + d·Σ_{u→v} r_k(u)/outdeg(u)."""
    head = """
    WITH pair AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    e AS (SELECT src, dst FROM pair
          UNION ALL SELECT dst AS src, src AS dst FROM pair),
    nd AS (SELECT DISTINCT src AS n FROM e),
    cnt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM nd),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS od FROM e GROUP BY src),
    r0 AS (SELECT n, 1.0 / nn AS r FROM nd CROSS JOIN cnt)"""
    steps = []
    for k in range(1, n_iter + 1):
        steps.append(f"""
    r{k} AS (
      SELECT nd.n AS n, {1.0 - damping} / nn + {damping} * COALESCE(m.m, 0) AS r
      FROM nd CROSS JOIN cnt LEFT JOIN (
        SELECT e.dst AS n, SUM(r.r / deg.od) AS m
        FROM e JOIN r{k - 1} r ON e.src = r.n JOIN deg ON deg.src = e.src
        GROUP BY e.dst
      ) m ON m.n = nd.n
    )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT n AS node,
           CASE WHEN n % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           ROUND(r, 8) AS rank
    FROM r{n_iter}
    ORDER BY ROUND(r, 8) DESC, n ASC LIMIT 15"""
    )


@register(
    "pagerank_interactions",
    # PageRank power iteration (5 rounds, d=0.85) over the bipartite
    # customer<->supplier interaction graph; deterministic top-15 by
    # (8dp-rounded rank desc, node asc). Oracle replays all 5 rounds in
    # generated SQL — the same N-step-CTE technique as bpe_training_rounds.
    oracle=_pagerank_oracle(5, 0.85),
    tags=("composite", "graph", "iterative", "pagerank"),
)
def pagerank_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the customer↔supplier interaction graph
    (edges both ways per distinct trading pair, node ids disambiguated by
    parity) — the canonical iterative graph primitive a large-scale
    engine is expected to run next to Louvain (no reference analog;
    north-star breadth). Five synchronous power-iteration rounds at
    d = 0.85 from the uniform start; top-15 nodes by 8dp-rounded rank
    with a node-id tie-break, so the cutoff is deterministic cross-engine.

    Scale shape: see ``ml.pagerank`` — per round one src-keyed join plus
    one dst-keyed bounded aggregation, outdeg checkpointed once, lineage
    cut per round, parallelism sized from the measured edge count."""
    from utils_spark.operators.ml import pagerank

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pair = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = pair.unionByName(pair.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    nodes = edges.select(F.col("src").alias("n"))
    r = pagerank(edges, nodes, "n", damping=0.85, n_iter=5)
    return (
        r.select(
            F.col("n").alias("node"),
            F.when(F.col("n") % 2 == 0, F.lit("customer")).otherwise(F.lit("supplier")).alias("node_type"),
            F.round("rank", 8).alias("rank"),
        )
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(15)
    )


@register(
    "triangle_count_knn",
    # exact triangle counting on the REAL LSH-KNN/SNN graph of planted
    # disjoint 5-cliques (same layout as louvain_communities): each
    # micro-cluster's SNN graph is provably its 5-clique -> C(5,3) = 10
    # triangles per clique, and each member sits in C(4,2) = 6 of them,
    # so the per-clique triangle-node checksum is 6 x (sum of member
    # ids) — the oracle derives everything from the embeddings table.
    oracle="""
    WITH cl AS (SELECT vec_id, vec_id // 5 AS q FROM embeddings),
    s AS (SELECT q, SUM(vec_id) AS member_sum FROM cl GROUP BY q)
    SELECT CAST(10 AS BIGINT) AS triangles_per_group,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(10 * COUNT(*) AS BIGINT) AS total_triangles,
           CAST(SUM(6 * member_sum) AS BIGINT) AS node_checksum
    FROM s
    """,
    tags=("composite", "graph", "triangles", "ml"),
)
def triangle_count_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting over the LSH-KNN → SNN graph — the classic
    distributed graph primitive (clustering-coefficient numerator,
    community cohesion), certified end-to-end on the planted
    micro-cluster layout of `louvain_communities`: the true SNN graph is
    400 disjoint 5-cliques, so every clique contributes exactly
    C(5,3) = 10 triangles and each member appears in C(4,2) = 6 — the
    count histogram and the triangle-node checksum have an exact SQL
    oracle derived from the embeddings table. A single missed LSH edge
    would drop 3 triangles from one clique and break the hash, so this
    also re-certifies KNN recall through a different invariant than the
    Louvain community histogram.

    Scale shape: see ``ml.triangle_enumerate`` — equi-keyed wedge build +
    wedge closure (compact-forward), O(n·k²) on a KNN graph; graph build
    parallelism sized from the measured vector count."""
    from utils_spark.operators.ml import knn_graph, snn_graph, triangle_enumerate
    from utils_spark.plans import cut_lineage, scaled_shuffle_partitions

    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    q = (F.col("vec_id") / 5).cast("long")
    m = F.pmod(F.col("vec_id"), F.lit(5)).cast("double")
    planted = e.select(
        "vec_id",
        F.array(
            (F.pmod(q, F.lit(50)) * 10000.0 + m).cast("double"),
            ((q / 50).cast("long") * 10000.0).cast("double"),
            F.lit(0.0),
            F.lit(0.0),
        ).alias("vec"),
    )
    n_vec = planted.count()
    with scaled_shuffle_partitions(spark, n_vec, 5_000):
        edges = knn_graph(planted, "vec_id", "vec", k=4, bucket_length=250.0)
        snn = snn_graph(edges, min_shared=1).select("u", "v")
        tri = triangle_enumerate(snn)
        per_group = tri.groupBy((F.col("u") / 5).cast("long").alias("q")).agg(
            F.count("*").alias("n_tri"),
            F.sum(F.col("u") + F.col("v") + F.col("w")).alias("tri_sum"),
        )
        out = per_group.groupBy().agg(
            F.max("n_tri").cast("long").alias("triangles_per_group"),
            F.count("*").cast("long").alias("n_groups"),
            F.sum("n_tri").cast("long").alias("total_triangles"),
            F.sum("tri_sum").cast("long").alias("node_checksum"),
        )
        return cut_lineage(out)


@register(
    "star_connected_components",
    # alternating large-star/small-star connected components (Kiveris et
    # al. 2014) on a PLANTED long-chain graph: vec_ids chained i—i+1
    # inside blocks of 50, so every component is a path of diameter 49 —
    # the exact shape O(diameter) min-label propagation handles worst
    # (it would need ~49 rounds; the star algorithm needs ~7). The true
    # partition is provable arithmetic: component of id = 50·(id div 50).
    oracle="""
    SELECT CAST(50 * (vec_id // 50) AS BIGINT) AS component,
           CAST(COUNT(*) AS BIGINT) AS size,
           CAST(SUM(vec_id) AS BIGINT) AS member_checksum
    FROM embeddings GROUP BY 1
    """,
    tags=("composite", "graph", "connected-components", "dedup-support"),
)
def star_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O(log n)-round connected components (large-star/small-star,
    Kiveris et al. 2014) certified on planted diameter-49 path
    components — the chain-shaped duplicate-graph case (A~B~C~... drift)
    that made the previous O(diameter) min-label propagation unsafe at
    100 TB. `duplicate_clusters` (and through it every dedup keep-policy
    query) now runs this algorithm; this query pins the long-chain
    behavior with an arithmetic ground-truth oracle, while
    `dup_cluster_assignments` / `semantic_dedup_keep` keep their
    recursive-CTE oracles over the real LSH dup graphs.

    Scale shape: each round is two bounded groupBy/join shuffles over
    the current edge set + a limit(1) stability probe; round count is
    logarithmic in component size on ANY graph shape."""
    from utils_spark.operators.dedup import connected_components_star
    from utils_spark.plans import scaled_shuffle_partitions

    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("u")
    )
    nxt = e.select(F.col("u").alias("v"))
    edges = (
        e.withColumn("v", F.col("u") + 1)
        .join(nxt, "v")  # keep chain edges whose successor exists
        .filter(F.floor(F.col("u") / 50) == F.floor(F.col("v") / 50))
    )
    n_nodes = e.count()
    with scaled_shuffle_partitions(spark, n_nodes, 5_000):
        cc = connected_components_star(edges, "u", "v")
        labeled = e.join(
            cc.withColumnRenamed("key", "u"), "u", "left"
        ).select("u", F.coalesce("component", F.col("u")).alias("component"))
        out = labeled.groupBy("component").agg(
            F.count("*").cast("long").alias("size"),
            F.sum("u").cast("long").alias("member_checksum"),
        )
        from utils_spark.plans import cut_lineage

        return cut_lineage(out)


@register(
    "leiden_refined_communities",
    # the reference's FindClusters(algorithm=4) analog (Leiden): coarse
    # Louvain local moving, then the Leiden REFINEMENT phase — re-grow
    # subcommunities from singletons by constrained local moving inside
    # each coarse community. On the planted disjoint 5-cliques the
    # refinement must rebuild exactly the cliques (each clique's nodes
    # merge back onto the min id), so the size histogram + member
    # checksum keep the same provable oracle as louvain_communities.
    oracle="""
    WITH cl AS (SELECT vec_id, vec_id // 5 AS q FROM embeddings),
    s AS (SELECT q, COUNT(*) AS sz, SUM(vec_id) AS cs FROM cl GROUP BY q)
    SELECT CAST(sz AS BIGINT) AS size, CAST(COUNT(*) AS BIGINT) AS n_communities,
           CAST(SUM(cs) AS BIGINT) AS checksum
    FROM s GROUP BY sz
    """,
    tags=("composite", "M5", "ml", "leiden", "refinement"),
)
def leiden_refined_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leiden-style clustering (reference M5: R/wrapper.R:296-303
    FindClusters algorithm 4 — Traag et al. 2019): Louvain local moving
    for the coarse partition, then the refinement phase re-grows
    subcommunities from singletons inside each coarse community
    (singleton-origin constrained moves — the mechanism that prevents
    Louvain's ill-connected merged communities). Greedy deterministic
    variant (argmax gain, no γ-connectivity test — documented in
    ``ml.refine_partition``); the guaranteed structural property —
    refined is a true SUBPARTITION of coarse — is property-tested in
    tests/test_ml.py. On the planted disjoint 5-cliques the refinement
    provably rebuilds the cliques, keeping louvain_communities' exact
    oracle."""
    from utils_spark.operators.ml import (
        knn_graph,
        louvain_communities as louvain,
        refine_partition,
        snn_graph,
    )
    from utils_spark.plans import cut_lineage, scaled_shuffle_partitions

    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    q = (F.col("vec_id") / 5).cast("long")
    m = F.pmod(F.col("vec_id"), F.lit(5)).cast("double")
    planted = e.select(
        "vec_id",
        F.array(
            (F.pmod(q, F.lit(50)) * 10000.0 + m).cast("double"),
            ((q / 50).cast("long") * 10000.0).cast("double"),
            F.lit(0.0),
            F.lit(0.0),
        ).alias("vec"),
    )
    n_vec = planted.count()
    with scaled_shuffle_partitions(spark, n_vec, 5_000):
        edges = knn_graph(planted, "vec_id", "vec", k=4, bucket_length=250.0)
        snn = snn_graph(edges, min_shared=1).withColumnRenamed("shared", "weight")
        snn = cut_lineage(snn)
        coarse = louvain(snn, planted, "vec_id", weight_col="weight", max_iter=10, levels=1)
        refined = refine_partition(snn, coarse, weight_col="weight")
        sizes = refined.groupBy("community").agg(
            F.count("*").alias("size"), F.sum("node").alias("member_checksum")
        )
        out = sizes.groupBy("size").agg(
            F.count("*").alias("n_communities"),
            F.sum("member_checksum").cast("long").alias("checksum"),
        )
        return cut_lineage(out)


@register(
    "adamic_adar_link_prediction",
    # Adamic-Adar link scores (Liben-Nowell & Kleinberg CIKM'03) between
    # a bounded anchor set and all other customers through shared
    # suppliers: sum over common suppliers of 1/ln(customer-degree).
    # Anchoring bounds the wedge join (anchors x supplier-degree, never
    # all-pairs); rank on the 6dp-ROUNDED score so the per-anchor top-5
    # cutoff is deterministic cross-engine.
    oracle="""
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS cust, li.l_suppkey AS supp
      FROM orders o JOIN lineitem li ON o.o_orderkey = li.l_orderkey
    ),
    degs AS (SELECT supp, COUNT(*) AS d FROM e GROUP BY supp),
    anchors AS (
      SELECT cust, COUNT(*) AS n_supp FROM e GROUP BY cust
      ORDER BY n_supp DESC, cust ASC LIMIT 20
    ),
    wedges AS (
      SELECT a.cust AS anchor, c.cust AS neighbor,
             1.0 / ln(d.d) AS w
      FROM anchors a
      JOIN e ae ON ae.cust = a.cust
      JOIN degs d ON d.supp = ae.supp AND d.d >= 2
      JOIN e c ON c.supp = ae.supp AND c.cust <> a.cust
    ),
    scored AS (
      SELECT anchor, neighbor,
             ROUND(SUM(w), 6) AS aa_score,
             CAST(COUNT(*) AS BIGINT) AS common_suppliers
      FROM wedges GROUP BY anchor, neighbor
    ),
    ranked AS (
      SELECT anchor, neighbor, aa_score, common_suppliers,
             row_number() OVER (PARTITION BY anchor
                                ORDER BY aa_score DESC, neighbor ASC) AS rnk
      FROM scored
    )
    SELECT anchor, neighbor, aa_score, common_suppliers, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
    tags=("composite", "graph", "link-prediction", "iterative-free"),
)
def adamic_adar_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link-prediction scores (Liben-Nowell & Kleinberg,
    CIKM 2003) over the customer-supplier interaction graph: for the
    top-20 customers by supplier count (the anchor set), score every
    other customer by sum over SHARED suppliers of 1/ln(supplier's
    customer-degree) — rare shared suppliers are strong evidence, hub
    suppliers weak — and emit each anchor's top-5 candidates. Completes
    the graph family beside PageRank (centrality), Louvain/Leiden
    (communities), triangles (cohesion), and star-CC (components).
    Degree-1 suppliers are excluded (ln(1) = 0 would divide by zero —
    and a supplier with a single customer witnesses no pair anyway).

    Scale shape: the wedge join is anchored — anchor edges (20 x
    anchor-degree) join the edge table on supplier, so work is bounded
    by anchors x supplier-degree, never customers^2 (the classic
    unanchored projection enumerates every supplier's customer-pair
    square — quadratic in hub degree). Degrees are one bounded agg; the
    anchor set is TakeOrdered; the final per-anchor top-5 ranks on the
    ROUNDED score (float sums are order-dependent at the ulp level;
    6dp rounding makes the rank key engine-stable)."""
    from utils_spark.plans import cut_lineage

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # materialize the distinct edge list ONCE: it is read three times below
    # (degrees, anchor edges, wedge probe), and the o x li build join would
    # otherwise be re-planned per consumer (same discipline as pagerank /
    # lpa / kcore edge builds)
    e = cut_lineage(
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    degs = e.groupBy("supp").agg(F.count("*").alias("d")).filter(F.col("d") >= 2)
    anchors = (
        e.groupBy("cust")
        .agg(F.count("*").alias("n_supp"))
        .orderBy(F.desc("n_supp"), F.asc("cust"))
        .limit(20)
        .select(F.col("cust").alias("anchor"))
    )
    ae = F.broadcast(anchors).join(e, F.col("anchor") == F.col("cust")).select("anchor", "supp")
    wedges = (
        ae.join(F.broadcast(degs), "supp")
        .join(e.withColumnRenamed("cust", "neighbor"), "supp")
        .filter(F.col("neighbor") != F.col("anchor"))
        .select("anchor", "neighbor", (F.lit(1.0) / F.log(F.col("d"))).alias("w"))
    )
    scored = wedges.groupBy("anchor", "neighbor").agg(
        F.round(F.sum("w"), 6).alias("aa_score"),
        F.count("*").cast("long").alias("common_suppliers"),
    )
    from pyspark.sql import Window

    rnk = F.row_number().over(
        Window.partitionBy("anchor").orderBy(F.desc("aa_score"), F.asc("neighbor"))
    )
    return (
        scored.withColumn("rnk", rnk.cast("int"))
        .filter(F.col("rnk") <= 5)
        .select("anchor", "neighbor", "aa_score", "common_suppliers", "rnk")
    )


def _lpa_oracle(n_rounds: int) -> str:
    """Generated N-round SQL twin of ``ml.label_propagation`` on the
    customer-supplier graph: per round every node adopts its most
    frequent neighbor label (ties -> smallest label). Round CTEs are
    MATERIALIZED — each is referenced twice (vote join + carry-forward
    base), so inlining would double the plan per round."""
    parts = [
        """
    WITH pair AS (
      SELECT DISTINCT o.o_custkey * 2 AS u, li.l_suppkey * 2 + 1 AS v
      FROM orders o JOIN lineitem li ON o.o_orderkey = li.l_orderkey
    ),
    edges AS MATERIALIZED (
      SELECT u, v FROM pair UNION SELECT v AS u, u AS v FROM pair
    ),
    l0 AS MATERIALIZED (
      SELECT DISTINCT u AS node, u AS label FROM edges
    )"""
    ]
    for r in range(1, n_rounds + 1):
        prev = r - 1
        parts.append(f"""
    l{r} AS MATERIALIZED (
      SELECT n.node, COALESCE(nl.label, n.label) AS label
      FROM l{prev} n LEFT JOIN (
        SELECT u, label FROM (
          SELECT e.u, l.label,
                 row_number() OVER (PARTITION BY e.u
                                    ORDER BY COUNT(*) DESC, l.label ASC) AS rn
          FROM edges e JOIN l{prev} l ON l.node = e.v
          GROUP BY e.u, l.label) q
        WHERE rn = 1
      ) nl ON nl.u = n.node
    )""")
    return ",".join(parts) + f"""
    , comm AS (
      SELECT label, COUNT(*) AS size, CAST(SUM(node) AS BIGINT) AS member_checksum
      FROM l{n_rounds} GROUP BY label
    )
    SELECT CAST(size AS BIGINT) AS size,
           CAST(COUNT(*) AS BIGINT) AS n_communities,
           CAST(SUM(member_checksum) AS BIGINT) AS checksum
    FROM comm GROUP BY size
    """


@register(
    "lpa_communities",
    # Synchronous label propagation (Raghavan, Albert & Kumara 2007) — 4
    # deterministic rounds on the customer-supplier graph; the oracle
    # replays every round in generated MATERIALIZED-CTE SQL (the
    # pagerank/BPE technique). Output is the community-size histogram
    # with membership checksums, winner-set exact.
    oracle=_lpa_oracle(4),
    tags=("composite", "graph", "communities", "iterative"),
)
def lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation community detection (Raghavan et al., Phys. Rev.
    E 2007 — the near-linear-time community baseline): 4 synchronous
    rounds over the customer-supplier interaction graph; each node
    adopts its most frequent neighbor label, ties to the smallest label
    (fully deterministic — no randomized update order). Complements
    modularity-based Louvain/Leiden: LPA is the cheap first-pass
    community sweep a 100 TB graph gets before heavier objectives.
    Emits the community-size histogram with per-size membership
    checksums, so any mis-assignment is hash-visible.

    Scale shape: per round one label-keyed join (edges x labels) + one
    (node, label) vote aggregation + a per-node argmax window — all
    keyed shuffles bounded by the edge list, never node^2; lineage cut
    every second round (operators/ml.py:199). The synchronous update
    rule is what makes the result engine-replayable; classic
    random-order asynchronous LPA cannot be oracled."""
    from utils_spark.operators.ml import label_propagation

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pair = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    nodes = (
        pair.select(F.col("u").alias("n"))
        .unionByName(pair.select(F.col("v").alias("n")))
        .distinct()
    )
    lbl = label_propagation(pair, nodes, "n", max_iter=4)
    comm = lbl.groupBy("label").agg(
        F.count("*").alias("size"),
        F.sum("node").cast("long").alias("member_checksum"),
    )
    return comm.groupBy(F.col("size").cast("long").alias("size")).agg(
        F.count("*").cast("long").alias("n_communities"),
        F.sum("member_checksum").cast("long").alias("checksum"),
    )


def _kcore_oracle(n_rounds: int) -> str:
    """Generated N-round SQL twin of the k-core peel: every round drops
    nodes with degree < k and their edges (Seidman 1983; the simultaneous
    -removal variant, deterministic). k is DATA-DERIVED — the degree at
    rank ceil(0.75 * n_nodes) of the initial (degree asc, node asc)
    order — so the peel cascade is non-vacuous at every SF (a fixed k
    either removes nothing or everything as the graph densifies with
    scale). Round CTEs are MATERIALIZED — each edge set is referenced by
    the keep CTE, two keep-joins and the stats row, so inlining would go
    exponential."""
    parts = [
        """
    WITH pair AS (
      SELECT DISTINCT o.o_custkey * 2 AS u, li.l_suppkey * 2 + 1 AS v
      FROM orders o JOIN lineitem li ON o.o_orderkey = li.l_orderkey
    ),
    e0 AS MATERIALIZED (
      SELECT u, v FROM pair UNION SELECT v AS u, u AS v FROM pair
    ),
    deg0 AS MATERIALIZED (SELECT u, COUNT(*) AS c FROM e0 GROUP BY u),
    kval AS MATERIALIZED (
      SELECT c AS k FROM (
        SELECT c, row_number() OVER (ORDER BY c ASC, u ASC) AS rn,
               COUNT(*) OVER () AS n
        FROM deg0) q
      WHERE rn = CAST(ceil(0.75 * n) AS BIGINT)
    )"""
    ]
    for r in range(1, n_rounds + 1):
        prev = r - 1
        parts.append(f"""
    keep{r} AS MATERIALIZED (
      SELECT e.u FROM e{prev} e GROUP BY e.u
      HAVING COUNT(*) >= (SELECT k FROM kval)
    ),
    e{r} AS MATERIALIZED (
      SELECT e.u, e.v FROM e{prev} e
      JOIN keep{r} a ON a.u = e.u
      JOIN keep{r} b ON b.u = e.v
    )""")
    stats = "\n    UNION ALL\n    ".join(
        f"""SELECT {r} AS round,
           CAST(COUNT(DISTINCT u) AS BIGINT) AS n_nodes,
           CAST(COUNT(*) / 2 AS BIGINT) AS n_edges,
           CAST(COALESCE(SUM(DISTINCT u), 0) AS BIGINT) AS node_checksum
        FROM e{r}"""
        for r in range(1, n_rounds + 1)
    )
    return ",".join(parts) + "\n    " + stats


@register(
    "kcore_decomposition",
    # iterative k-core peel (Seidman 1983), 4 simultaneous-removal
    # rounds on the customer-supplier graph with k = the 75th-percentile
    # initial degree (data-derived so the cascade fires at every SF);
    # the oracle replays every round in generated MATERIALIZED-CTE SQL.
    # The per-round trajectory (nodes, edges, membership checksum) makes
    # the cascade and its convergence part of the hashed evidence.
    oracle=_kcore_oracle(4),
    tags=("composite", "graph", "kcore", "iterative"),
)
def kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (Seidman, Social Networks 1983 — graph
    degeneracy peeling, the standard cohesion screen before community
    detection): 4 rounds of simultaneously deleting every node with
    degree < k from the customer-supplier graph, k chosen as the
    75th-percentile initial degree (rank ceil(0.75n) of the
    (degree, node) order — explicit rank, no engine percentile
    semantics; a FIXED k is vacuous here because degrees grow with SF).
    Emits the per-round (surviving nodes, surviving edges, membership
    checksum) trajectory — the removal cascade and its plateau are
    hash-checked, not asserted. Completes the graph-primitive family:
    centrality (PageRank), communities (Louvain/Leiden/LPA), cohesion
    (triangles), components (star-CC), degeneracy (k-core).

    Scale shape: each round is one degree aggregation (edge-keyed,
    map-side combined) plus two semi joins of the edge list against the
    bounded keep-set — never node^2; the edge list is checkpointed per
    round so plans stay flat (the star-CC discipline); k itself is a
    1-row driver scalar (the BPE-argmax pattern). Simultaneous removal
    (vs sequential min-degree peeling) is what makes the round
    deterministic and engine-replayable."""
    from utils_spark.plans import cut_lineage

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pair = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    e = cut_lineage(
        pair.unionByName(pair.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    )
    from pyspark.sql import Window

    deg0 = e.groupBy("u").agg(F.count("*").alias("c"))
    ranked = deg0.select(
        "c",
        F.row_number().over(Window.orderBy(F.asc("c"), F.asc("u"))).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    k = (
        ranked.filter(F.col("rn") == F.ceil(0.75 * F.col("n")).cast("long"))
        .select("c")
        .collect()[0][0]
    )
    stats = []
    for r in range(1, 5):
        keep = (
            e.groupBy("u").agg(F.count("*").alias("c")).filter(F.col("c") >= k).select("u")
        )
        e = cut_lineage(
            e.join(keep, "u").join(keep.withColumnRenamed("u", "v"), "v").select("u", "v")
        )
        nodes = e.select("u").distinct()
        stats.append(
            nodes.agg(
                F.lit(r).alias("round"),
                F.count("*").cast("long").alias("n_nodes"),
                F.coalesce(F.sum("u"), F.lit(0)).cast("long").alias("node_checksum"),
            ).crossJoin(
                F.broadcast(e.agg((F.count("*") / 2).cast("long").alias("n_edges")))
            )
        )
    out = stats[0]
    for st in stats[1:]:
        out = out.unionByName(st)
    return out.select("round", "n_nodes", "n_edges", "node_checksum")


def _hits_oracle(n_iter: int = 3) -> str:
    """Generated N-round SQL twin of ``ml.hits`` on the directed
    customer→supplier purchase graph: each round computes in-edge hub
    sums (authorities) and out-edge authority sums (hubs), each
    L2-normalized — the same N-step-CTE technique as _pagerank_oracle."""
    head = """
    WITH pair AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    h0 AS (SELECT DISTINCT src, 1.0 AS h FROM pair)"""
    steps = []
    for k in range(1, n_iter + 1):
        steps.append(f"""
    ar{k} AS (
      SELECT p.dst, SUM(h.h) AS a FROM pair p JOIN h{k - 1} h ON p.src = h.src GROUP BY p.dst
    ),
    an{k} AS (SELECT dst, a / sqrt(SUM(a * a) OVER ()) AS a FROM ar{k}),
    hr{k} AS (
      SELECT p.src, SUM(a.a) AS h FROM pair p JOIN an{k} a ON p.dst = a.dst GROUP BY p.src
    ),
    h{k} AS (SELECT src, h / sqrt(SUM(h * h) OVER ()) AS h FROM hr{k})""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT * FROM (
      SELECT 'supplier' AS node_type, dst AS node, ROUND(a, 8) AS score
      FROM an{n_iter} ORDER BY ROUND(a, 8) DESC, dst ASC LIMIT 10)
    UNION ALL
    SELECT * FROM (
      SELECT 'customer' AS node_type, src AS node, ROUND(h, 8) AS score
      FROM h{n_iter} ORDER BY ROUND(h, 8) DESC, src ASC LIMIT 10)"""
    )


@register(
    "hits_hub_authority",
    # HITS (Kleinberg 1999) on the directed customer→supplier purchase
    # graph, 3 rounds of L2-normalized mutual reinforcement; deterministic
    # top-10 hubs + top-10 authorities by (8dp-rounded score desc, node
    # asc). The oracle replays all rounds in generated SQL.
    oracle=_hits_oracle(3),
    tags=("composite", "graph", "iterative", "hits"),
)
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hub/authority decomposition of the customer→supplier purchase
    graph — customers that buy broadly from strong suppliers (hubs) vs
    suppliers bought from by strong hubs (authorities). Completes the
    spectral-centrality pair beside `pagerank_interactions`: PageRank's
    random-surfer mass vs HITS' mutual-reinforcement eigenvectors (the
    principal left/right singular vectors of the adjacency), which is the
    published tool for BIPARTITE interaction graphs where a single
    undirected centrality conflates the two roles.

    Scale shape: see ``ml.hits`` — per half-round one edge-keyed join +
    one bounded node-keyed aggregation; L2 norms are 1-row broadcast
    scalars; lineage cut per round; parallelism sized from the measured
    edge count. Output rounds at 8dp with a node-id tie-break so the
    top-10 cutoffs are cross-engine deterministic."""
    from utils_spark.operators.ml import hits

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pair = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .distinct()
    )
    hubs, auths = hits(pair, n_iter=3)
    top_a = (
        auths.select(
            F.lit("supplier").alias("node_type"),
            "node",
            F.round("score", 8).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(10)
    )
    top_h = (
        hubs.select(
            F.lit("customer").alias("node_type"),
            "node",
            F.round("score", 8).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(10)
    )
    return top_a.unionByName(top_h)


@register(
    "harmonic_closeness_seeds",
    # Harmonic closeness centrality (Marchiori & Latora 2000; the
    # disconnected-safe closeness variant) for a deterministic 5-seed
    # supplier set on the undirected customer-supplier purchase graph,
    # truncated at 3 hops: H(s) = n1/1 + n2/2 + n3/3 over the nodes at
    # exact BFS distance k. Multi-source labeled BFS — each round is
    # one edge-keyed join + distinct + anti-joins against the previous
    # frontiers (never re-expanding settled nodes), the textbook
    # distributed BFS. Node ids are role-prefixed ('c'/'s') because
    # customer and supplier keys share the same integer space.
    oracle="""
    WITH edge AS (
      SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    sym AS (SELECT a, b FROM edge UNION ALL SELECT b AS a, a AS b FROM edge),
    seeds AS (SELECT 's' || s_suppkey AS seed FROM supplier ORDER BY s_suppkey LIMIT 5),
    d1 AS (
      SELECT DISTINCT s.seed, e.b AS v
      FROM seeds s JOIN sym e ON e.a = s.seed
      WHERE e.b <> s.seed
    ),
    d2 AS (
      SELECT DISTINCT d.seed, e.b AS v
      FROM d1 d JOIN sym e ON e.a = d.v
      WHERE e.b <> d.seed
        AND NOT EXISTS (SELECT 1 FROM d1 x WHERE x.seed = d.seed AND x.v = e.b)
    ),
    d3 AS (
      SELECT DISTINCT d.seed, e.b AS v
      FROM d2 d JOIN sym e ON e.a = d.v
      WHERE e.b <> d.seed
        AND NOT EXISTS (SELECT 1 FROM d1 x WHERE x.seed = d.seed AND x.v = e.b)
        AND NOT EXISTS (SELECT 1 FROM d2 x WHERE x.seed = d.seed AND x.v = e.b)
    ),
    cnt AS (
      SELECT s.seed,
             (SELECT COUNT(*) FROM d1 WHERE d1.seed = s.seed) AS n1,
             (SELECT COUNT(*) FROM d2 WHERE d2.seed = s.seed) AS n2,
             (SELECT COUNT(*) FROM d3 WHERE d3.seed = s.seed) AS n3
      FROM seeds s
    )
    SELECT seed, CAST(n1 AS BIGINT) AS n_dist1, CAST(n2 AS BIGINT) AS n_dist2,
           CAST(n3 AS BIGINT) AS n_dist3,
           ROUND(n1 + n2 / 2.0 + n3 / 3.0, 6) AS harmonic_centrality
    FROM cnt
    """,
    tags=("graph", "centrality", "bfs"),
)
def harmonic_closeness_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic closeness centrality (Marchiori & Latora 2000) of the
    five lowest-id suppliers on the undirected customer-supplier
    purchase graph, truncated at 3 BFS hops: H = sum over reached
    nodes of 1/distance — the closeness variant that stays finite on
    disconnected graphs, which classic closeness (1/sum d) does not.
    Completes the centrality family beside `pagerank_interactions`
    (flow), `hits_hub_authority` (mutual reinforcement) and
    `kcore_decomposition` (cohesion): this one measures REACH.

    Scale shape: multi-source labeled BFS — the frontier carries
    (seed, node) labels so all 5 sources expand in the same 3 rounds;
    each round is one edge-keyed join (the only corpus-volume
    shuffles), a distinct, and anti-joins against prior frontiers so
    settled nodes are never re-expanded. Frontier size is bounded by
    5 x nodes; the seed list is a TakeOrdered-5, not a global sort."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edge = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )
    sym = edge.union(edge.select(F.col("b").alias("a"), F.col("a").alias("b")))
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .select(F.concat(F.lit("s"), F.col("s_suppkey")).alias("seed"), "s_suppkey")
        .orderBy("s_suppkey")
        .limit(5)
        .select("seed")
    )
    d1 = (
        F.broadcast(seeds)
        .join(sym, seeds.seed == sym.a)
        .filter(F.col("b") != F.col("seed"))
        .select("seed", F.col("b").alias("v"))
        .distinct()
    )
    d2 = (
        d1.join(sym, d1.v == sym.a)
        .filter(F.col("b") != F.col("seed"))
        .select("seed", F.col("b").alias("v"))
        .distinct()
        .join(d1, ["seed", "v"], "left_anti")
    )
    d3 = (
        d2.join(sym, d2.v == sym.a)
        .filter(F.col("b") != F.col("seed"))
        .select("seed", F.col("b").alias("v"))
        .distinct()
        .join(d1, ["seed", "v"], "left_anti")
        .join(d2, ["seed", "v"], "left_anti")
    )
    c1 = d1.groupBy("seed").agg(F.count("*").alias("n1"))
    c2 = d2.groupBy("seed").agg(F.count("*").alias("n2"))
    c3 = d3.groupBy("seed").agg(F.count("*").alias("n3"))
    cnt = (
        seeds.join(c1, "seed", "left")
        .join(c2, "seed", "left")
        .join(c3, "seed", "left")
        .select(
            "seed",
            F.coalesce("n1", F.lit(0)).alias("n1"),
            F.coalesce("n2", F.lit(0)).alias("n2"),
            F.coalesce("n3", F.lit(0)).alias("n3"),
        )
    )
    return cnt.select(
        "seed",
        F.col("n1").cast("long").alias("n_dist1"),
        F.col("n2").cast("long").alias("n_dist2"),
        F.col("n3").cast("long").alias("n_dist3"),
        F.round(F.col("n1") + F.col("n2") / 2.0 + F.col("n3") / 3.0, 6).alias(
            "harmonic_centrality"
        ),
    )
