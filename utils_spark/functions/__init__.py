"""Reusable Column-expression builders.

Everything here is a pure ``pyspark.sql.functions`` composition — JVM-side,
whole-stage-codegen friendly, no Python UDFs. These are the scalar kernels
the reference applies row-wise in R (SURVEY.md §2.7) plus the deterministic
hashing primitives our sampling / dedup / similarity operators build on.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash of a string column via md5.

    Unlike ``F.xxhash64`` (whose seed/partitioning make cross-engine parity
    awkward), md5 is bit-identical in every engine: we take the first 15 hex
    chars (60 bits, always < 2^63 so it fits a signed BIGINT in any engine).
    Used for seeded-deterministic sampling (SURVEY §7.2) and MinHash.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def det_order_key(key: Column | str, seed: int | str) -> Column:
    """Deterministic pseudo-random ordering key: md5(key || ':' || seed).

    Replaces ``F.rand(seed)`` (partition-dependent; SURVEY §7.2) wherever the
    reference uses seeded sampling (reference R/reference.R:150-155 seed 290).
    Orders identically regardless of partitioning, engine, or cluster size.
    """
    k = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat_ws(":", k.cast("string"), F.lit(str(seed))))


def pair_key(a: Column | str, b: Column | str, sep: str = "-") -> Column:
    """Order-insensitive pair key: sort the two labels then join.

    Reference P14 (R/compare_annotation.R:93-95).
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.concat_ws(sep, F.array_sort(F.array(a, b)))


def make_unique(name: Column | str, order_by: Column | str):
    """R ``make.unique`` semantics: first occurrence keeps the name, later
    duplicates get ``.1``, ``.2``, ... suffixes (reference P22,
    R/wrapper.R:38-42). Deterministic via an explicit tiebreak ordering.

    Returns a Column; must be used with a Window — see operators.relational.
    """
    from pyspark.sql import Window

    n = F.col(name) if isinstance(name, str) else name
    o = F.col(order_by) if isinstance(order_by, str) else order_by
    rn = F.row_number().over(Window.partitionBy(n).orderBy(o))
    return F.when(rn == 1, n).otherwise(F.concat_ws(".", n, (rn - 1).cast("string")))


def zscore(value: Column, mean: Column, std: Column) -> Column:
    """Row-wise z-score with non-finite→NULL (reference P19,
    R/tradeseq.R:172-182: `(x - mean(x)) / sd(x)`, non-finite to NA)."""
    z = (value - mean) / std
    return F.when(F.isnan(z) | (F.abs(z) == float("inf")), F.lit(None)).otherwise(z)


def squish(value: Column, lo: Column, hi: Column) -> Column:
    """Clamp to a robust range (reference P20, R/tradeseq.R:222-236)."""
    return F.least(F.greatest(value, lo), hi)


def log2_cpm(count: Column, size_factor: Column) -> Column:
    """log-normalization kernel: log2(count / size_factor + 1)
    (reference R/reference.R:161 via scater::logNormCounts)."""
    return F.log2(count / size_factor + F.lit(1.0))


def fixed_width_bucket(value: Column | str, width: float, n_buckets: int) -> Column:
    """Fixed-width histogram bucket index in [0, n_buckets-1].

    Spark has ``F.width_bucket`` but the arithmetic here (`floor(v/width)`)
    is chosen to be bit-identical across engines for oracle parity.
    Reference A13/A14 (R/tradeseq.R:131-150, R/wrapper.R:130-133).
    """
    v = F.col(value) if isinstance(value, str) else value
    return F.least(F.floor(v / F.lit(width)), F.lit(n_buckets - 1)).cast("int")


def char_shingles(text: Column | str, k: int = 3) -> Column:
    """Array of distinct k-character shingles of a string (JVM-side only:
    sequence + transform + array_distinct — no UDF, no explode until the
    caller chooses to). Foundation for n-gram Jaccard / MinHash dedup."""
    t = F.col(text) if isinstance(text, str) else text
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: t.substr(i, F.lit(k))))


def word_tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string> (text-analysis surface)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")


def minhash_band_structs(sig_col: Column | str, n_hashes: int, n_bands: int) -> Column:
    """LSH band keys from a MinHash signature array:
    array<struct<band_id int, band_hash string>> where band_hash is the
    md5 of the comma-joined signature slice — the exact banding used by
    minhash_lsh_pairs / fuzzy_decontamination (their inline builders are
    the historical copies of this kernel). Stateless, streaming-safe."""
    rows = n_hashes // n_bands
    c = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws(",", *[c[b * rows + r] for r in range(rows)])).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )


def strict_mean(value: Column | str) -> Column:
    """NA-poisoning mean — R's ``mean(x)`` DEFAULT (na.rm=FALSE): NULL if
    ANY input is NULL, else the mean. Spark's ``avg`` matches only R's
    na.rm=TRUE form (SURVEY §1.2 semantics gap); this aggregate closes the
    default case: ``count(*) == count(col)`` detects poisoning NULLs with
    zero extra passes. Use inside ``groupBy(...).agg(...)``."""
    v = F.col(value) if isinstance(value, str) else value
    return F.when(F.count(F.lit(1)) == F.count(v), F.avg(v))


def strict_sum(value: Column | str) -> Column:
    """NA-poisoning sum — R's ``sum(x)`` default (na.rm=FALSE): NULL if any
    input is NULL. See ``strict_mean``."""
    v = F.col(value) if isinstance(value, str) else value
    return F.when(F.count(F.lit(1)) == F.count(v), F.sum(v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, JVM-side.

    dot(a,b) / (||a||·||b||) via zip_with + aggregate — whole-stage codegen,
    no UDF. Caller should cast float arrays to double first for stable math.
    """
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def to_double_array(col: Column | str) -> Column:
    """Cast array<float> → array<double> elementwise (stable arithmetic)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def morton_interleave(xb: Column | str, yb: Column | str, bits: int = 8) -> Column:
    """Z-order (Morton) code: interleave the low ``bits`` bits of two
    bucket columns into a 2·bits-bit locality-preserving code. Sorting or
    range-partitioning on this code clusters BOTH dimensions
    simultaneously, so parquet min/max stats prune on either key — the
    multi-dimensional data-layout primitive (see `zorder_layout`).
    Pure shift/mask integer expressions, whole-stage-codegen friendly."""
    x = F.col(xb) if isinstance(xb, str) else xb
    y = F.col(yb) if isinstance(yb, str) else yb
    code = F.lit(0)
    for b in range(bits):
        code = code + F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        code = code + F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
    return code
