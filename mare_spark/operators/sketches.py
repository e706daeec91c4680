"""Mergeable frequency sketches — the shuffle-free scale tier for
corpus-wide frequency questions.

The exact chunk/gram frequency pattern (aggregate on the digest, join the
counts back) is two keyed exchanges over a table as large as the corpus'
distinct-chunk set. At 100 TB that is often fine — but when the ONLY
question is "does this key occur more than k times?", a count-min sketch
answers it with ZERO data shuffles: every partition folds its keys into a
fixed (depth × width) counter table, the per-partition tables (a few
hundred KB each, one per partition regardless of corpus size) merge on
the driver by elementwise sum, and the merged table broadcasts back for
an Arrow-batched probe. Total movement: partitions × sketch-size bytes,
independent of row count.

Guarantee: the classic one-sided CMS bound — estimates never
UNDERestimate; overestimates happen with probability ≈ (1/2)^depth per
key at width ≥ 2·distinct/ε. For boilerplate scrubbing that one-sidedness
is exactly the safe direction: a frequent chunk can never sneak through;
a rare chunk is (rarely) scrubbed too eagerly.

Hash family: multiply-shift (Dietzfelbinger) — ``h_r(v) = (a_r·v + b_r
mod 2^64) >> (64 - width_bits)`` with fixed odd ``a_r``. Builder and
probe share the same vectorized numpy implementation, so parity is by
construction (no cross-engine replay needed — the sketch is engine-local
state, not a query result).

No reference counterpart: MaRe (/root/reference) has no sketch surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["CountMinSketch", "build_cms", "cms_probe_expr",
           "distinct_sketch_table", "merge_distinct_estimates",
           "quantile_sketch_table", "merge_quantile_estimates",
           "bottomk_hash"]

# fixed odd multipliers / offsets per sketch row (splitmix64 outputs of
# seeds 1..8, forced odd) — deterministic across builds and probes
_A = np.array(
    [
        0x9E3779B97F4A7C15 | 1,
        0xBF58476D1CE4E5B9 | 1,
        0x94D049BB133111EB | 1,
        0xD6E8FEB86659FD93 | 1,
        0xA5A3B1C9C03DF3B1 | 1,
        0xC2B2AE3D27D4EB4F | 1,
        0x165667B19E3779F9 | 1,
        0x27D4EB2F165667C5 | 1,
    ],
    dtype=np.uint64,
)
_B = np.array(
    [
        0x85EBCA6B,
        0xC2B2AE35,
        0x27D4EB2F,
        0x165667B1,
        0xD3A2646C,
        0xFD7046C5,
        0xB55A4F09,
        0x8F462907,
    ],
    dtype=np.uint64,
)


class CountMinSketch:
    """Driver-side merged sketch: a (depth × 2^width_bits) uint64 counter
    table with vectorized add/estimate."""

    def __init__(self, width_bits: int = 16, depth: int = 4):
        if not 1 <= depth <= len(_A):
            raise ValueError(f"depth must be in [1, {len(_A)}], got {depth}")
        if not 1 <= width_bits <= 63:
            # width_bits=0 would shift uint64 by 64 — undefined in numpy
            raise ValueError(
                f"width_bits must be in [1, 63], got {width_bits}"
            )
        self.width_bits = width_bits
        self.depth = depth
        self.table = np.zeros((depth, 1 << width_bits), dtype=np.uint64)

    def _cols(self, vals: np.ndarray) -> np.ndarray:
        """(depth, n) column indices for int64/uint64 ``vals``."""
        v = vals.astype(np.uint64, copy=False)
        with np.errstate(over="ignore"):
            h = _A[: self.depth, None] * v[None, :] + _B[: self.depth, None]
        return (h >> np.uint64(64 - self.width_bits)).astype(np.int64)

    def add(self, vals: np.ndarray) -> None:
        cols = self._cols(vals)
        for r in range(self.depth):
            np.add.at(self.table[r], cols[r], 1)
        # a mutated table invalidates any cached executor broadcast —
        # otherwise cluster probes read stale counts (local-mode tests
        # would pass anyway because bc.value aliases the driver array)
        self.release()

    def estimate(self, vals: np.ndarray) -> np.ndarray:
        """Point estimates (uint64, never below the true count)."""
        cols = self._cols(vals)
        return np.min(
            np.stack([self.table[r][cols[r]] for r in range(self.depth)]),
            axis=0,
        )

    def merge_bytes(self, raw: bytes) -> None:
        self.table += np.frombuffer(raw, dtype=np.uint64).reshape(
            self.table.shape
        )
        self.release()  # same staleness rule as add()

    def spark_broadcast(self, spark):
        """One cached SparkContext broadcast per sketch (re-probing the
        same sketch must not pin a fresh copy per call); ``release()``
        when done."""
        bc = getattr(self, "_bc", None)
        if bc is None:
            bc = spark.sparkContext.broadcast(
                (self.table, self.width_bits, self.depth)
            )
            self._bc = bc
        return bc

    def release(self) -> None:
        """Drop the executor-side broadcast copies (driver table stays)."""
        bc = getattr(self, "_bc", None)
        if bc is not None:
            bc.unpersist()
            self._bc = None


def build_cms(
    df: DataFrame, col: str, *, width_bits: int = 16, depth: int = 4
) -> CountMinSketch:
    """Build a corpus-wide CMS over an int64 key column with zero
    shuffles: one partial sketch per PARTITION (the mapInPandas generator
    folds every Arrow batch of its partition before yielding), partials
    collected and summed on the driver. Driver traffic = partitions ×
    depth·2^width_bits·8 bytes — e.g. 1000 partitions × 2 MB at the
    defaults — bounded by cluster width, not data size."""
    wb, d = width_bits, depth

    def gen(batches):
        import pandas as pd

        local = CountMinSketch(wb, d)
        seen = False
        for pdf in batches:
            vals = pdf[col].to_numpy(dtype=np.int64, na_value=0)
            if len(vals):
                local.add(vals)
                seen = True
        if seen:
            yield pd.DataFrame({"sketch": [local.table.tobytes()]})

    # NULL keys would silently alias to key 0 through the na_value fill —
    # exclude them from the count (SQL aggregate convention); probe-side
    # NULLs return key-0's estimate, so probe after a NULL filter too
    parts = (
        df.select(col)
        .where(F.col(col).isNotNull())
        .mapInPandas(gen, "sketch binary")
        .collect()
    )
    merged = CountMinSketch(wb, d)
    for row in parts:
        merged.merge_bytes(row.sketch)
    return merged


def cms_probe_expr(df_or_col, sketch: CountMinSketch, spark=None) -> Column:
    """Arrow-batched probe: ``cms_probe_expr(F.col("key_h"), sketch)``
    returns the estimated count (long) per row. The counter table ships
    once per executor as a SparkContext broadcast, not per task."""
    from pyspark.sql import SparkSession

    spark = spark or SparkSession.getActiveSession()
    bc = sketch.spark_broadcast(spark)

    @F.pandas_udf("long")
    def probe(s: pd.Series) -> pd.Series:
        table, wb, d = bc.value
        # build the probe helper WITHOUT allocating a fresh zeroed table
        # per Arrow batch (multi-MB at width_bits 20+): bypass __init__
        sk = CountMinSketch.__new__(CountMinSketch)
        sk.width_bits, sk.depth, sk.table = wb, d, table
        est = sk.estimate(s.to_numpy(dtype=np.int64, na_value=0))
        return pd.Series(est.astype(np.int64))

    return probe(df_or_col)


# ---------------------------------------------------------------------------
# Mergeable distinct-count sketches (Datasketches HLL via Spark built-ins)
# ---------------------------------------------------------------------------


def distinct_sketch_table(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Materializable per-group HLL sketches of ``key_col``'s distinct
    count (``hll_sketch_agg`` — Datasketches binary, a few KB per group).
    The incremental-analytics pattern: persist one sketch row per
    (day, source, ...) partition as it lands, and answer any coarser
    distinct-count rollup later by MERGING sketches — no re-scan of
    history, which at 100 TB is the difference between a metadata query
    and a month-long backfill."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key_col).alias("distinct_sketch")
    )


def merge_distinct_estimates(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Roll persisted sketches up to ``group_cols`` granularity:
    ``hll_union_agg`` merges the binaries (associative — batch
    boundaries can't change the answer), ``hll_sketch_estimate`` reads
    the count. Input is the sketch table, never the raw data."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg("distinct_sketch")
        ).alias("approx_distinct")
    )


def bottomk_hash(id_col: str, salt: str = "") -> Column:
    """THE bottom-k ordering hash — ``md5(id ':' salt)`` — shared by the
    batch sketch table and the streaming fold so the pinned
    batch/streaming equivalence can't drift apart silently."""
    return F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(":"), F.lit(salt))
    )


def quantile_sketch_table(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: list[str],
    *,
    k: int = 1024,
    salt: str = "",
) -> DataFrame:
    """Materializable per-group QUANTILE sketches: the bottom-``k``
    distinct md5(id, salt) hashes (min value per hash) — a deterministic
    uniform sample whose merge is
    EXACT (bottom-k of a union equals bottom-k over the inputs'
    bottom-ks), the property that makes it a table you persist per
    (day, source, ...) partition and roll up later without re-scanning
    history. Rank error of a quantile read is the usual sampling bound
    ~1/sqrt(k). Spark has no mergeable percentile binary the way it has
    Datasketches HLL (`approx_percentile`'s digest stays internal), so
    the sample IS the sketch — and unlike a digest it is
    engine-portable and layout-independent by construction.

    Scale: the per-group trim happens BEFORE the exchange (row_number ≤ k
    triggers Catalyst's two-phase WindowGroupLimit, as in the fixed-k
    sampler), so the shuffle carries at most k rows per group per map
    task and no task ever sorts a whole group. One sketch row per group:
    ``(group..., quantile_sketch: array<struct<h,v>>, sketch_rows)``.

    Contract: ``id_col`` must be unique across every table the sketches
    will be merged over (hashes are the merge dedup key — overlapping
    re-ingestion of the same ids is tolerated and deduplicates; if the
    same id ever carries CONFLICTING values, the smaller value wins
    deterministically in batch and streaming alike). NULL ids and NULL
    values are excluded up front (the SQL aggregate convention
    ``build_cms`` also follows) — a NULL id would hash NULL and sort
    ahead of every real sample row, and a NULL value would occupy a
    sample slot only to surface as a NULL percentile read.

    The sample is the bottom-``k`` DISTINCT hashes (min value per hash),
    not the bottom-k rows: the per-hash dedup must happen BEFORE the
    trim, or a duplicate id with conflicting values at the k boundary
    would burn two sample slots and evict a hash that any other epoch/
    partition slicing of the same rows keeps — the build would stop
    being associative with its own merge (r8 review finding; pinned by
    test_quantile_build_is_associative_under_conflicting_dup_ids).

    The emitted ``sketch_k`` column records the build k; merges clamp to
    the smallest build k they see, because bottom-k merges are exact
    only at (or below) the smallest k any input was trimmed to.
    """
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # Two windows over ONE exchange: dense_rank over (h) counts DISTINCT
    # hashes (duplicate-id rows tie) and is rank-like, so Catalyst's
    # WindowGroupLimit still inserts the map-side partial trim before
    # the exchange; the lag window shares the partitioning and re-sorts
    # by (h, v) AFTER the final rank trim — i.e. over at most k rows per
    # group (plan in PLANS.md) — keeping the first row of each hash run,
    # the per-hash MINIMUM value, the same smallest-value-wins rule the
    # merge and the streaming fold apply.
    w_rank = Window.partitionBy(*group_cols).orderBy("h")
    w_dedup = Window.partitionBy(*group_cols).orderBy("h", "v")
    pre = (
        df.filter(
            F.col(id_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .select(
            *group_cols,
            bottomk_hash(id_col, salt).alias("h"),
            F.col(value_col).cast("double").alias("v"),
        )
    )
    trimmed = (
        pre.withColumn("_dr", F.dense_rank().over(w_rank))
        .filter(F.col("_dr") <= k)
        .withColumn("_ph", F.lag("h").over(w_dedup))
        .filter(F.col("_ph").isNull() | (F.col("_ph") != F.col("h")))
        .drop("_dr", "_ph")
    )
    return trimmed.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("h"), F.col("v")))
        ).alias("quantile_sketch"),
        F.count("*").cast("int").alias("sketch_rows"),
        F.lit(int(k)).alias("sketch_k"),
    )


def merge_quantile_estimates(
    sketches: DataFrame,
    group_cols: list[str],
    percentiles: list[float],
    *,
    k: int = 1024,
) -> DataFrame:
    """Roll persisted quantile sketches up to ``group_cols`` granularity
    and read nearest-rank percentiles from the merged sample. The merge
    is flatten → sort → dedup on HASH (first per hash = smallest value,
    the same deterministic rule the streaming fold applies) → trim
    (associative and idempotent: batch boundaries and re-merges can't
    change the result — pinned by test). The trim clamps to the smallest
    ``sketch_k`` any input was built with: bottom-k merges are exact
    only at or below the tightest input trim, so asking for a larger k
    would silently bias the sample toward small inputs. Input is the
    sketch table, never the raw data. Output: one ``p<NN>`` column per
    requested percentile."""
    for p in percentiles:
        if not 0.0 < p <= 1.0:
            raise ValueError(f"percentiles must be in (0, 1], got {p}")
    sorted_all = F.array_sort(F.flatten(F.collect_list("quantile_sketch")))
    deduped = F.filter(
        sorted_all,
        lambda x, i: (i == F.lit(0))
        | (F.element_at(sorted_all, F.greatest(i, F.lit(1)))["h"]
           != x["h"]),
    )
    eff_k = (
        F.least(F.lit(k), F.min("sketch_k"))
        if "sketch_k" in sketches.columns
        else F.lit(k)
    )
    merged = F.slice(deduped, F.lit(1), eff_k)
    vals = F.array_sort(F.transform(merged, lambda e: e["v"]))
    n = F.size(vals)
    cols = [
        F.element_at(
            vals,
            F.greatest(F.lit(1), F.ceil(F.lit(float(p)) * n).cast("int")),
        ).alias(f"p{int(round(p * 100)):02d}")
        for p in percentiles
    ]
    return sketches.groupBy(*group_cols).agg(
        *cols, F.size(vals).alias("sample_rows")
    )
