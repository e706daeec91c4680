"""DSIR-style importance resampling for pretraining-data selection.

The published method (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling", NeurIPS — public paper): score every RAW
document by how much more likely its hashed word-n-gram features are under
a TARGET distribution (a small high-quality corpus: Wikipedia, curated
books, an in-domain eval mix) than under the raw-corpus distribution, then
keep the top slice / resample proportionally to the importance weight
``log w(x) = Σ_features [log p_target(b) − log p_raw(b)]``.

The reference engine has no data-selection layer (its per-record logic
lives in user containers, MaRe.scala:63-100); this extends the
corpus-preparation family the same way the samplers and quality scorers do.

Scale shape — everything is aggregates over a FIXED bucket space:

* feature extraction is scan-side expression code (normalize → split →
  n-gram slices → md5 bucket), zero Python, fused into the scan;
* the two distributions are one map-side-combined groupBy each over
  ``num_buckets`` keys (8-65k rows — broadcastable by construction, no
  matter how big the corpora are);
* per-document scoring joins the exploded features to the broadcast
  log-ratio table and sums — ONE shuffle keyed on the document id.
  At 100 TB nothing in the plan grows beyond the corpus scan itself.

Hash-stability (the registry-wide conventions, mare_spark/numeric.py):
with integer ``alpha`` the smoothed ratio is a division of two EXACT
int64 products (counts are bounded by total gram occurrences; the
products stay far under 2^53, so both engines build the identical IEEE
double), ``ln`` of identical doubles agrees across engines (the
unigram_logprob precedent), each log-ratio is snapped to the 6dp grid,
and the per-document sum runs in DECIMAL so partition order can't flip
the value hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mare_spark.numeric import fround
from mare_spark.operators.analysis import word_ngrams


def hashed_gram_buckets(
    text_col: Column, *, ns: tuple[int, ...] = (1, 2), num_buckets: int = 8192
) -> Column:
    """``array<long>`` of hashed word-n-gram feature buckets (DSIR's
    hashed-ngram featurization: unigrams+bigrams by default, md5 → 32-bit
    prefix → mod ``num_buckets`` — the established md5→int parity pattern,
    so a DuckDB oracle replays it byte-for-byte)."""
    if num_buckets < 1:
        raise ValueError(
            f"num_buckets must be >= 1, got {num_buckets} (long % 0 is "
            "NULL in non-ANSI Spark — every feature would silently drop "
            "at the scoring join)"
        )
    grams = F.concat(*[word_ngrams(text_col, n) for n in ns])
    return F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
        % num_buckets,
    )


def bucket_counts(
    df: DataFrame,
    text_col: str,
    *,
    ns: tuple[int, ...] = (1, 2),
    num_buckets: int = 8192,
) -> DataFrame:
    """``(bucket, cnt)`` feature-occurrence counts — the distribution
    estimate for one corpus. One explode + one map-side-combined aggregate
    over at most ``num_buckets`` output rows."""
    b = hashed_gram_buckets(F.col(text_col), ns=ns, num_buckets=num_buckets)
    return (
        df.select(F.explode(b).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_logratios(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str,
    *,
    ns: tuple[int, ...] = (1, 2),
    num_buckets: int = 8192,
    alpha: int = 1,
) -> DataFrame:
    """The dense per-bucket importance table ``(bucket, logratio)`` over
    the FULL bucket range:

    ``logratio_b = round6(ln( ((t_b+α)·(R+αB)) / ((r_b+α)·(T+αB)) ))``

    i.e. ``log p_target(b) − log p_raw(b)`` with add-α smoothing, algebra
    arranged as ONE division of two exact integer products so both engines
    hit identical doubles (see module docstring). Dense (unseen buckets
    carry the smoothed prior) so scoring never drops a feature. ``α`` is
    an integer by contract — a float α would reintroduce cross-engine
    floating-point drift for zero gain.

    Output is ≤ ``num_buckets`` rows: broadcast it into the scoring join.
    """
    if not isinstance(alpha, int) or isinstance(alpha, bool) or alpha < 1:
        # a FLOAT alpha would silently turn the one-exact-division
        # guarantee into double arithmetic (cross-engine drift)
        raise ValueError(f"alpha must be a positive integer, got {alpha!r}")
    spark = raw_df.sparkSession
    t = bucket_counts(target_df, text_col, ns=ns, num_buckets=num_buckets)
    r = bucket_counts(raw_df, text_col, ns=ns, num_buckets=num_buckets)
    # coalesce to 0: sum() over an EMPTY corpus is NULL, which would
    # silently NULL every logratio (the oracle's count(*) totals are 0
    # on empty — this keeps the engines in lockstep; r8 review)
    tot_t = t.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("T"))
    tot_r = r.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("R"))
    dense = (
        spark.range(num_buckets).withColumnRenamed("id", "bucket")
        .join(t.withColumnRenamed("cnt", "t_cnt"), "bucket", "left")
        .join(r.withColumnRenamed("cnt", "r_cnt"), "bucket", "left")
        .join(F.broadcast(tot_t))
        .join(F.broadcast(tot_r))
    )
    a = F.lit(alpha)
    num = (F.coalesce("t_cnt", F.lit(0)) + a) * (
        F.col("R") + a * F.lit(num_buckets)
    )
    den = (F.coalesce("r_cnt", F.lit(0)) + a) * (
        F.col("T") + a * F.lit(num_buckets)
    )
    # exact-double invariant, CHECKED (r8 review): the parity story
    # needs both int64 products representable exactly as doubles, i.e.
    # < 2^53. (t_cnt+a) <= (T+a), so bounding the total-level products
    # bounds every bucket's. Past the bound the engines would diverge
    # silently (Spark wraps int64, DuckDB errors) — raise with the dial
    # to turn instead. Lazy per-row check on <= num_buckets rows.
    limit = float(2 ** 53)
    ab = a * F.lit(num_buckets)
    too_big = (
        ((F.col("T") + a).cast("double") * (F.col("R") + ab).cast("double")
         >= limit)
        | ((F.col("R") + a).cast("double") * (F.col("T") + ab).cast("double")
           >= limit)
    )
    ratio = num.cast("double") / den.cast("double")
    return dense.select(
        "bucket",
        F.when(
            too_big,
            F.raise_error(F.lit(
                "dsir_logratios: smoothed-ratio products exceed 2^53 — "
                "the exact-double cross-engine parity would break (and "
                "int64 would overflow); shard the corpus or aggregate "
                "counts at a coarser granularity"
            )),
        ).otherwise(fround(F.log(ratio), 6)).alias("logratio"),
    )


def dsir_importance_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    logratios: DataFrame,
    *,
    ns: tuple[int, ...] = (1, 2),
    num_buckets: int = 8192,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document log importance weight under a learned
    :func:`dsir_logratios` table: ``(id, n_feats, log_weight)`` where
    ``log_weight = Σ_features logratio[bucket]`` (6dp-grid terms summed in
    DECIMAL — order-independent). Documents with zero features (empty
    text normalizes to one empty token, which IS a feature, so only
    genuinely featureless inputs drop) are absent from the output.

    Selection policies compose downstream: top-k by weight for the
    deterministic slice, or pair ``log_weight`` with the Gumbel trick /
    ``deterministic_uniform`` for the paper's sampled variant.

    ``ns``/``num_buckets`` MUST match the values the log-ratio table was
    learned with — the bucket id is meaningless across featurizations.
    """
    b = hashed_gram_buckets(F.col(text_col), ns=ns, num_buckets=num_buckets)
    feats = df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        F.explode(b).alias("bucket"),
    )
    lr6 = F.col("logratio").cast("decimal(28,6)")
    return (
        feats.join(F.broadcast(logratios), "bucket")
        .groupBy(id_col, *keep_cols)
        .agg(
            F.count("*").alias("n_feats"),
            F.sum(lr6).cast("double").alias("_lw"),
        )
        .select(
            id_col, *keep_cols,
            "n_feats",
            fround(F.col("_lw"), 6).alias("log_weight"),
        )
    )


def dsir_gumbel_topk(
    weights_df: DataFrame,
    id_col: str,
    k: int,
    *,
    weight_col: str = "log_weight",
    salt: str = "",
) -> DataFrame:
    """The paper's resampling step: sample ``k`` documents WITHOUT
    replacement with probability proportional to the importance weight,
    via the Gumbel top-k trick — ``key = log w + g`` with
    ``g = −ln(−ln(u))`` and take the k largest keys.

    ``u`` is the md5-uniform of ``(id, salt)`` offset by +0.5/2^32 so it
    is strictly inside (0, 1) (``deterministic_uniform`` itself can land
    exactly on 0, where the Gumbel blows up) — a pure function of the
    key, so the sample is reproducible across runs, partition layouts,
    and engines, and a new ``salt`` draws a fresh sample. Each ``ln`` is
    6dp-grid-snapped before the next stage consumes it, so a DuckDB
    oracle replays the key bit-for-bit.

    Plan: scan-side key arithmetic + TakeOrderedAndProject — no sort of
    the full weight table materializes.

    Appends ``gumbel_key`` (kept in the output on purpose: re-auditing a
    selection months later needs the realized keys, not just the ranks).
    """
    from mare_spark.operators.text import deterministic_uniform

    # the SHARED md5-uniform + an exact +0.5/2^32 offset ((2h+1)*2^-33 is
    # representable, so this is bit-identical to (h+0.5)/2^32 — one
    # definition for every sampler, r8 review). NULL ids are EXCLUDED
    # up front: their NULL u would slip through least() (which ignores
    # NULLs on both engines) straight to the clamp, handing NULL-id docs
    # the MAXIMUM gumbel bonus — deterministic_uniform's contract says
    # consumers must filter.
    weights_df = weights_df.filter(F.col(id_col).isNotNull())
    u = deterministic_uniform(F.col(id_col), salt) + F.lit(0.5 / float(1 << 32))
    # ln(u) < 0, snapped to the 6dp grid. For u within ~5e-7 of 1 the
    # snap lands exactly on 0 and -ln(-0) would be NULL under Spark
    # (silently unsampleable) and an error/divergence in a SQL oracle —
    # clamp to the first negative grid point so every doc keeps a finite
    # key. Mirrored verbatim in the registered oracle SQL.
    inner = F.least(fround(F.log(u), 6), F.lit(-0.000001))
    g = fround(-F.log(-inner), 6)
    return (
        weights_df.withColumn("gumbel_key", F.col(weight_col) + g)
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(k)
    )
