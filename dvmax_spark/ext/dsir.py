"""[EXT] DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, public): score every raw-corpus document by how
target-like its hashed n-gram profile is, then keep the top mass.
The importance weight of a document is

    log w(x) = sum_{g in grams(x)} log p_target(bucket(g))
                                 - log p_raw(bucket(g))

where both distributions are bag-of-hashed-n-gram unigram models with
add-one smoothing over a FIXED number of hash buckets. Because the
feature space is a fixed-size bucket table (not the open vocabulary),
the model fits in a broadcast no matter how large the corpus is.

Scale shape (the part that survives 100 TB):
  * one explode -> hash-bucket pass over the corpus (map-side),
  * two hash-aggregations whose OUTPUT is O(buckets) rows — partial
    aggregation collapses each executor's stream before the shuffle,
  * the per-bucket log-ratio table is broadcast back (O(buckets)),
  * per-doc weight is one more partial aggregation, shuffled on doc_id.
  No global structure other than the tiny bucket table; the only
  global sort lives in the SELECTION step, where the toy-scale exact
  rank is documented as replaceable by a KLL/approx-quantile threshold
  (ext/sketches.py) at real scale.

Cross-engine float policy: every per-bucket log-ratio is computed from
exact-integer-valued doubles (products < 2^53), rounded once to 1e-6
and scaled to BIGINT; per-document weights are then exact integer sums
— no distributed float summation anywhere, so Spark and DuckDB agree
bit-for-bit (the `ppm` pattern used across this repo).

Reference behavioral parity: the reference engine has no data-
selection stage; this extends the training-data funnel (SURVEY §2 X18
-X21) with the standard importance-resampling recipe from the public
paper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dvmax_spark.ext.dedup import _portable_hash, shingle_stream
from dvmax_spark.ext.traindata import _DUCK_HASH

__all__ = [
    "dsir_bucket_counts",
    "dsir_logweights",
    "dsir_score",
    "dsir_select",
    "dsir_select_sql",
]


def _gram_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    buckets: int,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id_col, *extra_cols, b) — one row per n-gram occurrence, with
    the gram hashed into ``[0, buckets)`` by the engine-portable md5
    hash. Multiplicity is kept (bag-of-n-grams, per the paper)."""
    cols = [F.col(id_col)] + [F.col(c) for c in extra_cols]
    return shingle_stream(
        df, text_col, n, cols=(id_col, *extra_cols), gpos_col=None, g_col="_g"
    ).select(*cols, (_portable_hash(F.col("_g")) % buckets).alias("b"))


def _log_ratio_x1e6(buckets: int) -> Column:
    """Per-bucket CAST(round(1e6 * log10(p_t/p_r)) AS BIGINT) from the
    raw integer counts. All four factors are exact integers cast to
    double before multiplying (products stay < 2^53 at any sf this
    repo tests), so both engines feed log10 the identical double."""
    num = (F.col("c_t") + 1).cast("double") * (F.col("n_r") + buckets).cast("double")
    den = (F.col("c_r") + 1).cast("double") * (F.col("n_t") + buckets).cast("double")
    return F.round(F.log10(num / den) * 1e6, 0).cast("long")


def dsir_bucket_counts(
    df: DataFrame,
    target: Column,
    n: int = 2,
    buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The importance model's sufficient statistics: ``(b, c_r, c_t)``
    — raw and target gram counts per hash bucket. A MONOID under
    per-bucket integer sum, which is what makes the model maintainable
    incrementally (batch unions, micro-batches, partial corpora all
    merge with one groupBy-sum; see streaming.ingest
    stream_into_dsir_model)."""
    gb = _gram_buckets(
        df.withColumn("_is_t", target.cast("int")), text_col, id_col, n, buckets,
        extra_cols=("_is_t",),
    )
    return gb.groupBy("b").agg(
        F.count(F.lit(1)).alias("c_r"),
        F.sum("_is_t").cast("long").alias("c_t"),
    )


def dsir_score(
    df: DataFrame,
    counts: DataFrame,
    n: int = 2,
    buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against an already-fitted model (``counts`` as
    produced by :func:`dsir_bucket_counts`, possibly accumulated over
    many batches): ``(id_col, n_grams, logw_x1e6)``. One corpus pass.
    Documents too short to emit a single n-gram get weight 0 (no
    evidence either way)."""
    totals = counts.agg(
        F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t")
    )
    lr = (
        counts.crossJoin(F.broadcast(totals))
        .select("b", _log_ratio_x1e6(buckets).alias("lr6"))
    )
    gb = _gram_buckets(df, text_col, id_col, n, buckets)
    docw = (
        gb.join(F.broadcast(lr), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("lr6").alias("logw_x1e6"),
        )
    )
    return (
        df.select(id_col)
        .join(docw, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("logw_x1e6", F.lit(0)).alias("logw_x1e6"),
        )
    )


def dsir_logweights(
    df: DataFrame,
    target: Column,
    n: int = 2,
    buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_col, n_grams, logw_x1e6)`` for every document, fitting
    the model on ``df`` itself (the paper's one-shot form).

    ``target`` is a boolean Column over ``df``'s rows marking the
    target domain (e.g. ``F.col("lang") == "en"``); the raw
    distribution is the whole of ``df``. Materializes the O(buckets)
    count table once (localCheckpoint) so the corpus is touched
    exactly twice — fit, then score — never three times.
    """
    counts = dsir_bucket_counts(
        df, target, n=n, buckets=buckets, id_col=id_col, text_col=text_col
    ).localCheckpoint()
    return dsir_score(
        df, counts, n=n, buckets=buckets, id_col=id_col, text_col=text_col
    )


def dsir_select(
    df: DataFrame,
    target: Column,
    pct: int = 25,
    n: int = 2,
    buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-``group_col`` report of DSIR top-``pct``% selection:
    ``(group, n_docs, n_selected, sel_logw_x1e6)``.

    Selection is the exact global rank (weight desc, id asc;
    floor(N*pct/100) docs kept) so the DuckDB oracle reproduces it
    bit-for-bit — but the rank is computed DISTRIBUTED
    (operators/distrank.py: range shuffle + per-partition row_number +
    broadcast offsets), never a single-partition window, so the benched
    plan is the 100 TB plan. For a cheaper approximate threshold at
    scale see :func:`dsir_select_kll` (mergeable KLL quantile sketch →
    map-side filter, no rank at all)."""
    from dvmax_spark.operators.distrank import with_global_rank

    w = dsir_logweights(df, target, n=n, buckets=buckets, id_col=id_col, text_col=text_col)
    # scored feeds both the N-count and the rank; materialize it once
    # so the scoring pass over the corpus runs once (r10, guide §5)
    scored = df.select(id_col, group_col).join(w, id_col).localCheckpoint(eager=False)
    total = scored.agg(F.count(F.lit(1)).alias("n_all"))
    ranked = with_global_rank(
        scored, [F.col("logw_x1e6").desc(), F.col(id_col).asc()], out_col="rn"
    ).crossJoin(F.broadcast(total))
    sel = (F.col("rn") * 100 <= F.col("n_all") * pct).cast("int")
    return (
        ranked.select(group_col, "logw_x1e6", sel.alias("is_sel"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("is_sel").cast("long").alias("n_selected"),
            F.sum(F.col("is_sel") * F.col("logw_x1e6")).alias("sel_logw_x1e6"),
        )
        .orderBy(group_col)
    )


def dsir_select_kll(
    df: DataFrame,
    target: Column,
    pct: int = 25,
    n: int = 2,
    buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Sketch-thresholded DSIR selection — the pure 100 TB form: a
    mergeable KLL quantile sketch over ``logw_x1e6`` yields the
    top-``pct``% weight threshold (one map-side-combined aggregate to a
    single ~1 KB sketch), and selection is then a broadcast scalar
    compare — NO rank, NO sort, NO global structure of any kind.

    Same output shape as :func:`dsir_select` so the two are directly
    comparable; the sketch's rank error (~0.02% at the default K) moves
    ``n_selected`` by at most that fraction of N, which
    tests/test_dsir.py pins as an agreement floor vs the exact form.
    Rows-only in the registry (DataSketches KLL compaction is
    randomized by design — no deterministic cross-engine oracle)."""
    w = dsir_logweights(df, target, n=n, buckets=buckets, id_col=id_col, text_col=text_col)
    # scored feeds both the sketch threshold and the rollup (r10)
    scored = df.select(id_col, group_col).join(w, id_col).localCheckpoint(eager=False)
    thr = scored.agg(
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double(F.col("logw_x1e6").cast("double")),
            F.lit(1.0 - pct / 100.0),
        ).alias("thr")
    )
    sel = (F.col("logw_x1e6") >= F.col("thr")).cast("int")
    return (
        scored.crossJoin(F.broadcast(thr))
        .select(group_col, "logw_x1e6", sel.alias("is_sel"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("is_sel").cast("long").alias("n_selected"),
            F.sum(F.col("is_sel") * F.col("logw_x1e6")).alias("sel_logw_x1e6"),
        )
        .orderBy(group_col)
    )


def _duck_grams_bag(n: int) -> str:
    """DuckDB word-n-gram list over str_split alias ``t`` WITH
    multiplicity (bag semantics — DSIR counts every occurrence),
    mirroring dedup.shingle_seq exactly (ext/traindata._duck_grams is
    the distinct-set twin of dedup.shingles)."""
    joins = " || ' ' || ".join(f"t[i+{k}]" for k in range(1, n))
    return (
        "list_filter(list_transform(t, (x, i) -> "
        f"CASE WHEN i + {n - 1} <= len(t) THEN x || ' ' || {joins} END), "
        "g -> g IS NOT NULL)"
    )


def dsir_select_sql(
    target_pred: str = "lang = 'en'",
    pct: int = 25,
    n: int = 2,
    buckets: int = 256,
    table: str = "documents",
    group_col: str = "source",
) -> str:
    """DuckDB twin of :func:`dsir_select` (target given as a SQL
    predicate over the table's columns)."""
    bucket_expr = f"{_DUCK_HASH.format(expr='_g')} % {buckets})"
    return f"""
    WITH toks AS (
      SELECT doc_id, {group_col}, CASE WHEN {target_pred} THEN 1 ELSE 0 END AS is_t,
             str_split(text, ' ') AS t
      FROM {table}
    ), gb AS (
      SELECT doc_id, is_t, {bucket_expr} AS b
      FROM (SELECT doc_id, is_t, unnest({_duck_grams_bag(n)}) AS _g FROM toks)
    ), counts AS (
      SELECT b, count(*) AS c_r, CAST(sum(is_t) AS BIGINT) AS c_t
      FROM gb GROUP BY b
    ), tot AS (
      SELECT CAST(sum(c_r) AS BIGINT) AS n_r, CAST(sum(c_t) AS BIGINT) AS n_t
      FROM counts
    ), lr AS (
      SELECT b, CAST(round(log10(
               ((c_t + 1)::DOUBLE * (n_r + {buckets})::DOUBLE) /
               ((c_r + 1)::DOUBLE * (n_t + {buckets})::DOUBLE)) * 1e6) AS BIGINT) AS lr6
      FROM counts, tot
    ), docw AS (
      SELECT doc_id, CAST(sum(lr6) AS BIGINT) AS logw_x1e6
      FROM gb JOIN lr USING (b) GROUP BY doc_id
    ), scored AS (
      SELECT d.doc_id, d.{group_col}, COALESCE(w.logw_x1e6, 0) AS logw_x1e6
      FROM {table} d LEFT JOIN docw w USING (doc_id)
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY logw_x1e6 DESC, doc_id) AS rn,
             count(*) OVER () AS n_all
      FROM scored
    )
    SELECT {group_col}, count(*) AS n_docs,
           CAST(sum(CASE WHEN rn * 100 <= n_all * {pct} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_selected,
           CAST(sum(CASE WHEN rn * 100 <= n_all * {pct} THEN logw_x1e6 ELSE 0 END) AS BIGINT)
             AS sel_logw_x1e6
    FROM ranked GROUP BY {group_col} ORDER BY {group_col}
    """
