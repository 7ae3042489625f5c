"""[EXT] Training-data pipeline stages a 100 TB pre-training corpus
needs between "raw documents" and "tokens on GPUs": benchmark
decontamination, deterministic splits, sequence packing, stratified
sampling (X18-X21).

All four are deterministic by construction (portable md5-derived
hashes, explicit orderings) so each has an exact DuckDB oracle — the
SQL generators live next to the Spark implementations and share
constants by construction.

Scale shapes (the part that matters at 100 TB):
  * decontamination — eval-set n-grams are tiny next to the corpus
    (benchmarks are ~1e5 grams): DISTINCT then broadcast; the train
    side streams map-side through explode -> broadcast semi-join, no
    corpus-wide shuffle. With a large eval set, drop the broadcast
    hint and it degrades to a plain shuffled semi-join on the gram.
  * split / sample — pure per-row hash arithmetic, map-only; the
    aggregate afterwards is a partial-agg groupBy on a tiny key space.
  * packing — one shuffle on the synthetic bucket key, then a per-
    bucket ordered window (streaming single pass); bucket count is the
    parallelism knob, so no global sort anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dvmax_spark.ext.dedup import _portable_hash, shingles

__all__ = [
    "hash_bucket",
    "contaminated_ids",
    "decontaminate",
    "train_split",
    "pack_sequences",
    "stratified_sample",
    "mixture_rebalance",
    "traindata_funnel",
    "write_training_shards",
]

# DuckDB twin of ext.dedup._portable_hash — kept adjacent so the two
# engines can't drift apart.
_DUCK_HASH = "(('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def _duck_bucket(expr: str, mod: int) -> str:
    return f"{_DUCK_HASH.format(expr=expr)} % {mod})"


def hash_bucket(col: Column | str, mod: int) -> Column:
    """Deterministic engine-portable bucket in [0, mod): md5-derived
    60-bit hash of the value's string form. Used for splits, sampling
    and packing so re-runs (and other engines) assign identically."""
    c = F.col(col) if isinstance(col, str) else col
    return _portable_hash(c.cast("string")) % mod


def contaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """IDs of training docs sharing at least one word ``n``-gram with
    the eval set (the standard benchmark-decontamination test, e.g.
    GPT-3 appendix C / PaLM §7: drop training docs with n-gram overlap
    against benchmark data)."""
    ev = eval_df.select(F.explode(shingles(text_col, n)).alias("g")).distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = train.select(F.col(id_col), F.explode(shingles(text_col, n)).alias("g"))
    return tr.join(ev, "g", "left_semi").select(id_col).distinct()


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """``train`` minus contaminated docs (anti-join on contaminated_ids)."""
    bad = contaminated_ids(train, eval_df, n, id_col, text_col, broadcast_eval)
    return train.join(bad, id_col, "left_anti")


def contamination_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_ppm: int = 500_000,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-doc contamination DEGREE (the finer sibling of the boolean
    ``contaminated_ids``): for every training doc, the fraction of its
    DISTINCT word ``n``-grams that also occur in the eval set —
    PaLM §7-style graded overlap, where a doc is flagged only when the
    overlap fraction crosses a threshold rather than on any single
    shared gram.

    Fraction reported in EXACT integer ppm (bigint `div`, matching
    DuckDB `//`), so parity is bit-exact. Docs with no grams (shorter
    than ``n`` words) report 0/0 -> 0 ppm, not contaminated.

    Scale shape: identical to decontaminate — the eval gram set
    broadcasts (benchmarks are tiny next to a 100 TB corpus), the
    corpus streams through ONE map-side semi-match aggregated per doc;
    corpus grams never shuffle on the gram key.
    """
    ev = eval_df.select(F.explode(shingles(text_col, n)).alias("g")).distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = train.select(F.col(id_col), F.explode(shingles(text_col, n)).alias("g"))
    hit = tr.join(ev, "g", "left_semi").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    base = train.select(
        F.col(id_col),
        F.size(shingles(text_col, n)).cast("bigint").alias("n_grams"),
    )
    out = (
        base.join(hit, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint").alias("n_hit"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hit",
            F.expr(
                "CASE WHEN n_grams > 0 THEN (1000000 * n_hit) div n_grams "
                "ELSE 0 END"
            )
            .cast("bigint")
            .alias("overlap_ppm"),
        )
    )
    return out.select(
        id_col,
        "n_grams",
        "n_hit",
        "overlap_ppm",
        (F.col("overlap_ppm") >= threshold_ppm).alias("contaminated"),
    ).orderBy(id_col)


def contamination_overlap_sql(
    n: int = 5, eval_source: str = "src0", threshold_ppm: int = 500_000
) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, source, str_split(text, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id, source, unnest({_duck_grams(n)}) AS g FROM toks
    ), ev AS (
      SELECT DISTINCT g FROM grams WHERE source = '{eval_source}'
    ), hit AS (
      SELECT grams.doc_id, count(*) AS n_hit
      FROM grams SEMI JOIN ev USING (g)
      WHERE source <> '{eval_source}'
      GROUP BY grams.doc_id
    ), base AS (
      SELECT doc_id, CAST(len({_duck_grams(n)}) AS BIGINT) AS n_grams
      FROM toks WHERE source <> '{eval_source}'
    )
    SELECT b.doc_id, b.n_grams,
           CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           CAST(CASE WHEN b.n_grams > 0
                THEN (1000000 * coalesce(h.n_hit, 0)) // b.n_grams
                ELSE 0 END AS BIGINT) AS overlap_ppm,
           (CASE WHEN b.n_grams > 0
                THEN (1000000 * coalesce(h.n_hit, 0)) // b.n_grams
                ELSE 0 END) >= {threshold_ppm} AS contaminated
    FROM base b LEFT JOIN hit h USING (doc_id)
    ORDER BY b.doc_id
    """


def train_split(
    df: DataFrame,
    id_col: str = "doc_id",
    pct_train: int = 90,
    pct_val: int = 5,
) -> DataFrame:
    """Add a deterministic ``split`` column (train/val/test) from a
    portable hash of the id — reproducible across runs, engines and
    cluster sizes (never ``rand()``: a retried task would re-draw)."""
    b = hash_bucket(id_col, 100)
    split = (
        F.when(b < pct_train, F.lit("train"))
        .when(b < pct_train + pct_val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def pack_sequences(
    df: DataFrame,
    ctx_len: int = 128,
    n_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign docs to fixed-size context windows (GPT-style sequence
    packing: concatenate docs in a deterministic order, chunk every
    ``ctx_len`` tokens; a doc belongs to the window its first token
    lands in).

    Docs are spread over ``n_buckets`` independent streams by portable
    hash so packing parallelizes (each bucket is one window partition —
    no global sort); within a bucket the order is ``id_col``. Returns
    one row per (bucket, seq_id) with doc/token counts.
    """
    n_tok = F.size(F.split(F.col(text_col), " "))
    staged = df.select(
        F.col(id_col),
        n_tok.alias("n_tok"),
        hash_bucket(id_col, n_buckets).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    # `div` = exact integer division (bigint), matching DuckDB's `//`
    # for ANY ctx_len — true division + cast can round across a window
    # boundary once cumulative counts pass 2^53.
    seqd = staged.withColumn(
        "start", F.sum("n_tok").over(w) - F.col("n_tok")
    ).select(
        "bucket",
        F.expr(f"start div {int(ctx_len)}").alias("seq_id"),
        "n_tok",
    )
    return (
        seqd.groupBy("bucket", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("seq_tokens"),
        )
        .orderBy("bucket", "seq_id")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    pct: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sample: keep ids whose hash bucket is
    below ``pct``; report per-stratum totals/kept so the downstream
    mixture is auditable. Map-only + tiny-key aggregate."""
    kept = (hash_bucket(id_col, 100) < pct).cast("int")
    return (
        df.select(F.col(strata_col), kept.alias("kept"))
        .groupBy(strata_col)
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_kept"),
        )
        .orderBy(strata_col)
    )


def group_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pct_train: int = 80,
    pct_val: int = 10,
) -> DataFrame:
    """Leakage-safe split: near-duplicate documents must land in the
    SAME split, or eval leaks training data (the well-known dedup-
    before-split rule). Composition of two existing bounded pieces:
    connected components over near-dup pairs (ext.dedup.dedup_clusters)
    → portable hash of the CLUSTER id, so every member of a component
    draws the same split. Adds no new scale surface beyond clustering
    itself; the split is map-side arithmetic on the component label."""
    from dvmax_spark.ext.dedup import dedup_clusters

    comp = dedup_clusters(df, pairs, id_col=id_col).select(id_col, "cluster_id")
    b = hash_bucket(F.col("cluster_id").cast("string"), 100)
    split = (
        F.when(b < pct_train, F.lit("train"))
        .when(b < pct_train + pct_val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return comp.select(id_col, "cluster_id", split.alias("split"))


# ---------------------------------------------------------------- oracles


def _duck_grams(n: int) -> str:
    """DuckDB word-n-gram list over str_split alias ``t`` (distinct,
    nothing emitted for docs shorter than n) — mirrors dedup.shingles."""
    joins = " || ' ' || ".join(f"t[i+{k}]" for k in range(1, n))
    return (
        "list_distinct(list_filter(list_transform(t, (x, i) -> "
        f"CASE WHEN i + {n - 1} <= len(t) THEN x || ' ' || {joins} END), "
        "g -> g IS NOT NULL))"
    )


def decontaminate_sql(n: int = 5, eval_source: str = "src0") -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, source, str_split(text, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id, source, unnest({_duck_grams(n)}) AS g FROM toks
    ), ev AS (
      SELECT DISTINCT g FROM grams WHERE source = '{eval_source}'
    ), contam AS (
      SELECT DISTINCT grams.doc_id FROM grams JOIN ev USING (g)
      WHERE source <> '{eval_source}'
    )
    SELECT d.source, count(*) AS n_docs,
           CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
    FROM documents d LEFT JOIN contam c USING (doc_id)
    WHERE d.source <> '{eval_source}'
    GROUP BY d.source ORDER BY d.source
    """


def train_split_sql(pct_train: int = 90, pct_val: int = 5) -> str:
    b = _duck_bucket("doc_id::VARCHAR", 100)
    return f"""
    SELECT CASE WHEN {b} < {pct_train} THEN 'train'
                WHEN {b} < {pct_train + pct_val} THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents GROUP BY split ORDER BY split
    """


def pack_sequences_sql(ctx_len: int = 128, n_buckets: int = 8) -> str:
    return f"""
    WITH t AS (
      SELECT doc_id, len(str_split(text, ' ')) AS n_tok,
             {_duck_bucket("doc_id::VARCHAR", n_buckets)} AS bucket
      FROM documents
    ), c AS (
      SELECT bucket, n_tok,
             sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id) AS cum
      FROM t
    )
    SELECT bucket, CAST((cum - n_tok) // {ctx_len} AS BIGINT) AS seq_id,
           count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS seq_tokens
    FROM c GROUP BY bucket, seq_id ORDER BY bucket, seq_id
    """


def traindata_funnel(
    df: DataFrame,
    n: int = 5,
    eval_source: str = "src0",
    ctx_len: int = 128,
    n_buckets: int = 8,
    sample_pct: int = 20,
    min_chars: int = 1,
) -> DataFrame:
    """The whole pre-training curation funnel as ONE dataflow — the
    composition a real pipeline runs, per split:

      clean (drop null text / sub-``min_chars`` docs)
        -> decontaminate vs the ``eval_source`` slice (X18)
        -> deterministic train/val/test assignment (X19)
        -> pack survivors into ``ctx_len``-token windows per
           (split, bucket) stream (X20)
        -> deterministic ``sample_pct``% per-doc sample audit (X21)

    Output: one row per split with docs/tokens/context-windows/kept
    counts. Scale shape is the union of the stages' shapes: broadcast
    semi-join for decontamination, map-side hash arithmetic for
    split+sample, ONE shuffle on (split, bucket) for packing — the
    window count aggregates per bucket stream, never a global sort."""
    clean = df.where(F.col("text").isNotNull() & (F.col("n_chars") >= min_chars))
    ev = clean.where(F.col("source") == eval_source)
    tr = clean.where(F.col("source") != eval_source)
    surv = decontaminate(tr, ev, n=n)
    sp = train_split(surv)
    staged = sp.select(
        "split",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
        hash_bucket("doc_id", n_buckets).alias("bucket"),
        (hash_bucket("doc_id", 100) < sample_pct).cast("int").alias("kept"),
    )
    w = Window.partitionBy("split", "bucket").orderBy("doc_id")
    seqd = staged.withColumn(
        "start", F.sum("n_tok").over(w) - F.col("n_tok")
    ).withColumn("seq_id", F.expr(f"start div {int(ctx_len)}"))
    # encode (bucket, seq_id) as one bigint so the distinct-window count
    # is engine-portable (struct distinct hashing differs across engines)
    seq_key = F.col("bucket") * F.lit(1_000_000_000_000) + F.col("seq_id")
    return (
        seqd.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.countDistinct(seq_key).alias("n_windows"),
            F.sum("kept").alias("n_sampled"),
        )
        .orderBy("split")
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    ctx_len: int = 128,
    n_buckets: int = 8,
    seqs_per_shard: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """The pipeline's LAST step: materialize packed training sequences
    as bounded-size zstd parquet shards plus a JSON manifest — what a
    training job actually mounts.

    Each output row is one context window: (bucket, seq_id, doc_ids in
    packing order, n_docs, seq_tokens). Shard size is bounded by
    repartitioning the window table to ceil(windows / seqs_per_shard)
    writer tasks; at cluster scale that bound is what keeps shards
    loader-friendly (hundreds of MB) regardless of corpus size. The
    doc list per window is sort_array(collect_list(...)) so shard
    contents are deterministic — a re-run byte-compares equal.

    Returns the manifest (windows/docs/tokens/shards) which is also
    written to ``out_dir/manifest.json``.
    """
    import json
    import math

    staged = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("n_tok"),
        hash_bucket(id_col, n_buckets).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    seqd = staged.withColumn(
        "start", F.sum("n_tok").over(w) - F.col("n_tok")
    ).withColumn("seq_id", F.expr(f"start div {int(ctx_len)}"))
    windows = (
        seqd.groupBy("bucket", "seq_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("start", F.col(id_col)))).alias("_docs"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("seq_tokens"),
        )
        .select(
            "bucket",
            "seq_id",
            F.transform("_docs", lambda s: s[id_col]).alias("doc_ids"),
            "n_docs",
            "seq_tokens",
        )
    )
    # materialize once: count(), the shard write, and the manifest agg
    # would otherwise each re-run the split/window/groupBy pipeline —
    # the most expensive step of the whole corpus path
    windows = windows.localCheckpoint()
    n_windows = windows.count()
    n_shards = max(1, math.ceil(n_windows / seqs_per_shard))
    (
        windows.repartition(n_shards, "bucket", "seq_id")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(os.path.join(out_dir, "shards"))
    )
    agg = windows.select(
        F.sum("n_docs").alias("n_docs"),
        F.sum("seq_tokens").alias("n_tokens"),
    ).first()
    manifest = {
        "ctx_len": ctx_len,
        "n_buckets": n_buckets,
        "n_windows": int(n_windows),
        # sum() over zero rows is NULL — an empty corpus (everything
        # decontaminated / split away) must yield a clean empty manifest
        "n_docs": int(agg["n_docs"] or 0),
        "n_tokens": int(agg["n_tokens"] or 0),
        "n_shards": n_shards,
        "seqs_per_shard": seqs_per_shard,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def mixture_rebalance(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    approximate: bool = False,
) -> DataFrame:
    """Balance the corpus mixture: downsample every stratum to the
    smallest stratum's size (uniform target mixture — the standard
    rebalancing move before weighting a pre-training mix).

    Selection is deterministic: within a stratum, the quota goes to
    the lowest portable-hash docs (tie-break id), so re-runs and other
    engines pick the SAME documents — never ``rand()``.

    Two physical paths:
      * exact (default): per-stratum row_number over the hash — one
        shuffle on the stratum key. Parallelism = #strata; right when
        strata are many or moderate. A single mega-stratum serializes
        its ranking into one reducer, which is where the
        ``approximate`` path comes in.
      * approximate: keep docs whose hash falls below quota/n of the
        hash space — fully map-side (the stratified_sample shape), no
        per-stratum sort, binomially-close to quota rather than exact.
        The 100 TB default.

    Returns the per-stratum audit (n_total, n_kept); the same logic
    inline selects the rows themselves in a pipeline.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    # quota = min stratum size; the counts frame is |strata| rows, so
    # the empty-partition (single-reducer) window is fine HERE.
    quota = counts.select(F.min("_n").alias("_quota"))
    if approximate:
        frac = F.col("_quota") / F.col("_n")
        keep = (
            (_portable_hash(F.col(id_col).cast("string")) % 1_000_000)
            < (frac * 1_000_000).cast("bigint")
        ).cast("int")
        return (
            df.join(F.broadcast(counts), strata_col)
            .crossJoin(F.broadcast(quota))
            .select(strata_col, keep.alias("_keep"))
            .groupBy(strata_col)
            .agg(F.count(F.lit(1)).alias("n_total"), F.sum("_keep").alias("n_kept"))
            .orderBy(strata_col)
        )
    w = Window.partitionBy(strata_col).orderBy(
        _portable_hash(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    ranked = (
        df.select(strata_col, id_col)
        .withColumn("_rk", F.row_number().over(w))
        .crossJoin(F.broadcast(quota))
    )
    return (
        ranked.groupBy(strata_col)
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum((F.col("_rk") <= F.col("_quota")).cast("int")).alias("n_kept"),
        )
        .orderBy(strata_col)
    )


def mixture_rebalance_sql(strata_col: str = "source") -> str:
    h = _DUCK_HASH.format(expr="doc_id::VARCHAR") + ")"
    return f"""
    WITH ranked AS (
      SELECT {strata_col},
             row_number() OVER (PARTITION BY {strata_col}
                                ORDER BY {h} ASC, doc_id ASC) AS rk
      FROM documents
    ), quota AS (
      SELECT min(n) AS q FROM (
        SELECT count(*) AS n FROM documents GROUP BY {strata_col}
      )
    )
    SELECT {strata_col}, count(*) AS n_total,
           CAST(sum(CASE WHEN rk <= quota.q THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM ranked, quota
    GROUP BY {strata_col} ORDER BY {strata_col}
    """


def traindata_funnel_sql(
    n: int = 5,
    eval_source: str = "src0",
    ctx_len: int = 128,
    n_buckets: int = 8,
    sample_pct: int = 20,
    min_chars: int = 1,
) -> str:
    b100 = _duck_bucket("doc_id::VARCHAR", 100)
    return f"""
    WITH clean AS (
      SELECT * FROM documents WHERE text IS NOT NULL AND n_chars >= {min_chars}
    ), toks AS (
      SELECT doc_id, source, str_split(text, ' ') AS t FROM clean
    ), grams AS (
      SELECT doc_id, source, unnest({_duck_grams(n)}) AS g FROM toks
    ), ev AS (
      SELECT DISTINCT g FROM grams WHERE source = '{eval_source}'
    ), contam AS (
      SELECT DISTINCT grams.doc_id FROM grams JOIN ev USING (g)
      WHERE source <> '{eval_source}'
    ), surv AS (
      SELECT c.* FROM clean c LEFT JOIN contam x USING (doc_id)
      WHERE c.source <> '{eval_source}' AND x.doc_id IS NULL
    ), staged AS (
      SELECT doc_id,
             CASE WHEN {b100} < 90 THEN 'train'
                  WHEN {b100} < 95 THEN 'val'
                  ELSE 'test' END AS split,
             len(str_split(text, ' ')) AS n_tok,
             {_duck_bucket("doc_id::VARCHAR", n_buckets)} AS bucket,
             CASE WHEN {b100} < {sample_pct} THEN 1 ELSE 0 END AS kept
      FROM surv
    ), seqd AS (
      SELECT split, bucket, n_tok, kept,
             (sum(n_tok) OVER (PARTITION BY split, bucket ORDER BY doc_id)
              - n_tok) // {ctx_len} AS seq_id
      FROM staged
    )
    SELECT split, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           count(DISTINCT bucket * 1000000000000 + seq_id) AS n_windows,
           CAST(sum(kept) AS BIGINT) AS n_sampled
    FROM seqd GROUP BY split ORDER BY split
    """


def stratified_sample_sql(pct: int = 20) -> str:
    b = _duck_bucket("doc_id::VARCHAR", 100)
    return f"""
    SELECT lang, count(*) AS n_total,
           CAST(sum(CASE WHEN {b} < {pct} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents GROUP BY lang ORDER BY lang
    """


def group_split_sql(pct_train: int = 80, pct_val: int = 10) -> str:
    """DuckDB twin of :func:`group_split` over MinHash-LSH components
    (same CTE chain as dedup_clusters_sql, same portable bucket)."""
    from dvmax_spark.ext.dedup import _minhash_lsh_ctes

    ctes = _minhash_lsh_ctes(32, 16, 2, 0.1, "documents")
    b = _duck_bucket("c.cluster_id::VARCHAR", 100)
    return f"""
    WITH RECURSIVE {ctes},
    edges AS MATERIALIZED (
      SELECT id_a AS s, id_b AS d FROM lsh_pairs
      UNION
      SELECT id_b AS s, id_a AS d FROM lsh_pairs
    ),
    reach(src, node) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.src, e.d FROM reach r JOIN edges e ON e.s = r.node
    ),
    comp AS (
      SELECT node AS doc_id, min(src) AS cluster_id FROM reach GROUP BY node
    )
    SELECT c.doc_id, c.cluster_id,
           CASE WHEN {b} < {pct_train} THEN 'train'
                WHEN {b} < {pct_train + pct_val} THEN 'val'
                ELSE 'test' END AS split
    FROM comp c
    ORDER BY c.doc_id
    """


def source_quota(
    df: DataFrame,
    quota: int = 10,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source (per-domain) quota capping — the mixture-health
    counterpart of dedup (Gopher/RefinedWeb cap any one domain's share
    so a crawl whale can't dominate the mixture): rank each source's
    docs by quality (desc, id tie-break) and keep the top ``quota``.
    Reports per source how many docs survived and the kept quality
    band.

    Quality is the X8 heuristic (ext.textstats.quality_score), rounded
    to 4dp BEFORE ranking — ranking on raw computed floats lets ulp
    drift flip ranks across engines (verify-skill rule).

    Scale: one rank window partitioned by source + one aggregate on
    the same key (single shuffle). A mega-domain makes a hot window
    partition — AQE skew handling applies, and at whale scale the
    two-phase salted top-k (operators/skew.py) swaps in; the aggregate
    itself is partial either way.
    """
    from dvmax_spark.ext.textstats import quality_score

    q = quality_score(df).select(
        F.col(id_col), F.col(source_col), F.round("quality", 4).alias("q")
    )
    w = Window.partitionBy(source_col).orderBy(F.desc("q"), F.asc(id_col))
    ranked = q.withColumn("rk", F.row_number().over(w))
    kept = (F.col("rk") <= quota).cast("int")
    return (
        ranked.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept).alias("n_kept"),
            F.min(F.when(F.col("rk") <= quota, F.col("q"))).alias("min_kept_q"),
            F.max(F.when(F.col("rk") <= quota, F.col("q"))).alias("max_kept_q"),
        )
        .orderBy(source_col)
    )


def source_quota_sql(quota: int = 10, table: str = "documents") -> str:
    """DuckDB twin of :func:`source_quota` (same X8 quality expression
    as the x_quality_score oracle, same 4dp pre-rank rounding)."""
    return f"""
    WITH t AS (
      SELECT doc_id, source, str_split(text, ' ') AS toks FROM {table}
    ), s AS (
      SELECT doc_id, source,
             len(toks)::DOUBLE AS n,
             len(list_distinct(toks))::DOUBLE AS nd,
             len(list_filter(toks, x -> x IN ('the','a','of','and','in','to','is')))::DOUBLE AS ns
      FROM t
    ), q AS (
      SELECT doc_id, source,
             round(0.4 * least(n / 100.0, 1.0)
                 + 0.3 * (CASE WHEN n > 0 THEN nd / n ELSE 0 END)
                 + 0.3 * least((CASE WHEN n > 0 THEN ns / n ELSE 0 END) * 4.0, 1.0), 4) AS q
      FROM s
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS rk
      FROM q
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN rk <= {quota} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           min(CASE WHEN rk <= {quota} THEN q END) AS min_kept_q,
           max(CASE WHEN rk <= {quota} THEN q END) AS max_kept_q
    FROM r GROUP BY source ORDER BY source
    """


def token_budget_plan(
    df: DataFrame,
    budget: int = 50_000,
    boost_source: str = "src0",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget mixture planning — given a total training-token
    budget and per-source mixture weights, compute each source's token
    allocation, the sampling rate that realizes it, and the shortfall
    where a source can't fill its share (the spreadsheet step between
    "we crawled this" and "we train on that", done on the cluster so
    the counts are the real ones).

    Weights here: ``boost_source`` gets 2×, everything else 1× —
    stand-ins for a config map; the arithmetic is the operator. All
    allocation math is EXACT bigint (`div`, matching DuckDB `//`) and
    the sampling rate is reported in integer parts-per-million —
    float division would round differently across engines at exactly
    the wrong boundaries.

    Scale: one corpus-proportional aggregate (token counts per
    source, partial-agg'd); the planning window runs over the
    SOURCE-count-sized aggregate (unpartitioned window on ~10²-10⁴
    rows — deliberately driver-scale, documented).
    """
    per = df.groupBy(source_col).agg(
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("avail_tokens")
    )
    per = per.withColumn(
        "w", F.when(F.col(source_col) == boost_source, F.lit(2)).otherwise(F.lit(1))
    )
    per = per.withColumn("total_w", F.sum("w").over(Window.partitionBy()))
    b = int(budget)
    plan = per.select(
        source_col,
        "avail_tokens",
        "w",
        F.expr(f"(cast({b} as bigint) * w) div total_w").alias("needed_tokens"),
    ).select(
        source_col,
        "avail_tokens",
        "w",
        "needed_tokens",
        F.least("needed_tokens", "avail_tokens").alias("planned_tokens"),
        (F.col("needed_tokens") - F.least("needed_tokens", "avail_tokens")).alias(
            "shortfall"
        ),
        F.expr(
            "(least(needed_tokens, avail_tokens) * cast(1000000 as bigint))"
            " div avail_tokens"
        ).alias("sample_rate_ppm"),
    )
    return plan.orderBy(source_col)


def token_budget_plan_sql(
    budget: int = 50_000, boost_source: str = "src0", table: str = "documents"
) -> str:
    """DuckDB twin of :func:`token_budget_plan` (exact `//` bigint
    division everywhere a rate or allocation is computed)."""
    b = int(budget)
    return f"""
    WITH per AS (
      SELECT source,
             CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS avail_tokens,
             CASE WHEN source = '{boost_source}' THEN 2 ELSE 1 END AS w
      FROM {table} GROUP BY source
    ), t AS (
      SELECT *, CAST(sum(w) OVER () AS BIGINT) AS total_w FROM per
    ), a AS (
      SELECT source, avail_tokens, w,
             (CAST({b} AS BIGINT) * w) // total_w AS needed_tokens
      FROM t
    )
    SELECT source, avail_tokens, w, needed_tokens,
           least(needed_tokens, avail_tokens) AS planned_tokens,
           needed_tokens - least(needed_tokens, avail_tokens) AS shortfall,
           (least(needed_tokens, avail_tokens) * CAST(1000000 AS BIGINT))
             // avail_tokens AS sample_rate_ppm
    FROM a ORDER BY source
    """


def token_budget_select(
    df: DataFrame,
    budget: int = 2_000,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """EXECUTE a per-source token budget — the selection step after
    :func:`token_budget_plan`'s spreadsheet step: within each source,
    take documents best-first by quality until the next document would
    push the source's cumulative token mass past ``budget`` (greedy
    prefix: a doc is kept iff its own running total still fits). This
    is the "give me N tokens per domain, best first" primitive a
    mixture schedule compiles down to.

    Quality is the X8 heuristic rounded to 4dp BEFORE ordering (the
    verify-skill float-rank rule); token mass and the budget gate are
    bigint, so the cut is exact at any corpus size. The per-source
    running mass uses the distributed exact per-group cumsum
    (operators/distrank.py:with_group_cumsum) — no per-source window
    pool, so one whale domain cannot serialize the selection.

    Returns per source: docs seen/kept, kept token mass, and the
    quality floor the budget implies (min kept q — the effective
    quality bar the budget buys).
    """
    from dvmax_spark.ext.textstats import quality_score
    from dvmax_spark.operators.distrank import with_group_cumsum

    q = quality_score(df).select(
        F.col(id_col),
        F.col(source_col),
        F.round("quality", 4).alias("q"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_toks"),
    )
    cum = with_group_cumsum(
        q,
        [source_col],
        [F.col("q").desc(), F.col(id_col).asc()],
        "n_toks",
        out_col="cum_toks",
    )
    kept = F.col("cum_toks") <= int(budget)
    return (
        cum.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept.cast("int")).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_toks")).otherwise(F.lit(0))).alias(
                "kept_tokens"
            ),
            F.min(F.when(kept, F.col("q"))).alias("min_kept_q"),
        )
        .orderBy(source_col)
    )


def token_budget_select_sql(budget: int = 2_000, table: str = "documents") -> str:
    """DuckDB twin of :func:`token_budget_select` (same X8 quality
    expression and 4dp pre-order rounding as the x_quality_score and
    x_source_quota oracles; window cumsum replaces the distributed
    form)."""
    b = int(budget)
    return f"""
    WITH t AS (
      SELECT doc_id, source, str_split(text, ' ') AS toks FROM {table}
    ), s AS (
      SELECT doc_id, source,
             CAST(len(toks) AS BIGINT) AS n_toks,
             len(toks)::DOUBLE AS n,
             len(list_distinct(toks))::DOUBLE AS nd,
             len(list_filter(toks, x -> x IN ('the','a','of','and','in','to','is')))::DOUBLE AS ns
      FROM t
    ), q AS (
      SELECT doc_id, source, n_toks,
             round(0.4 * least(n / 100.0, 1.0)
                 + 0.3 * (CASE WHEN n > 0 THEN nd / n ELSE 0 END)
                 + 0.3 * least((CASE WHEN n > 0 THEN ns / n ELSE 0 END) * 4.0, 1.0), 4) AS q
      FROM s
    ), c AS (
      SELECT *, sum(n_toks) OVER (PARTITION BY source ORDER BY q DESC, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS cum_toks
      FROM q
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN cum_toks <= {b} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN cum_toks <= {b} THEN n_toks ELSE 0 END) AS BIGINT) AS kept_tokens,
           min(CASE WHEN cum_toks <= {b} THEN q END) AS min_kept_q
    FROM c GROUP BY source ORDER BY source
    """


def mixture_schedule(
    df: DataFrame,
    n_bands: int = 5,
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Deterministic training-order interleave (stride scheduling,
    Waldspurger & Weihl 1994, applied to data mixing): every source's
    documents are spread evenly across the whole training run instead
    of clumping — the k-th doc of a source with n_i docs lands near
    global fraction (2k+1)/(2n_i), so a 10x-bigger source takes 10x
    more slots but at 10x the frequency, never as a contiguous block.
    Within-source order is a seeded pseudo-shuffle (portable hash of
    the id), so the schedule is reproducible across runs and engines.

    Returns the verification rollup: per (source, band) doc counts
    over ``n_bands`` equal slices of the stride-key space — a uniform
    interleave shows each source's mass split ~evenly across bands
    (the property a curriculum owner actually checks; emitting the
    raw order is a sort by (key, source, r)).

    Exact-integer throughout (stride keys are bigint `div` results),
    so value-exact cross-engine. The band is ARITHMETIC on the key
    itself — ``band = key * n_bands div 10^12`` — which is the whole
    point of stride keys at 100 TB: no global rank, no global count,
    no window of any kind; writers emit (key-range, shard) files
    directly and the bands are literal key prefixes. (The per-source
    rank `r` that seeds the key is a PARTITIONED window — the stride
    construction needs each doc's index within its source.)
    """
    from dvmax_spark.ext.dedup import _portable_hash

    n_i = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_i"))
    ranked = (
        df.select(id_col, group_col)
        .withColumn("h", _portable_hash(F.col(id_col).cast("string")))
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy(group_col).orderBy("h", id_col)
            )
            - 1,
        )
        .join(F.broadcast(n_i), group_col)
        .withColumn("key", F.expr("((2 * r + 1) * 1000000000000) div (2 * n_i)"))
    )
    banded = ranked.withColumn(
        "band", F.expr(f"(key * {n_bands}) div 1000000000000")
    )
    return (
        banded.groupBy(group_col, "band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("key").alias("first_key"),
            F.max("key").alias("last_key"),
        )
        .orderBy(group_col, "band")
    )


def mixture_schedule_sql(
    n_bands: int = 5, table: str = "documents", group_col: str = "source"
) -> str:
    """DuckDB twin of :func:`mixture_schedule`."""
    h = "(('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT)"
    return f"""
    WITH n AS (
      SELECT {group_col}, count(*) AS n_i FROM {table} GROUP BY {group_col}
    ), ranked AS (
      SELECT d.doc_id, d.{group_col}, n.n_i,
             row_number() OVER (
               PARTITION BY d.{group_col} ORDER BY {h}, d.doc_id
             ) - 1 AS r
      FROM {table} d JOIN n USING ({group_col})
    ), keyed AS (
      SELECT *, ((2 * r + 1) * 1000000000000) // (2 * n_i) AS key
      FROM ranked
    )
    SELECT {group_col}, (key * {n_bands}) // 1000000000000 AS band,
           count(*) AS n_docs,
           CAST(min(key) AS BIGINT) AS first_key,
           CAST(max(key) AS BIGINT) AS last_key
    FROM keyed GROUP BY 1, 2 ORDER BY 1, 2
    """


# ------------------------------------------------- weighted sampling

def weighted_sample(
    df: DataFrame,
    k: int = 200,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement by priority sampling
    (Duffield/Lund/Thorup JACM'07; the deterministic analogue of
    Efraimidis-Spirtakis A-ES): each row draws a pseudo-uniform key
    from the portable md5 hash of its id and gets priority key/weight;
    the k SMALLEST priorities win, so heavier rows win proportionally
    more often — the quality-weighted corpus subsample every curation
    pipeline needs (sample by doc quality/length, not uniformly).

    Engine-exactness: the hash is the repo's portable md5 bucket
    convention truncated to 32 bits, and the priority is the exact
    BIGINT ``(h32 * 1_000_000) div weight`` — no float anywhere, ties
    broken on id, so the global top-k is bit-identical across engines
    AND across reruns (re-running the sampler on the same corpus
    returns the same sample — reproducible pipelines).

    Scale shape: map-side priority computation + a single global
    top-k (TakeOrderedAndProject — partial per-partition top-k, only
    k rows to the driver stage); no shuffle of the corpus. Weights
    must be >= 1 (zero-weight rows are excluded, matching `div`'s
    domain).
    """
    h32 = _portable_hash(F.col(id_col).cast("string")) % F.lit(2**32).cast("long")
    return (
        df.where(F.col(weight_col) >= 1)
        .select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("weight"),
            (h32 * F.lit(1_000_000)).alias("_hs"),
        )
        .select(
            id_col,
            "weight",
            F.expr(f"_hs div weight").alias("priority"),
        )
        .orderBy(F.asc("priority"), F.asc(id_col))
        .limit(k)
    )


def weighted_sample_sql(
    k: int = 200,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    # _DUCK_HASH is an open-paren template (closed by the % suffix,
    # exactly as _duck_bucket does)
    h32 = _DUCK_HASH.format(expr=f"{id_col}::VARCHAR") + " % 4294967296)"
    return f"""
    SELECT {id_col}, CAST({weight_col} AS BIGINT) AS weight,
           ({h32} * 1000000) // {weight_col} AS priority
    FROM {table}
    WHERE {weight_col} >= 1
    ORDER BY priority ASC, {id_col} ASC
    LIMIT {k}
    """


# ------------------------------------------------ bloom decontamination

def bloom_decontam_stats(
    docs: DataFrame,
    n: int = 5,
    m_bits: int = 65536,
    n_hashes: int = 3,
    eval_source: str = "src0",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination through a BLOOM-FILTER prefilter, with
    the false-positive accounting that justifies it: eval n-grams set
    ``n_hashes`` bit positions in an ``m_bits`` filter; a train doc is
    bloom-flagged iff some gram of it finds ALL its positions set.
    Compared per source against the EXACT gram semi-join
    (:func:`contaminated_ids`' predicate): bloom recall is 1 by
    construction (no false negatives — every true overlap sets its own
    bits), so the one row per source reports n_docs, exact hits, bloom
    hits and the false positives you'd re-check downstream.

    WHY at 100 TB: the exact path broadcasts the full distinct eval
    gram set — unbounded as benchmarks grow; the bloom set is AT MOST
    ``m_bits`` distinct positions no matter how large the eval corpus
    is, so the prefilter's broadcast is CONSTANT-size and the exact
    join only runs on the (tiny) bloom-flagged remainder. This query
    measures exactly that trade on real data.

    Determinism: positions are portable md5 hashes of ``gram || '#i'``
    mod ``m_bits`` — identical in DuckDB, so even the false-positive
    COUNTS are value-exact across engines.
    """
    ev = docs.where(F.col("source") == eval_source)
    tr = docs.where(F.col("source") != eval_source)

    def positions(gram_col, i: int):
        return _portable_hash(F.concat(gram_col, F.lit(f"#{i}"))) % m_bits

    ev_g = ev.select(F.explode(shingles(text_col, n)).alias("g"))
    bits = (
        ev_g.select(
            F.explode(
                F.array(*[positions(F.col("g"), i) for i in range(n_hashes)])
            ).alias("pos")
        )
        .distinct()
    )
    # the bloom set: <= m_bits rows regardless of eval size -> always
    # broadcastable. Exact eval grams: broadcast here (small corpus),
    # the documented unbounded cost the bloom path avoids.
    ev_exact = F.broadcast(ev_g.distinct())

    tr_g = tr.select(
        F.col(id_col), F.col("source"), F.explode(shingles(text_col, n)).alias("g")
    )
    # gram hit iff ALL n_hashes positions are set: each position is a
    # COLUMN and each membership test a broadcast semi-join against the
    # (<= m_bits row) bit set — n_hashes map-side filters, no shuffle,
    # no per-gram row id (deterministic under task retries)
    flagged = tr_g.select(
        id_col, *[positions(F.col("g"), i).alias(f"p{i}") for i in range(n_hashes)]
    )
    for i in range(n_hashes):
        flagged = flagged.join(
            F.broadcast(bits.withColumnRenamed("pos", f"p{i}")), f"p{i}", "left_semi"
        )
    gram_hits = flagged.select(id_col).distinct().withColumn("bloom_hit", F.lit(1))
    exact_hits = (
        tr_g.join(ev_exact, "g", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("exact_hit", F.lit(1))
    )
    per_doc = (
        tr.select(id_col, "source")
        .join(gram_hits, id_col, "left")
        .join(exact_hits, id_col, "left")
        .select(
            "source",
            F.coalesce("bloom_hit", F.lit(0)).alias("bloom_hit"),
            F.coalesce("exact_hit", F.lit(0)).alias("exact_hit"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("exact_hit").alias("n_exact"),
            F.sum("bloom_hit").alias("n_bloom"),
            F.sum(
                (F.col("bloom_hit") == 1).cast("long")
                * (F.col("exact_hit") == 0).cast("long")
            ).alias("n_false_pos"),
        )
        .orderBy("source")
    )


def bloom_decontam_stats_sql(
    n: int = 5,
    m_bits: int = 65536,
    n_hashes: int = 3,
    eval_source: str = "src0",
    table: str = "documents",
) -> str:
    grams = _duck_grams(n)
    pos_list = [
        _DUCK_HASH.format(expr=f"g || '#{i}'") + f" % {m_bits})"
        for i in range(n_hashes)
    ]
    pos_exprs = ", ".join(pos_list)
    return f"""
    WITH toks AS (
      SELECT doc_id, source, str_split(text, ' ') AS t FROM {table}
    ), ev_g AS (
      SELECT DISTINCT unnest({grams}) AS g FROM toks WHERE source = '{eval_source}'
    ), bits AS (
      SELECT DISTINCT unnest([{pos_exprs}]) AS pos FROM ev_g
    ), tr_g AS (
      SELECT doc_id, source, unnest({grams}) AS g
      FROM toks WHERE source <> '{eval_source}'
    ), bloom_docs AS (
      SELECT DISTINCT doc_id FROM tr_g
      WHERE {" AND ".join(f"({p}) IN (SELECT pos FROM bits)" for p in pos_list)}
    ), exact_docs AS (
      SELECT DISTINCT doc_id FROM tr_g WHERE g IN (SELECT g FROM ev_g)
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(sum(CASE WHEN b.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom,
           CAST(sum(CASE WHEN b.doc_id IS NOT NULL AND e.doc_id IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM {table} d
    LEFT JOIN bloom_docs b ON b.doc_id = d.doc_id
    LEFT JOIN exact_docs e ON e.doc_id = d.doc_id
    WHERE d.source <> '{eval_source}'
    GROUP BY d.source ORDER BY d.source
    """


# ------------------------------------------------- SPFHP packing

def _spfhp_strategy(
    hist: list[tuple[int, int]], ctx_len: int
) -> tuple[list[tuple[int, int, int, int]], int]:
    """Shortest-pack-first histogram-packing (after Krell & Kersting,
    Graphcore 'Packing: Towards 2x NLP BERT Acceleration', 2021) on a
    length histogram — the packing STRATEGY is computed here, exactly,
    on <= ctx_len histogram rows (driver-scale by construction: the
    histogram is bounded by the context length, NOT the corpus).

    Rule (group-batch SPF): lengths longest-first; while docs of a
    length remain, pick the tightest remaining-capacity class that
    fits, hand ONE doc to each pack of its oldest group (FIFO), and
    re-queue those packs under their new remaining capacity. Note the
    deliberate deviation from per-doc tightest-fit: a pack that just
    took a doc is strictly tighter than its old group-mates, so a
    per-doc rule would refill it before touching them; the batch rule
    spreads over the (previously) equal-remaining group first. That
    keeps the strategy O(histogram) with a flat rank->pack slot table
    (rb+i -> pb+i) — the price is a packing that can differ from
    sequential SPF, not its capacity/coverage guarantees
    (property-tested in tests/test_traindata.py). Returns
    (slots, n_packs) where each slot row is
    (length, rank_base, count, pack_base): the docs of ``length`` with
    within-class ranks [rank_base, rank_base+count) go to packs
    [pack_base, pack_base+count), one per pack — an exact, replayable
    assignment rule for the distributed side.
    """
    slots: list[tuple[int, int, int, int]] = []
    # open pack groups: remaining -> list of [pack_base, count] ranges
    # with CONSECUTIVE pack ids (kept consecutive by construction)
    open_groups: dict[int, list[list[int]]] = {}
    next_pack = 0
    next_rank: dict[int, int] = {}
    for length, cnt in sorted(hist, key=lambda t: (-t[0], t[1])):
        remaining = cnt
        while remaining > 0:
            fits = sorted(r for r in open_groups if r >= length)
            if fits:
                r = fits[0]  # shortest-pack-first: tightest fit
                grp = open_groups[r][0]
                take = min(remaining, grp[1])
                base = grp[0]
                grp[0] += take
                grp[1] -= take
                if grp[1] == 0:
                    open_groups[r].pop(0)
                    if not open_groups[r]:
                        del open_groups[r]
            else:
                take = remaining
                base = next_pack
                next_pack += take
                r = ctx_len
            rb = next_rank.get(length, 0)
            slots.append((length, rb, take, base))
            next_rank[length] = rb + take
            nr = r - length
            if nr > 0:
                open_groups.setdefault(nr, []).append([base, take])
            remaining -= take
    return slots, next_pack


def pack_spfhp(
    df: DataFrame,
    ctx_len: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """No-split sequence packing by SPFHP: every document lands WHOLE
    in exactly one pack of capacity ``ctx_len`` (docs longer than the
    context are clipped to it), packs chosen to minimize padding —
    the packed-BERT/packed-pretraining recipe, vs
    :func:`pack_sequences`' GPT-style concatenate-and-chunk which
    splits documents across window boundaries.

    Scale split: the length HISTOGRAM (<= ctx_len rows no matter the
    corpus size — the whole point of histogram packing) is collected
    and the strategy solved exactly on the driver
    (:func:`_spfhp_strategy`); application is distributed — each doc
    computes its within-length-class rank (one window over the length
    key) and joins the broadcast slot table to find its pack. Output
    is one row per pack: (pack_id, n_docs, pack_tokens, padding),
    deterministic across engines/reruns (rank tie-break on id).
    """
    # null text counts like the empty string (split('') == [''], one
    # token) — a null must not become a null histogram key
    n_tok = F.least(
        F.coalesce(F.size(F.split(F.col(text_col), " ")), F.lit(1)),
        F.lit(int(ctx_len)),
    ).cast("long")
    staged = df.select(F.col(id_col), n_tok.alias("n_tok"))
    hist = [
        (r["n_tok"], r["cnt"])
        for r in staged.groupBy("n_tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    ]
    slots, n_packs = _spfhp_strategy([(int(a), int(b)) for a, b in hist], ctx_len)
    spark = df.sparkSession
    slot_df = spark.createDataFrame(
        slots, "n_tok long, rank_base long, cnt long, pack_base long"
    )
    w = Window.partitionBy("n_tok").orderBy(id_col)
    ranked = staged.withColumn("rk", F.row_number().over(w) - 1)
    assigned = (
        ranked.join(F.broadcast(slot_df), "n_tok")
        .where(
            (F.col("rk") >= F.col("rank_base"))
            & (F.col("rk") < F.col("rank_base") + F.col("cnt"))
        )
        .select(
            "n_tok",
            (F.col("pack_base") + F.col("rk") - F.col("rank_base")).alias("pack_id"),
        )
    )
    return (
        assigned.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
        )
        .select(
            "pack_id",
            "n_docs",
            "pack_tokens",
            (F.lit(int(ctx_len)) - F.col("pack_tokens")).alias("padding"),
        )
        .orderBy("pack_id")
    )
