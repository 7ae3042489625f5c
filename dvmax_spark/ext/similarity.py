"""[EXT] Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — exact; cross join pruned to the query
    set, dot products as JVM-side zip_with/aggregate folds (no Python).
    O(|Q|·N) — right when |Q| is small or N fits a broadcast.
  * random-hyperplane LSH buckets — the scale path: each vector maps
    to a small signature; candidates share a bucket, exact cosine is
    computed only within buckets. O(N) shuffle, tunable recall.

Hyperplanes are deterministic (seeded) so results are reproducible.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from dvmax_spark.ext.dedup import cap_buckets


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Deterministic left-fold dot product (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    emb: DataFrame,
    query_ids,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    Cosine is rounded to 4 decimals BEFORE ranking (ties broken by
    neighbor id) so rankings are reproducible across engines and
    summation orders.
    """
    vecs = emb.select(F.col(id_col), as_double(vec_col).alias("v"))
    # Norms are computed in the PRE-join projections (per row, below the
    # join) rather than inside the per-pair cosine — bit-identical values
    # (norm(a) is the same either way), but the per-pair work drops to
    # one dot fold instead of three.
    q = vecs.where(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("q_id"), F.col("v").alias("q_v"), norm(F.col("v")).alias("q_n")
    )
    c = vecs.select(
        F.col(id_col).alias("c_id"), F.col("v").alias("c_v"), norm(F.col("v")).alias("c_n")
    )
    pairs = F.broadcast(q).crossJoin(c).where(F.col("q_id") != F.col("c_id"))
    scored = pairs.select(
        "q_id",
        "c_id",
        F.round(
            dot(F.col("q_v"), F.col("c_v")) / (F.col("q_n") * F.col("c_n")), 4
        ).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "rnk", "c_id", F.col("cos").alias("cosine"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket_ids(vec: Column, planes: list[list[float]]) -> Column:
    """Signature = sign bits of projections onto fixed hyperplanes."""
    bits = []
    for i, plane in enumerate(planes):
        proj = dot(vec, F.array(*[F.lit(p) for p in plane]))
        bits.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("int")


def _bucket_table(vecs: DataFrame, dim: int, n_planes: int, n_tables: int) -> DataFrame:
    """Assign each vector to one bucket per hash table (OR-amplified
    LSH: a pair is a candidate if it collides in ANY table)."""
    buckets = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=42 + t)
        buckets.append(
            F.struct(F.lit(t).alias("tbl"), lsh_bucket_ids(F.col("v"), planes).alias("b"))
        )
    return vecs.select(
        "*", F.explode(F.array(*buckets)).alias("_bk")
    ).select(*vecs.columns, F.col("_bk.tbl").alias("tbl"), F.col("_bk.b").alias("bucket"))


def cosine_topk_lsh(
    emb: DataFrame,
    query_ids,
    k: int = 3,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """ANN top-k: exact cosine within shared LSH buckets only.

    n_planes controls bucket granularity (2^n_planes buckets/table);
    n_tables is OR-amplification — a candidate needs to collide in any
    one table, so recall ~ 1-(1-p^planes)^tables even for moderate-
    cosine neighbors. At cluster scale the bucket join replaces the
    cross join: shuffle keyed on (table, bucket id), candidates
    deduped before scoring. ``max_bucket`` is the probe limit (the
    efSearch analogue): a degenerate bucket holding most of the corpus
    would turn the probe back into brute force, so oversized buckets
    are skipped — raise n_planes rather than the cap if that fires.
    """
    vecs = _bucket_table(
        emb.select(F.col(id_col), as_double(vec_col).alias("v")), dim, n_planes, n_tables
    )
    vecs = cap_buckets(vecs, ["tbl", "bucket"], max_bucket)
    # norms staged per ROW below the join (bit-identical values, but
    # one dot fold per pair instead of three — the same optimization
    # cosine_topk_bruteforce carries)
    q = vecs.where(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("q_id"),
        F.col("v").alias("q_v"),
        norm(F.col("v")).alias("q_n"),
        "tbl",
        "bucket",
    )
    c = vecs.select(
        F.col(id_col).alias("c_id"),
        F.col("v").alias("c_v"),
        norm(F.col("v")).alias("c_n"),
        "tbl",
        "bucket",
    )
    pairs = (
        q.join(c, ["tbl", "bucket"])
        .where(F.col("q_id") != F.col("c_id"))
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = pairs.select(
        "q_id",
        "c_id",
        F.round(
            dot(F.col("q_v"), F.col("c_v")) / (F.col("q_n") * F.col("c_n")), 4
        ).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "rnk", "c_id", F.col("cos").alias("cosine"))
    )


def cosine_topk_ivf(
    emb: DataFrame,
    query_ids,
    k: int = 3,
    n_clusters: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: spherical-KMeans coarse quantizer + multi-probe.

    Vectors are L2-normalized before clustering so the quantizer's
    euclidean geometry matches cosine similarity (unit sphere:
    ``|a-b|² = 2 - 2·cos``). Each query probes its ``nprobe`` nearest
    centroids — the IVF recall knob — and exact cosine runs only over
    the probed clusters' inverted lists. At cluster scale: the centroid
    table broadcasts (n_clusters rows), candidates shuffle once on
    cluster id, and recall/cost trades off via n_clusters × nprobe.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select(F.col(id_col), as_double(vec_col).alias("v")).withColumn(
        "vn", F.transform("v", lambda x: x / norm(F.col("v")))
    )
    ml_input = vecs.withColumn("features", array_to_vector("vn"))
    model = KMeans(k=n_clusters, seed=42, maxIter=20).fit(ml_input)
    assigned = model.transform(ml_input).select(
        id_col, "v", "vn", F.col("prediction").alias("bucket")
    )
    centers = emb.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "bucket int, center array<double>",
    )
    q_base = assigned.where(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("q_id"), F.col("v").alias("q_v"), F.col("vn").alias("q_vn")
    )
    # nprobe nearest centroids per query (centroid table broadcasts)
    d2 = F.aggregate(
        F.zip_with("q_vn", "center", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wp = Window.partitionBy("q_id").orderBy(F.col("_d2").asc(), F.col("bucket").asc())
    q = (
        q_base.crossJoin(F.broadcast(centers))
        .withColumn("_d2", d2)
        .withColumn("_pr", F.row_number().over(wp))
        .where(F.col("_pr") <= nprobe)
        .select("q_id", "q_v", "bucket")
    )
    c = assigned.select(F.col(id_col).alias("c_id"), F.col("v").alias("c_v"), "bucket")
    pairs = (
        q.join(c, "bucket")
        .where(F.col("q_id") != F.col("c_id"))
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = pairs.select(
        "q_id", "c_id", F.round(cosine(F.col("q_v"), F.col("c_v")), 4).alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "rnk", "c_id", F.col("cos").alias("cosine"))
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via OR-amplified LSH
    buckets (near-dups land in a shared bucket of some table with high
    probability at cos >= threshold); ``max_bucket`` bounds the
    within-bucket self-join on degenerate buckets (zero vectors)."""
    vecs = _bucket_table(
        emb.select(F.col(id_col), as_double(vec_col).alias("v")), dim, n_planes, n_tables
    )
    vecs = cap_buckets(vecs, ["tbl", "bucket"], max_bucket)
    # per-row norms staged below the self-join (see cosine_topk_lsh)
    a = vecs.select(
        F.col(id_col).alias("id_a"),
        F.col("v").alias("v_a"),
        norm(F.col("v")).alias("n_a"),
        "tbl",
        "bucket",
    )
    b = vecs.select(
        F.col(id_col).alias("id_b"),
        F.col("v").alias("v_b"),
        norm(F.col("v")).alias("n_b"),
        "tbl",
        "bucket",
    )
    pairs = (
        a.join(b, ["tbl", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 4
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _sum_terms_sql(terms: list[str]) -> str:
    """Left-associated sum — the same evaluation order as the Spark
    side's sequential F.aggregate fold, so doubles match bit-for-bit."""
    return "(" + " + ".join(terms) + ")"


def _dot_const_sql(vec: str, plane: list[float], dim: int) -> str:
    return _sum_terms_sql(
        [f"{vec}[{i + 1}]::DOUBLE * ({plane[i]!r})" for i in range(dim)]
    )


def _dot_vec_sql(a: str, b: str, dim: int) -> str:
    return _sum_terms_sql(
        [f"{a}[{i + 1}]::DOUBLE * {b}[{i + 1}]::DOUBLE" for i in range(dim)]
    )


def cosine_topk_lsh_sql(
    query_ids,
    k: int = 3,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
) -> str:
    """DuckDB oracle for :func:`cosine_topk_lsh` — the hyperplanes are
    deterministic seeded constants, so the WHOLE ANN pipeline (bucket
    signs -> OR-amplified candidates -> exact rescoring -> top-k) is
    reproducible in SQL. Every floating-point sum is emitted as a
    left-associated term chain matching the Spark fold's evaluation
    order, so projections/cosines agree bit-for-bit and bucket signs
    can't flip. (Assumes no bucket exceeds max_bucket and no zero-norm
    vectors — true for the testdata embeddings.)"""
    ids = ", ".join(str(int(i)) for i in query_ids)
    per_table = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=42 + t)
        bucket = " + ".join(
            f"(CASE WHEN {_dot_const_sql('embedding', planes[i], dim)} >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i in range(n_planes)
        )
        per_table.append(
            f"SELECT vec_id, embedding, {t} AS tbl, ({bucket}) AS bucket FROM embeddings"
        )
    bk = "\n      UNION ALL\n".join(per_table)
    qq = _dot_vec_sql("q.embedding", "q.embedding", dim)
    cc = _dot_vec_sql("c.embedding", "c.embedding", dim)
    qc = _dot_vec_sql("q.embedding", "c.embedding", dim)
    return f"""
    WITH bk AS (
      {bk}
    ), cand AS (
      SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
      FROM bk q JOIN bk c ON q.tbl = c.tbl AND q.bucket = c.bucket
      WHERE q.vec_id IN ({ids}) AND q.vec_id <> c.vec_id
    ), scored AS (
      SELECT cand.q_id, cand.c_id,
             round({qc} / (sqrt({qq}) * sqrt({cc})), 4) AS cos
      FROM cand
      JOIN embeddings q ON q.vec_id = cand.q_id
      JOIN embeddings c ON c.vec_id = cand.c_id
    ), ranked AS (
      SELECT q_id, c_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rnk
      FROM scored
    )
    SELECT q_id, rnk, c_id, cos AS cosine FROM ranked WHERE rnk <= {k}
    ORDER BY q_id, rnk
    """


def _near_dup_ctes(
    threshold: float,
    dim: int,
    n_planes: int,
    n_tables: int,
    max_bucket: int | None = 1000,
) -> str:
    """Shared CTE chain ``bk -> cand -> scored -> nd_pairs`` replaying
    the seeded-hyperplane LSH near-dup pipeline in DuckDB (same
    deterministic-constants + left-associated-sums argument as
    :func:`cosine_topk_lsh_sql`). ``max_bucket`` mirrors the Spark
    side's cap_buckets mega-bucket drop (default 1000, same as
    :func:`embedding_near_dup_pairs`) — it never binds on the 2,000
    sf0.1 vectors but does on the 20,000-vector second-decade corpus
    (r9 sf1 parity finding: 1,796 vs 13,165 pairs with the cap
    unmodeled)."""
    per_table = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=42 + t)
        bucket = " + ".join(
            f"(CASE WHEN {_dot_const_sql('embedding', planes[i], dim)} >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i in range(n_planes)
        )
        per_table.append(
            f"SELECT vec_id, embedding, {t} AS tbl, ({bucket}) AS bucket FROM embeddings"
        )
    bk = "\n      UNION ALL\n".join(per_table)
    aa = _dot_vec_sql("a.embedding", "a.embedding", dim)
    bb = _dot_vec_sql("b.embedding", "b.embedding", dim)
    ab = _dot_vec_sql("a.embedding", "b.embedding", dim)
    return f"""bk0 AS (
      {bk}
    ), bk AS (
      SELECT vec_id, embedding, tbl, bucket FROM bk0
      QUALIFY COUNT(*) OVER (PARTITION BY tbl, bucket) <= {max_bucket if max_bucket is not None else "1e18"}
    ), cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bucket = b.bucket
      WHERE a.vec_id < b.vec_id
    ), scored AS (
      SELECT cand.id_a, cand.id_b,
             round({ab} / (sqrt({aa}) * sqrt({bb})), 4) AS cosine
      FROM cand
      JOIN embeddings a ON a.vec_id = cand.id_a
      JOIN embeddings b ON b.vec_id = cand.id_b
    ), nd_pairs AS (
      SELECT id_a, id_b, cosine FROM scored WHERE cosine >= {threshold}
    )"""


def embedding_near_dup_sql(
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    max_bucket: int | None = 1000,
) -> str:
    """DuckDB oracle for :func:`embedding_near_dup_pairs` — same
    deterministic-constants argument as :func:`cosine_topk_lsh_sql`,
    INCLUDING the max_bucket mega-bucket drop (r9 sf1 finding);
    ``max_bucket`` must match the Spark side's cap (default 1000, same
    as :func:`embedding_near_dup_pairs`)."""
    ctes = _near_dup_ctes(threshold, dim, n_planes, n_tables, max_bucket=max_bucket)
    return f"""
    WITH {ctes}
    SELECT id_a, id_b, cosine FROM nd_pairs
    ORDER BY id_a, id_b
    """


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 1000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: embedding-cosine near-dup
    pairs (seeded-hyperplane LSH buckets) -> connected components ->
    keep ONE representative (min id) per semantic group.

    The scale shape is the composition of two already-bounded pieces:
    the pair stage shuffles once on (table, bucket) with ``max_bucket``
    capping degenerate buckets, and component labeling is the iterative
    min-label propagation of ext/dedup.py (one shuffle join + one
    min-aggregate per round, checkpointed). Returns one row per vector:
    (id, cluster_id, cluster_size, keep)."""
    from dvmax_spark.ext.dedup import dedup_clusters

    pairs = embedding_near_dup_pairs(
        emb,
        threshold=threshold,
        dim=dim,
        n_planes=n_planes,
        n_tables=n_tables,
        id_col=id_col,
        vec_col=vec_col,
        max_bucket=max_bucket,
    )
    return dedup_clusters(emb, pairs, id_col=id_col, rank_col=None)


def semantic_dedup_sql(
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
) -> str:
    """DuckDB oracle for :func:`semantic_dedup`: the near-dup pair CTEs
    plus recursive reachability (connected components as min reachable
    id) and the min-id representative rule."""
    ctes = _near_dup_ctes(threshold, dim, n_planes, n_tables)
    return f"""
    WITH RECURSIVE {ctes},
    edges AS (
      SELECT id_a AS s, id_b AS d FROM nd_pairs
      UNION
      SELECT id_b AS s, id_a AS d FROM nd_pairs
    ),
    reach(src, node) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT r.src, e.d FROM reach r JOIN edges e ON e.s = r.node
    ),
    comp AS (
      SELECT node AS vec_id, min(src) AS cluster_id FROM reach GROUP BY node
    )
    SELECT e.vec_id, c.cluster_id,
           count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
           (e.vec_id = c.cluster_id) AS keep
    FROM embeddings e JOIN comp c USING (vec_id)
    ORDER BY e.vec_id
    """


def _kmeans_multiprobe(
    vecs: DataFrame, centers: DataFrame, nprobe: int, id_col: str
) -> DataFrame:
    """Each normalized vector's ``nprobe`` nearest KMeans centroids:
    rows ``(id, vn, kbucket, prb)`` with prb = 1 the primary (argmin
    squared euclidean) assignment. Ranking is deterministic (dist²
    asc, kbucket asc on seeded centroids). For unit ``vn``,
    ``dist² = 1 − 2·v·c + ‖c‖²``.

    Scale shape: broadcast of k centroid rows against the corpus (k·N
    intermediate rows) then a per-ID window over k rows — the IVF
    coarse-assignment step. At paper scale (k = 50,000) this becomes
    a batched Arrow matmul like cosine_topk_ivf's quantizer; at the
    k ≤ tens used here the declarative form is one broadcast join.
    ‖c‖² is computed once per centroid on the (materialized) broadcast
    side, and the OUTPUT is lineage-cut: the interpreted fold
    expressions (normalize, dot) would otherwise re-inline into every
    downstream reference — the documented higher-order-lambda hazard —
    and callers reference the probe table several times."""
    centers2 = centers.withColumn("_c2", dot(F.col("center"), F.col("center")))
    return (
        vecs.crossJoin(F.broadcast(centers2))
        .withColumn(
            "_dist2",
            F.lit(1.0) - 2.0 * dot(F.col("vn"), F.col("center")) + F.col("_c2"),
        )
        .withColumn(
            "prb",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("_dist2", "kbucket")
            ),
        )
        .where(F.col("prb") <= nprobe)
        .drop("_dist2", "_c2", "center")
        .localCheckpoint(eager=False)
    )


def semdedup_kmeans(
    emb: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 2,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): the
    clustering-bucketed semantic-dedup recipe large pipelines cite —
    KMeans over L2-normalized embeddings partitions the corpus into
    ``n_clusters`` buckets, pairwise cosine runs ONLY within each
    bucket, and each within-bucket near-dup group (cosine >=
    ``threshold``, connected components) keeps one representative
    (min id, the paper's "keep one point per epsilon-ball" with a
    deterministic tie-break).

    This is the embedding-side analog of MinHash banding: the
    quantizer turns the O(N²) similarity matrix into per-cluster
    blocks of ~(N/k)² — the paper runs it at k=50,000 over LAION —
    and the k knob trades recall (near-dups split across cluster
    boundaries are missed) for cost exactly like IVF's nprobe.
    tests/test_ext.py pins pair recall vs the brute-force epsilon-ball
    graph and verdict agreement vs :func:`semantic_dedup`'s
    LSH-bucketed form.

    ``nprobe`` (r7): each vector joins its ``nprobe`` nearest
    centroids' comparison pools (multi-probe, the IVF recall knob),
    so a pair split across a cluster BOUNDARY is still compared when
    either end's second-closest centroid is the other end's primary.
    Costs nprobe× the pair-join input (per-cluster blocks of
    ~(nprobe·N/k)²); the reported ``kbucket`` stays the primary
    assignment, so downstream per-cluster logic is unchanged. Measured
    at sf0.01/8 clusters: pair recall 0.57 → ≥0.75 at nprobe=2 (floor
    pinned; cost delta recorded in SCALING.md).

    Scale shape: one KMeans fit over the (normalized) vectors (MLlib,
    sampled init, seed pinned), one shuffle on probe-cluster id for
    the within-pool self-join, then the bounded component propagation
    of ext/dedup.py. Returns one row per vector:
    ``(id, kbucket, cluster_id, cluster_size, keep)``. Rows-only in
    the registry: MLlib KMeans has no cross-engine oracle (the LSH
    form x_semantic_dedup carries the family's value-exact evidence).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from dvmax_spark.ext.dedup import dedup_clusters

    # lineage-cut the normalized projection: the per-element normalize
    # fold would otherwise re-inline into the KMeans features AND every
    # probe/pair reference (HOF-inlining hazard, see _kmeans_multiprobe)
    vecs = (
        emb.select(F.col(id_col), as_double(vec_col).alias("v"))
        .withColumn("vn", F.transform("v", lambda x: x / norm(F.col("v"))))
        .select(id_col, "vn")
        .localCheckpoint(eager=False)
    )
    ml_input = vecs.withColumn("features", array_to_vector("vn"))
    model = KMeans(k=n_clusters, seed=42, maxIter=20).fit(ml_input)
    centers = emb.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "kbucket int, center array<double>",
    )
    probed = _kmeans_multiprobe(vecs, centers, nprobe, id_col)
    assigned = probed.where(F.col("prb") == 1).select(id_col, "kbucket")
    a = probed.select(
        F.col(id_col).alias("id_a"), F.col("vn").alias("va"), "kbucket"
    )
    b = probed.select(
        F.col(id_col).alias("id_b"), F.col("vn").alias("vb"), "kbucket"
    )
    pairs = (
        a.join(b, "kbucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        # a pair sharing several probe pools must score once
        .dropDuplicates(["id_a", "id_b"])
        # va/vb are unit-norm, so the dot product IS the cosine —
        # skipping the two redundant norm folds per pair row
        .withColumn("cos", F.round(dot(F.col("va"), F.col("vb")), 4))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )
    comp = dedup_clusters(
        emb.select(id_col), pairs, id_col=id_col, rank_col=None
    )
    return (
        comp.join(assigned, id_col)
        .select(id_col, "kbucket", "cluster_id", "cluster_size", "keep")
        .orderBy(id_col)
    )


def d4_prune(
    emb: DataFrame,
    n_clusters: int = 8,
    dedup_threshold: float = 0.95,
    prune_frac: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 2,
) -> DataFrame:
    """D4 (Tirumala et al. 2023, arXiv:2308.12284): SemDeDup followed
    by SSL-prototype DIVERSIFICATION — after near-duplicate epsilon-
    balls collapse to one representative (:func:`semdedup_kmeans`),
    additionally drop the ``prune_frac`` most PROTOTYPICAL survivors of
    each KMeans cluster (highest cosine to their own centroid): the
    points that carry the least marginal information about the cluster.
    The paper shows dedup-then-diversify beats either alone for LLM
    pretraining selection.

    One KMeans fit serves both stages (the same seeded quantizer and
    ``nprobe`` multi-probe pair pools as semdedup_kmeans, so the two
    functions' dup sets coincide exactly — pinned by test); prototype
    ranking is a PARTITIONED window over
    each cluster (cosine desc, id asc — deterministic); the per-cluster
    drop count is ``floor(prune_frac * survivors)``, so tiny clusters
    lose nothing and the realized prune fraction is always <= the
    requested one (conservative; pinned by test).

    Returns one row per vector:
    ``(id, kbucket, centroid_cos, keep, reason)`` with reason in
    {'dup', 'prototype', 'kept'} — keep == (reason = 'kept'). Rows-only
    in the registry (MLlib KMeans, no cross-engine oracle); property
    tests pin stage composition, the prune-fraction ceiling, and
    determinism."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from dvmax_spark.ext.dedup import dedup_clusters

    # same HOF-inlining guard as semdedup_kmeans (see there)
    vecs = (
        emb.select(F.col(id_col), as_double(vec_col).alias("v"))
        .withColumn("vn", F.transform("v", lambda x: x / norm(F.col("v"))))
        .select(id_col, "vn")
        .localCheckpoint(eager=False)
    )
    ml_input = vecs.withColumn("features", array_to_vector("vn"))
    model = KMeans(k=n_clusters, seed=42, maxIter=20).fit(ml_input)
    centers = emb.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "kbucket int, center array<double>",
    )
    probed = _kmeans_multiprobe(vecs, centers, nprobe, id_col)
    assigned = probed.where(F.col("prb") == 1).select(id_col, "vn", "kbucket")
    # prototype score vs the PRIMARY centroid (the paper's stage 2)
    scored = assigned.join(F.broadcast(centers), "kbucket").select(
        id_col,
        "kbucket",
        "vn",
        F.round(cosine(F.col("vn"), F.col("center")), 6).alias("centroid_cos"),
    )
    # stage 1: SemDeDup within the multi-probe pools — identical to
    # semdedup_kmeans(nprobe=...) so the dup sets coincide exactly
    a = probed.select(F.col(id_col).alias("id_a"), F.col("vn").alias("va"), "kbucket")
    b = probed.select(F.col(id_col).alias("id_b"), F.col("vn").alias("vb"), "kbucket")
    pairs = (
        a.join(b, "kbucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .dropDuplicates(["id_a", "id_b"])
        # va/vb are unit-norm, so the dot product IS the cosine —
        # skipping the two redundant norm folds per pair row
        .withColumn("cos", F.round(dot(F.col("va"), F.col("vb")), 4))
        .where(F.col("cos") >= dedup_threshold)
        .select("id_a", "id_b")
    )
    comp = dedup_clusters(emb.select(id_col), pairs, id_col=id_col, rank_col=None)
    survivors = scored.join(
        comp.where(F.col("keep")).select(id_col), id_col, "left_semi"
    )
    # stage 2: prototype pruning among dedup survivors, per cluster
    wr = Window.partitionBy("kbucket").orderBy(
        F.col("centroid_cos").desc(), F.col(id_col).asc()
    )
    wc = Window.partitionBy("kbucket")
    proto = (
        survivors.withColumn("_r", F.row_number().over(wr))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .withColumn(
            "_proto", F.col("_r") <= F.floor(F.lit(prune_frac) * F.col("_n"))
        )
        .select(id_col, F.col("_proto"))
    )
    reason = (
        F.when(F.col("_dup_keep") == False, F.lit("dup"))  # noqa: E712
        .when(F.coalesce("_proto", F.lit(False)), F.lit("prototype"))
        .otherwise(F.lit("kept"))
    )
    return (
        scored.select(id_col, "kbucket", "centroid_cos")
        .join(comp.select(id_col, F.col("keep").alias("_dup_keep")), id_col)
        .join(proto, id_col, "left")
        .select(
            id_col,
            "kbucket",
            "centroid_cos",
            reason.alias("reason"),
        )
        .withColumn("keep", F.col("reason") == "kept")
        .orderBy(id_col)
    )


# -------------------------------------------------- persisted IVF index

class IVFIndex:
    """Persisted IVF ANN index — the production build-once/probe-many
    shape next to the per-query ``cosine_topk_ivf`` (the ANN sibling
    of ``MinHashIndex``'s incremental-dedup store).

    Layout: ``<path>/centroids`` is a tiny parquet table
    (bucket, center) from a seeded spherical-KMeans fit;
    ``<path>/lists`` holds the inverted lists PARTITIONED BY bucket.
    A probe computes its ``nprobe`` nearest centroids, then reads the
    lists table with a LITERAL ``bucket IN (...)`` filter — parquet
    partition pruning IS the inverted-list seek, so query cost scales
    with the probed lists, not the corpus. ``append`` assigns new
    vectors to the EXISTING centroids (no refit — the standard IVF
    contract; recall for appended data degrades only as the data
    distribution drifts, at which point you rebuild).

    Vectors are L2-normalized for assignment (unit sphere: euclidean
    argmin == cosine argmax) and stored un-normalized for the exact
    re-scoring pass.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n_clusters: int = 8,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.n_clusters = n_clusters
        self.id_col = id_col
        self.vec_col = vec_col

    # internal: (id, v double-array, vn unit-norm) projection
    def _normed(self, emb: DataFrame) -> DataFrame:
        return emb.select(
            F.col(self.id_col), as_double(self.vec_col).alias("v")
        ).withColumn("vn", F.transform("v", lambda x: x / norm(F.col("v"))))

    def _assign(self, vecs: DataFrame, centers: DataFrame) -> DataFrame:
        """Nearest-centroid bucket per vector via broadcast argmin."""
        d2 = F.aggregate(
            F.zip_with("vn", "center", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        w = Window.partitionBy(self.id_col).orderBy(
            F.col("_d2").asc(), F.col("bucket").asc()
        )
        return (
            vecs.crossJoin(F.broadcast(centers))
            .withColumn("_d2", d2)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(self.id_col, "v", "bucket")
        )

    def build(self, emb: DataFrame, batch_key: int | str | None = None) -> None:
        """Fit the coarse quantizer and write centroids + lists.

        Pass ``batch_key`` iff subsequent appends will use batch keys
        (one consistent partition-directory depth per index)."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        vecs = self._normed(emb)
        ml_input = vecs.withColumn("features", array_to_vector("vn"))
        model = KMeans(k=self.n_clusters, seed=42, maxIter=20).fit(ml_input)
        assigned = model.transform(ml_input).select(
            self.id_col, "v", F.col("prediction").alias("bucket")
        )
        centers = self.spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
            "bucket int, center array<double>",
        )
        centers.coalesce(1).write.mode("overwrite").parquet(self.path + "/centroids")
        part_cols = ["bucket"] if batch_key is None else ["ingest_batch", "bucket"]
        if batch_key is not None:
            assigned = assigned.withColumn("ingest_batch", F.lit(str(batch_key)))
        (
            assigned.write.mode("overwrite")
            .partitionBy(*part_cols)
            .option("compression", "zstd")
            .parquet(self.path + "/lists")
        )

    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(self.path + "/centroids")

    def append(self, emb: DataFrame, batch_key: int | str | None = None) -> None:
        """Admit new vectors under the existing quantizer (no refit).

        ``batch_key`` (streaming / replayable ingest) switches the
        lists layout to ``ingest_batch=<key>/bucket=<b>`` and makes
        the write an IDEMPOTENT dynamic partition overwrite — a
        replayed batch rewrites its own partitions instead of
        appending a second copy (the same crash-replay contract as
        MinHashIndex.append). Without it, replaying an append
        duplicates list entries. A given index must be written
        consistently (always with batch keys, or never): parquet
        partition discovery requires one directory depth, so ``build``
        takes the same ``batch_key`` mode."""
        assigned = self._assign(self._normed(emb), self.centroids())
        if batch_key is None:
            (
                assigned.write.mode("append")
                .partitionBy("bucket")
                .option("compression", "zstd")
                .parquet(self.path + "/lists")
            )
        else:
            (
                assigned.withColumn("ingest_batch", F.lit(str(batch_key)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch", "bucket")
                .option("compression", "zstd")
                .parquet(self.path + "/lists")
            )

    def probe(self, queries: DataFrame, k: int = 3, nprobe: int = 2) -> DataFrame:
        """Exact-cosine top-k over the ``nprobe`` nearest inverted
        lists per query. The probed bucket set (≤ nprobe × |queries|,
        bounded by n_clusters) is collected so the lists scan carries
        a LITERAL partition filter — the documented pruning contract.
        """
        q = self._normed(queries)
        d2 = F.aggregate(
            F.zip_with("vn", "center", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        wp = Window.partitionBy(self.id_col).orderBy(
            F.col("_d2").asc(), F.col("bucket").asc()
        )
        probed = (
            q.crossJoin(F.broadcast(self.centroids()))
            .withColumn("_d2", d2)
            .withColumn("_rn", F.row_number().over(wp))
            .where(F.col("_rn") <= nprobe)
            .select(F.col(self.id_col).alias("q_id"), F.col("v").alias("q_v"), "bucket")
        )
        # bounded driver collect: distinct probed buckets <= n_clusters
        buckets = sorted({r["bucket"] for r in probed.select("bucket").distinct().collect()})
        if not buckets:  # empty query set: empty result, correct schema
            # derive id types from the actual inputs (queries for q_id,
            # the persisted lists for c_id) — a hardcoded bigint DDL
            # diverges from the non-empty path under non-bigint id_col
            from pyspark.sql.types import (
                DoubleType,
                IntegerType,
                StructField,
                StructType,
            )

            q_id_t = queries.schema[self.id_col].dataType
            c_id_t = self.spark.read.parquet(self.path + "/lists").schema[
                self.id_col
            ].dataType
            return self.spark.createDataFrame(
                [],
                StructType(
                    [
                        StructField("q_id", q_id_t),
                        StructField("rnk", IntegerType(), False),
                        StructField("c_id", c_id_t),
                        StructField("cosine", DoubleType()),
                    ]
                ),
            )
        lists = (
            self.spark.read.parquet(self.path + "/lists")
            .where(F.col("bucket").isin(buckets))
            .select(F.col(self.id_col).alias("c_id"), F.col("v").alias("c_v"), "bucket")
        )
        pairs = (
            probed.join(lists, "bucket")
            .where(F.col("q_id") != F.col("c_id"))
            .dropDuplicates(["q_id", "c_id"])
        )
        scored = pairs.select(
            "q_id", "c_id", F.round(cosine(F.col("q_v"), F.col("c_v")), 4).alias("cos")
        )
        w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("q_id", "rnk", "c_id", F.col("cos").alias("cosine"))
        )


# ---------------------------------------------------------- hard negatives
def hard_negatives(
    emb: DataFrame,
    query_ids,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive/retriever training: for
    each query vector, the top-``k`` most-similar candidates whose
    label DIFFERS from the query's — the near-miss examples that teach
    an embedding model its decision boundary (the in-batch-negatives
    upgrade every dense-retriever recipe ships).

    Same exact-cosine scale shape as cosine_topk_bruteforce: the
    query side is a broadcast of a handful of rows, candidates stream
    by once, norms are computed below the join, cosine is rounded to
    4 dp BEFORE ranking with a candidate-id tie-break. At 100 TB the
    label filter prunes candidate pairs before ranking; for mining
    over MILLIONS of queries, swap the broadcast cross join for the
    IVF/LSH bucket join (same downstream ranking), exactly as the
    X5→X6 pair does.
    """
    query_ids = list(query_ids)
    if not query_ids:
        raise ValueError("hard_negatives needs at least one query id")
    vecs = emb.select(
        F.col(id_col), F.col(label_col), as_double(vec_col).alias("v")
    )
    q = vecs.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(label_col).alias("q_label"),
        F.col("v").alias("q_v"),
        norm(F.col("v")).alias("q_n"),
    )
    c = vecs.select(
        F.col(id_col).alias("c_id"),
        F.col(label_col).alias("neg_label"),
        F.col("v").alias("c_v"),
        norm(F.col("v")).alias("c_n"),
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .where((F.col("q_id") != F.col("c_id")) & (F.col("q_label") != F.col("neg_label")))
    )
    scored = pairs.select(
        "q_id",
        "c_id",
        "neg_label",
        F.round(
            dot(F.col("q_v"), F.col("c_v")) / (F.col("q_n") * F.col("c_n")), 4
        ).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "rnk", "c_id", "neg_label", F.col("cos").alias("cosine"))
    )


def hard_negatives_sql(query_ids, k: int = 5, table: str = "embeddings") -> str:
    """DuckDB twin of :func:`hard_negatives` (list_cosine_similarity
    matches the Spark dot/norm fold bit-for-bit pre-round — the proven
    x_cosine_topk pairing)."""
    query_ids = list(query_ids)
    if not query_ids:
        raise ValueError("hard_negatives needs at least one query id")
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM {table}
    ),
    pairs AS (
      SELECT q.vec_id AS q_id, c.vec_id AS c_id, c.label AS neg_label,
             round(list_cosine_similarity(q.e, c.e), 4) AS cos
      FROM v q JOIN v c
        ON q.vec_id != c.vec_id AND q.label != c.label
      WHERE q.vec_id IN ({ids})
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rnk
      FROM pairs
    )
    SELECT q_id, rnk, c_id, neg_label, cos AS cosine
    FROM ranked WHERE rnk <= {k}
    ORDER BY q_id, rnk
    """


# ---------------------------------------------------------- triplet mining
def training_triplets(
    emb: DataFrame,
    query_ids,
    k_pos: int = 2,
    k_neg: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(anchor, positive, negative) triplet mining for metric-learning
    / retriever training: per anchor, the ``k_pos`` nearest SAME-label
    vectors crossed with the ``k_neg`` nearest OTHER-label vectors
    (the hard negatives), with the cosine margin the triplet loss
    would see. One broadcast of the anchor rows; the candidate set
    streams by twice (once per ranked side — the two window branches
    are separate scans); the final per-anchor cross of k_pos × k_neg
    tiny row sets is a broadcast-sized join.

    Float policy: cosines rounded to 4 dp before ranking (id
    tie-breaks); the margin is a subtraction of the two already-
    rounded doubles — bit-identical cross-engine.
    """
    query_ids = list(query_ids)
    if not query_ids:
        raise ValueError("training_triplets needs at least one query id")
    vecs = emb.select(
        F.col(id_col), F.col(label_col), as_double(vec_col).alias("v")
    )
    q = vecs.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(label_col).alias("q_label"),
        F.col("v").alias("q_v"),
        norm(F.col("v")).alias("q_n"),
    )
    c = vecs.select(
        F.col(id_col).alias("c_id"),
        F.col(label_col).alias("c_label"),
        F.col("v").alias("c_v"),
        norm(F.col("v")).alias("c_n"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "q_label",
            "c_id",
            "c_label",
            F.round(
                dot(F.col("q_v"), F.col("c_v")) / (F.col("q_n") * F.col("c_n")), 4
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    pos = (
        scored.where(F.col("q_label") == F.col("c_label"))
        .withColumn("pos_rnk", F.row_number().over(w))
        .where(F.col("pos_rnk") <= k_pos)
        .select("q_id", "pos_rnk", F.col("c_id").alias("pos_id"), F.col("cos").alias("pos_cos"))
    )
    neg = (
        scored.where(F.col("q_label") != F.col("c_label"))
        .withColumn("neg_rnk", F.row_number().over(w))
        .where(F.col("neg_rnk") <= k_neg)
        .select("q_id", "neg_rnk", F.col("c_id").alias("neg_id"), F.col("cos").alias("neg_cos"))
    )
    return pos.join(neg, "q_id").select(
        "q_id",
        "pos_rnk",
        "neg_rnk",
        "pos_id",
        "neg_id",
        "pos_cos",
        "neg_cos",
        (F.col("pos_cos") - F.col("neg_cos")).alias("margin"),
    )


def training_triplets_sql(
    query_ids, k_pos: int = 2, k_neg: int = 2, table: str = "embeddings"
) -> str:
    """DuckDB twin of :func:`training_triplets`."""
    query_ids = list(query_ids)
    if not query_ids:
        raise ValueError("training_triplets needs at least one query id")
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM {table}
    ),
    scored AS (
      SELECT q.vec_id AS q_id, q.label AS q_label,
             c.vec_id AS c_id, c.label AS c_label,
             round(list_cosine_similarity(q.e, c.e), 4) AS cos
      FROM v q JOIN v c ON q.vec_id != c.vec_id
      WHERE q.vec_id IN ({ids})
    ),
    pos AS (
      SELECT q_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS pos_rnk,
             c_id AS pos_id, cos AS pos_cos
      FROM scored WHERE q_label = c_label
      QUALIFY pos_rnk <= {k_pos}
    ),
    neg AS (
      SELECT q_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS neg_rnk,
             c_id AS neg_id, cos AS neg_cos
      FROM scored WHERE q_label != c_label
      QUALIFY neg_rnk <= {k_neg}
    )
    SELECT p.q_id, p.pos_rnk, n.neg_rnk, p.pos_id, n.neg_id,
           p.pos_cos, n.neg_cos, p.pos_cos - n.neg_cos AS margin
    FROM pos p JOIN neg n USING (q_id)
    ORDER BY q_id, pos_rnk, neg_rnk
    """


# ---------------------------------------------------- quantization audit
def quantization_recall(
    emb: DataFrame,
    query_ids,
    k: int = 5,
    levels: int = 127,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vector-index compression audit: per anchor, how much of the
    full-precision cosine top-``k`` survives symmetric int8-style
    quantization (per-vector max-abs scale, ``levels``=127 for int8)
    — the measurement that decides whether the ANN index can store
    8-bit codes at 1/4 the footprint. Output per anchor:
    ``(q_id, n_overlap, max_err_x1e4)`` — top-k set overlap and the
    worst cosine drift across the true top-k.

    Exactness: the quantized side is integer arithmetic end-to-end
    (dot products of <=127-magnitude ints are exact in ANY summation
    order), the full side is the proven round-4 cosine pattern, and
    the error column rounds a difference of two already-rounded
    doubles — value-exact cross-engine. One broadcast of the anchors;
    candidates stream by (twice — one ranking pass per precision)."""
    query_ids = list(query_ids)
    if not query_ids:
        raise ValueError("quantization_recall needs at least one query id")
    vecs = (
        emb.select(F.col(id_col), as_double(vec_col).alias("v"))
        .withColumn("mx", F.array_max(F.transform(F.col("v"), F.abs)))
        .withColumn(
            "qv",
            F.when(
                F.col("mx") == 0.0, F.transform(F.col("v"), lambda x: x * 0.0)
            ).otherwise(
                F.transform(
                    F.col("v"), lambda x: F.round(x * levels / F.col("mx"), 0)
                )
            ),
        )
    )
    a = vecs.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col("v").alias("a_v"),
        F.col("qv").alias("a_qv"),
        norm(F.col("v")).alias("a_n"),
        norm(F.col("qv")).alias("a_qn"),
    )
    c = vecs.select(
        F.col(id_col).alias("c_id"),
        F.col("v").alias("c_v"),
        F.col("qv").alias("c_qv"),
        norm(F.col("v")).alias("c_n"),
        norm(F.col("qv")).alias("c_qn"),
    )
    scored = (
        F.broadcast(a)
        .crossJoin(c)
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            F.round(dot(F.col("a_v"), F.col("c_v")) / (F.col("a_n") * F.col("c_n")), 4).alias("cos_f"),
            F.round(dot(F.col("a_qv"), F.col("c_qv")) / (F.col("a_qn") * F.col("c_qn")), 4).alias("cos_q"),
        )
    )
    wf = Window.partitionBy("q_id").orderBy(F.col("cos_f").desc(), F.col("c_id").asc())
    wq = Window.partitionBy("q_id").orderBy(F.col("cos_q").desc(), F.col("c_id").asc())
    fulltop = (
        scored.withColumn("rf", F.row_number().over(wf)).where(F.col("rf") <= k)
    )
    quanttop = (
        scored.withColumn("rq", F.row_number().over(wq))
        .where(F.col("rq") <= k)
        .select("q_id", "c_id", F.lit(1).alias("_in_q"))
    )
    return (
        fulltop.join(quanttop, ["q_id", "c_id"], "left")
        .groupBy("q_id")
        .agg(
            F.sum(F.coalesce("_in_q", F.lit(0))).cast("bigint").alias("n_overlap"),
            F.round(F.max(F.abs(F.col("cos_f") - F.col("cos_q"))) * 10000, 0)
            .cast("long")
            .alias("max_err_x1e4"),
        )
        .orderBy("q_id")
    )


def quantization_recall_sql(
    query_ids, k: int = 5, levels: int = 127, table: str = "embeddings"
) -> str:
    """DuckDB twin of :func:`quantization_recall`."""
    query_ids = list(query_ids)
    if not query_ids:
        raise ValueError("quantization_recall needs at least one query id")
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM {table}
    ), s AS (
      SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS mx FROM v
    ), q AS (
      SELECT vec_id, e,
             CASE WHEN mx = 0 THEN list_transform(e, x -> 0.0)
                  ELSE list_transform(e, x -> round(x * {levels} / mx, 0)) END AS qe
      FROM s
    ), scored AS (
      SELECT a.vec_id AS q_id, b.vec_id AS c_id,
             round(list_cosine_similarity(a.e, b.e), 4) AS cos_f,
             round(list_cosine_similarity(a.qe, b.qe), 4) AS cos_q
      FROM q a JOIN q b ON a.vec_id != b.vec_id
      WHERE a.vec_id IN ({ids})
    ), fulltop AS (
      SELECT q_id, c_id, cos_f, cos_q,
             row_number() OVER (PARTITION BY q_id ORDER BY cos_f DESC, c_id) AS rf
      FROM scored QUALIFY rf <= {k}
    ), quanttop AS (
      SELECT q_id, c_id,
             row_number() OVER (PARTITION BY q_id ORDER BY cos_q DESC, c_id) AS rq
      FROM scored QUALIFY rq <= {k}
    )
    SELECT f.q_id,
           CAST(count(qt.c_id) AS BIGINT) AS n_overlap,
           CAST(round(max(abs(f.cos_f - f.cos_q)) * 10000) AS BIGINT) AS max_err_x1e4
    FROM fulltop f LEFT JOIN quanttop qt USING (q_id, c_id)
    GROUP BY f.q_id ORDER BY f.q_id
    """
