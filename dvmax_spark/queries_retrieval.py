"""[EXT] Retrieval / corpus-indexing queries: vocabulary building,
BM25 ranking, duplicated-span statistics. The IR layer next to the
dedup stack (ref has no counterpart — these are the pre-training
pipeline extensions the brief names as first-class).

Past the external driver's 50-query cap; parity evidence is
tests/test_oracle_parity.py + tools/driver_sim.py --all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dvmax_spark.catalog import load_table
from dvmax_spark.ext.retrieval import (
    block_dedup_stats,
    block_dedup_stats_sql,
    bm25_rank,
    bm25_rank_sql,
    doc_chunks,
    doc_chunks_sql,
    dup_span_stats,
    dup_span_stats_sql,
    exact_substr_clean_vs,
    exact_substr_clean_vs_sql,
    exact_substr_dedup,
    exact_substr_dedup_sql,
    span_dedup_clean,
    span_dedup_clean_sql,
    tfidf_cosine_pairs,
    tfidf_cosine_pairs_sql,
    vocabulary,
    vocabulary_sql,
)
from dvmax_spark.registry import query
from dvmax_spark.operators.distrank import with_hash_slice

# A fixed bag-of-words query against the synthetic corpus vocabulary.
_BM25_TERMS = ("table", "spark", "join", "customer")


@query("x_vocab_topk", ids=("X7",), sql=vocabulary_sql(k=100))
def x_vocab_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by occurrence (tokenizer-
    training prerequisite). Explode → partial hash-agg → final sort of
    ≤|vocab| aggregated rows — never a sort of the token stream."""
    return vocabulary(load_table(spark, "documents", sf), k=100)


@query(
    "x_tfidf_cosine_pairs",
    ids=("X2", "X5"),
    bench=True,
    sql=tfidf_cosine_pairs_sql(0.85, max_df_ppm=100_000),
)
def x_tfidf_cosine_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Sparse tf-idf unigram cosine near-dup pairs (>= 0.85) over the
    non-boilerplate vocabulary (sklearn-style max_df = 10% of docs,
    mirrored exactly in the oracle) — the WEIGHTED complement of the
    exact-Jaccard and MinHash joins. On THIS template corpus the
    uncapped answer is degenerate (~all-pairs: 61k true pairs at
    sf0.1), so the capped config is the one a pipeline would run; the
    symmetric half-threshold prefix filter then prunes losslessly.
    Exact integer weights (quantized idf millis, tf counts), bigint
    dots/norms, IEEE-identical sqrt/divide — hash-matches the
    brute-force DuckDB oracle (ext/retrieval.py:tfidf_cosine_pairs)."""
    return tfidf_cosine_pairs(
        load_table(spark, "documents", sf), threshold=0.85, max_df_ppm=100_000
    )


@query("x_bm25_rank", ids=("X7", "X8"), bench=True, sql=bm25_rank_sql(_BM25_TERMS, k=20))
def x_bm25_rank(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 top-20 docs for a fixed bag-of-words query (quality-by-
    query mining over the corpus). Token stream filtered to the query
    terms BEFORE any shuffle; df/avgdl broadcast back; ranking on the
    pre-rounded score with doc-id tie-break."""
    return bm25_rank(load_table(spark, "documents", sf), _BM25_TERMS, k=20)


@query("x_dup_span_stats", ids=("X10", "X15"), bench=True, sql=dup_span_stats_sql(n=8))
def x_dup_span_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-document duplicated 8-gram-span fraction per doc
    (RefinedWeb-style repeated-passage signal). Inverted-index shape
    shared with exact Jaccard: one gram-occurrence shuffle, gram-level
    distinct-doc counts semi-joined back."""
    return dup_span_stats(load_table(spark, "documents", sf), n=8)


@query("x_span_dedup_clean", ids=("X10", "X15", "X1"), bench=True, sql=span_dedup_clean_sql(n=8))
def x_span_dedup_clean(spark: SparkSession, sf: str) -> DataFrame:
    """ExactSubstr-style duplicated-span REMOVAL (Lee et al. 2022 at
    token-8-gram granularity): positions covered by a cross-document
    duplicated 8-gram are deleted and the cleaned text reconstructed
    (exact counts + md5 per doc). Same one-shuffle inverted-index as
    x_dup_span_stats, plus an n-bounded coverage expansion on
    duplicated starts only and an ordered per-doc rebuild."""
    return span_dedup_clean(load_table(spark, "documents", sf), n=8)


@query(
    "x_exact_substr_dedup",
    ids=("X1", "X10", "X15"),
    bench=True,
    sql=exact_substr_dedup_sql(n=8, min_len=20),
)
def x_exact_substr_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical ExactSubstr dedup (Lee et al. 2022): adjacent
    duplicated 8-gram positions merge into MAXIMAL runs (islands
    window per doc) and only runs >= 20 tokens are removed — exact
    boundaries, so a 19-token duplicated snippet survives untouched,
    unlike x_span_dedup_clean's remove-every-covered-position form.
    Duplication is total corpus occurrences (within-doc verbatim
    repeats count, as in the paper's suffix-array formulation). Same
    single gram-occurrence shuffle; the run merge is a per-doc window,
    never corpus-wide."""
    return exact_substr_dedup(load_table(spark, "documents", sf), n=8, min_len=20)


@query(
    "x_substr_decontam",
    ids=("X1", "X10", "X18"),
    sql=exact_substr_clean_vs_sql(n=8, min_len=20),
)
def x_substr_decontam(spark: SparkSession, sf: str) -> DataFrame:
    """ExactSubstr vs a REFERENCE corpus (src0 as the admitted/eval
    side): every maximal run >= 20 tokens of 8-grams present anywhere
    in src0 is excised from the other sources' documents with exact
    boundaries — surgical span decontamination (keep the doc, cut the
    contaminated span) and equally the incremental ingest form of
    x_exact_substr_dedup (new batch cleaned against the corpus gram
    set without re-scanning corpus text). Cross-corpus-only semantics,
    so the verdict is batching-independent."""
    docs = load_table(spark, "documents", sf)
    return exact_substr_clean_vs(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
        n=8,
        min_len=20,
    )


@query(
    "t_stream_substr_decontam",
    ids=("X1", "X18", "T3", "S11"),
    sql=exact_substr_clean_vs_sql(n=8, min_len=20),
)
def t_stream_substr_decontam(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING span-level decontamination, run for real: src0's
    8-grams persist once as a GramIndex; the other sources arrive as 3
    micro-batches, each span-cleaned against the index
    (streaming/decontam_ingest.py:stream_substr_decontam) into a
    batch-keyed sink. Verdicts are per-doc against the frozen index —
    no cross-batch state — so the streamed union equals the one-shot
    x_substr_decontam sweep at ANY slicing, and the oracle is the same
    batch SQL: a hash match proves the ingest-time form is value-exact."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf
    import uuid as _uuid

    from pyspark.sql import Window as _W

    from dvmax_spark.ext.retrieval import GramIndex
    from dvmax_spark.streaming.decontam_ingest import stream_substr_decontam

    docs = load_table(spark, "documents", sf)
    ref = docs.where(F.col("source") == "src0")
    new = docs.where(F.col("source") != "src0")
    run_id = _uuid.uuid4().hex[:10]
    base = _os.path.join(
        _tf.gettempdir(), f"dvmax_substr_{_os.getpid()}_{run_id}"
    )
    in_dir = _os.path.join(base, "in")
    _os.makedirs(in_dir, exist_ok=True)
    idx = GramIndex(spark, _os.path.join(base, "grams"), n=8)
    idx.build(ref)
    staged = with_hash_slice(new, ["doc_id"], 3, "_b")
    now = None
    for i in (1, 2, 3):
        p = _os.path.join(base, f"s{i}")
        staged.where(F.col("_b") == i).drop("_b").coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        part = next(
            f for f in _os.listdir(p) if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = _os.path.join(in_dir, f"{i:03d}.parquet")
        _os.replace(_os.path.join(p, part), dst)
        if now is None:
            now = _os.stat(dst).st_mtime
        _os.utime(dst, (now + i, now + i))
        _sh.rmtree(p, ignore_errors=True)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = stream_substr_decontam(
            stream,
            idx,
            out_dir=_os.path.join(base, "clean"),
            min_len=20,
            checkpoint_dir=_os.path.join(base, "ckpt"),
            query_name=f"substr_{run_id}",
        )
        q.awaitTermination()
        if q.exception() is not None:
            raise RuntimeError(q.exception().desc)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        spark.read.parquet(_os.path.join(base, "clean"))
        .select(
            "doc_id", "n_tokens", "n_removed", "n_runs", "max_run_len", "clean_hash"
        )
        .orderBy("doc_id")
    )


@query("x_doc_chunks", ids=("X7", "X10"), bench=True, sql=doc_chunks_sql())
def x_doc_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """RAG-style overlapping chunker: 64-token windows every 32 tokens,
    tail partials kept, portable md5 chunk fingerprints (what a chunk
    index or chunk-level dedup keys on). Map-side only — zero shuffles
    at any corpus size."""
    return doc_chunks(load_table(spark, "documents", sf))


@query("x_doc_chunks_udtf", ids=("X7", "X10"), sql=doc_chunks_sql())
def x_doc_chunks_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """Python UDTF surface (SURVEY §2.10; Spark 4 @udtf): the SAME
    chunker semantics as x_doc_chunks expressed as a table function in
    a SQL LATERAL join — one input row yields N chunk rows. Python
    md5 == Spark md5 == DuckDB md5 (all RFC 1321 over utf-8), so even
    the UDTF path is value-exact against the doc_chunks SQL oracle.
    The Catalyst expression form (x_doc_chunks) is the production
    path — this pins the API surface and its exactness, and documents
    the cost: per-row Python eval vs whole-stage codegen."""
    import hashlib

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx bigint, chunk_tokens int, chunk_md5 string")
    class ChunkDoc:
        def eval(self, text):  # noqa: ANN001 - UDTF contract
            # match Spark/DuckDB split semantics: ''.split(' ') == ['']
            # (one empty token); only NULL text yields zero chunks
            toks = [] if text is None else text.split(" ")
            n = len(toks)
            for i, start in enumerate(range(0, n, 32)):
                chunk = " ".join(toks[start : start + 64])
                yield (
                    i,
                    min(64, n - start),
                    hashlib.md5(chunk.encode("utf-8")).hexdigest(),
                )

    spark.udtf.register("chunk_doc", ChunkDoc)
    from dvmax_spark.catalog import register_views

    register_views(spark, sf, names=("documents",))
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_tokens, c.chunk_md5
        FROM documents d, LATERAL chunk_doc(d.text) c
        ORDER BY d.doc_id, c.chunk_idx
        """
    )


@query("x_block_dedup", ids=("X1", "X15"), sql=block_dedup_stats_sql(w=16))
def x_block_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Sub-document exact dedup on non-overlapping 16-word blocks
    (ext/retrieval.py:block_dedup_stats) — the cheap first tier of
    repeated-passage removal: positions/16 index entries per doc vs
    ~positions for the overlapping-gram x_dup_span_stats, so it runs
    an order of magnitude lighter at the same corpus and gates which
    docs the expensive gram pass ever sees."""
    return block_dedup_stats(load_table(spark, "documents", sf), w=16)


from dvmax_spark.ext.retrieval import pmi_collocations, pmi_collocations_sql


@query("x_pmi_collocations", ids=("X7", "X8"), sql=pmi_collocations_sql(min_count=5, k=50))
def x_pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Adjacent-word collocation mining by PMI (Church & Hanks 1990):
    which bigrams co-occur far above chance — the phrase-discovery
    step feeding tokenizer vocab decisions (x_bpe_train's word-level
    sibling). Exact integer counts; single rounded log10; ranking on
    the rounded score with (w1, w2) tie-break."""
    return pmi_collocations(load_table(spark, "documents", sf), min_count=5, k=50)


from dvmax_spark.ext.retrieval import source_overlap, source_overlap_sql


@query("x_source_overlap", ids=("X2", "X17"), sql=source_overlap_sql(n=3))
def x_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise inter-source 3-gram Jaccard matrix: which pairs of
    corpus sources share template mass (one crawl wearing two hats
    double-counts its weight in the mixture). All-integer ppm Jaccard,
    value-exact; join blowup bounded by the source-count square per
    gram, not by corpus size."""
    return source_overlap(load_table(spark, "documents", sf), n=3)


from dvmax_spark.ext.retrieval import vocab_growth, vocab_growth_sql


@query("x_vocab_growth", ids=("X7",), sql=vocab_growth_sql(deciles=10))
def x_vocab_growth(spark: SparkSession, sf: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: cumulative distinct words vs
    cumulative tokens at ten corpus prefixes — the statistic that sizes
    a tokenizer vocabulary and justifies the BPE trainer's in-memory
    word dictionary (vocab grows sublinearly while tokens grow
    linearly). All counts exact integers, value-exact."""
    return vocab_growth(load_table(spark, "documents", sf), deciles=10)


from dvmax_spark.ext.retrieval import cdc_dedup_stats, cdc_dedup_stats_sql


@query("x_cdc_dedup", ids=("X1", "X10"), sql=cdc_dedup_stats_sql(avg_chunk=16))
def x_cdc_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Content-defined chunking dedup (Rabin-style boundaries on
    portable token hashes): shift-robust chunking — inserting a word
    moves ONE chunk boundary, not every downstream block — followed by
    corpus-wide exact chunk dedup, duplicated mass reported per
    source. The third tier of the sub-document dedup family (gram
    spans, fixed blocks, content-defined chunks). Value-exact."""
    return cdc_dedup_stats(load_table(spark, "documents", sf), avg_chunk=16)


from dvmax_spark.ext.retrieval import winnow_fingerprints, winnow_fingerprints_sql


@query("x_winnow_fp", ids=("X10", "X15"), sql=winnow_fingerprints_sql(k=4, w=4))
def x_winnow_fp(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing-family fingerprint sampling (local-minima selection
    over 4-gram hashes, cf. MOSS): only ~1/w of gram positions enter
    the dup index while any shared w+k-1-token run still collides —
    the sampled alternative to the exhaustive inverted index, with
    per-source index-size and shared-fingerprint stats. Value-exact."""
    return winnow_fingerprints(load_table(spark, "documents", sf), k=4, w=4)


from dvmax_spark.ext.retrieval import bm25_from_index


@query(
    "t_stream_bm25",
    ids=("X7", "T3", "S11"),
    sql=bm25_rank_sql(_BM25_TERMS, k=20),
)
def t_stream_bm25(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING BM25 index maintenance, run for real: the corpus
    arrives as 3 micro-batches; each batch's postings land in a
    batch-keyed partition and the corpus scalars merge into a
    marker-committed stats table (streaming/ingest.py:stream_into_bm25
    — replay-idempotent / exactly-once). The top-20 is then scored
    FROM THE INDEX with no document rescan, and the oracle is the
    one-shot batch BM25 SQL: a hash match proves index-maintained
    scoring is value-exact regardless of micro-batch slicing."""
    import os as _os
    import tempfile as _tf
    import uuid as _uuid

    from pyspark.sql import Window as _W
    from pyspark.sql import functions as F

    from dvmax_spark.streaming.ingest import stream_into_bm25

    docs = load_table(spark, "documents", sf)
    run_id = _uuid.uuid4().hex[:10]
    base = _os.path.join(_tf.gettempdir(), f"dvmax_bm25_{_os.getpid()}_{run_id}")
    in_dir = _os.path.join(base, "in")
    _os.makedirs(in_dir, exist_ok=True)
    staged = with_hash_slice(docs, ["doc_id"], 3, "_b")
    now = None
    for i in (1, 2, 3):
        p = _os.path.join(base, f"s{i}")
        staged.where(F.col("_b") == i).drop("_b").coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        part = next(
            f
            for f in _os.listdir(p)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = _os.path.join(in_dir, f"{i:03d}.parquet")
        _os.replace(_os.path.join(p, part), dst)
        if now is None:
            now = _os.stat(dst).st_mtime
        _os.utime(dst, (now + i, now + i))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = stream_into_bm25(
            stream,
            _os.path.join(base, "index"),
            checkpoint_dir=_os.path.join(base, "ckpt"),
            query_name=f"bm25_{run_id}",
        )
        q.awaitTermination()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return bm25_from_index(spark, _os.path.join(base, "index"), _BM25_TERMS, k=20)


from dvmax_spark.ext.retrieval import (
    rrf_fusion,
    rrf_fusion_sql,
    zipf_slope,
    zipf_slope_sql,
)


@query("x_rrf_fusion", ids=("X8", "X5"), sql=rrf_fusion_sql(_BM25_TERMS))
def x_rrf_fusion(spark: SparkSession, sf: str) -> DataFrame:
    """Reciprocal-rank fusion of BM25 relevance (fixed query) with the
    heuristic quality ranking — hybrid-retrieval's standard
    calibration-free combiner. Exact integer ppm contributions
    (1e6 div (60+rank)), ranks over pre-rounded scores with id
    tie-breaks; each ranker reduces to its top-50 pool BEFORE fusion
    (ext/retrieval.py:rrf_fusion)."""
    return rrf_fusion(load_table(spark, "documents", sf), _BM25_TERMS, k=20)


@query("x_zipf_slope", ids=("X7",), sql=zipf_slope_sql(top=1000))
def x_zipf_slope(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf rank-frequency slope of the top-1000 vocabulary (natural
    text sits near -1; boilerplate/synthetic corpora drift off) — the
    corpus-health diagnostic next to the Heaps curve. Exact bigint
    regression moments over milli-quantized logs; one final divide
    (ext/retrieval.py:zipf_slope)."""
    return zipf_slope(load_table(spark, "documents", sf), top=1000)


from dvmax_spark.ext.retrieval import assoc_rules, assoc_rules_sql


@query("x_assoc_rules", ids=("X7", "A1"), sql=assoc_rules_sql(min_support=50))
def x_assoc_rules(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise association rules over per-doc token sets (Apriori,
    support >= 50 docs, confidence >= 0.4, top-50 by lift) — which
    token co-occurrences are RULES, not just frequent; PMI's
    thresholded market-basket sibling. Apriori-pruned BEFORE pairing
    (infrequent tokens can't form frequent pairs), all measures exact
    integer ppm (ext/retrieval.py:assoc_rules)."""
    return assoc_rules(load_table(spark, "documents", sf), min_support=50)
