"""[EXT] Text analysis over document tables — all Catalyst expressions,
no Python UDFs: token counting, quality scoring, n-gram-heuristic
language ID, and rolling-hash document fingerprints.

Everything here is a narrow projection over the text column, so the
scan prunes to (id, text) and the operators scale linearly with zero
shuffles (fingerprint/lang-id are per-row expressions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram-heuristic language ID.
# Order fixes argmax tie-breaking.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "in", "to", "is"),
    "de": ("der", "die", "das", "und", "ein", "zu", "ist"),
    "es": ("el", "la", "de", "y", "en", "que", "es"),
    "fr": ("le", "la", "les", "et", "un", "en", "est"),
    "zh": ("的", "了", "是", "在", "我", "有", "和"),
}

# Mod constants for the order-sensitive document fingerprint (fits in
# int64 with room: (hash % 1e6+3) * position stays < 2^63 for any
# realistic document length).
_FP_TOKEN_MOD = 1_000_003
_FP_MOD = 1_000_000_007


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (documents testdata is space-separated)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-ish tokenization: split on word boundaries keeping
    punctuation as tokens — a cheap stand-in for subword counting."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.regexp_replace(c, r"([^\w\s])", r" $1 "), r"\s+"),
        lambda t: t != "",
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add n_tokens / n_distinct_tokens / distinct_ratio / avg_token_len."""
    t = tokens(text_col)
    n = F.size(t)
    n_distinct = F.size(F.array_distinct(t))
    total_len = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return (
        df.withColumn("n_tokens", n)
        .withColumn("n_distinct_tokens", n_distinct)
        .withColumn(
            "distinct_ratio",
            F.when(n > 0, n_distinct.cast("double") / n).otherwise(F.lit(None)),
        )
        .withColumn(
            "avg_token_len",
            F.when(n > 0, total_len.cast("double") / n).otherwise(F.lit(None)),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: length saturation +
    vocabulary diversity + stopword plausibility (the standard cheap
    pre-training filters)."""
    t = tokens(text_col)
    n = F.size(t).cast("double")
    n_distinct = F.size(F.array_distinct(t)).cast("double")
    sw = list(LANG_STOPWORDS["en"])
    n_stop = F.size(F.filter(t, lambda x: x.isin(sw))).cast("double")
    length_part = F.least(n / F.lit(100.0), F.lit(1.0))
    diversity_part = F.when(n > 0, n_distinct / n).otherwise(F.lit(0.0))
    stop_part = F.least(F.when(n > 0, n_stop / n).otherwise(F.lit(0.0)) * 4.0, F.lit(1.0))
    score = 0.4 * length_part + 0.3 * diversity_part + 0.3 * stop_part
    return df.withColumn("quality", score)


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-statistics quality score (a CCNet-style LM filter,
    reduced to its order-0 core): each doc's mean log10 probability of
    its tokens under the CORPUS unigram distribution. Docs of rare
    gibberish score low; docs of common fluent words score high —
    unlike the per-doc heuristics above, this signal is data-dependent
    (two passes over the corpus).

    Scale shape: explode -> hash-agg builds the frequency table (vocab
    is Heaps-sublinear in corpus size), token stream joins back on the
    token (shuffle join; broadcast it when the vocab fits), one final
    per-doc aggregate. No Python anywhere.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    ).where(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    total = freq.agg(F.sum("n").alias("N"))
    # rename before the join: `total` derives from `freq`, so keeping
    # the name `n` on both branches trips self-join attribute ambiguity
    scored = toks.join(freq.withColumnRenamed("n", "tok_n"), "tok").crossJoin(
        F.broadcast(total)
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log10(F.col("tok_n") / F.col("N"))), 4).alias("avg_logprob"),
        )
        .orderBy(id_col)
    )


def unigram_logprob_sql(table: str = "documents") -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(str_split(lower(text), ' ')) AS tok FROM {table}
    ), t AS (
      SELECT doc_id, tok FROM toks WHERE tok <> ''
    ), freq AS (
      SELECT tok, count(*) AS n FROM t GROUP BY tok
    ), tot AS (
      SELECT CAST(sum(n) AS DOUBLE) AS N FROM freq
    )
    SELECT t.doc_id, count(*) AS n_tokens,
           round(avg(log10(freq.n / tot.N)), 4) AS avg_logprob
    FROM t JOIN freq USING (tok), tot
    GROUP BY t.doc_id ORDER BY t.doc_id
    """


def ccnet_buckets(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """CCNet-style head/middle/tail corpus partition (Wenzek et al.,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data", LREC 2020): per LANGUAGE, order documents best-first by LM
    score and split at one-third / two-thirds of the CUMULATIVE
    CHARACTER MASS — the paper buckets by corpus volume, not document
    count, so a few long fluent documents can fill `head` on their own.

    The LM is the order-0 corpus unigram model (:func:`unigram_logprob`
    — CCNet's Kneser-Ney LM reduced to the in-repo exact form); higher
    ``avg_logprob`` = lower perplexity = better. The per-language
    running mass uses the distributed exact per-group cumsum
    (operators/distrank.py:with_group_cumsum) — no per-language window
    pool, so a corpus that is 95% English never bottlenecks on one
    task. Boundaries compare ``3·cum ≤ total`` / ``3·cum ≤ 2·total`` in
    bigint, so bucket assignment is exact at any corpus size.

    Returns one row per (lang, bucket): document count, character
    mass, and the score range the bucket spans.
    """
    from dvmax_spark.operators.distrank import with_group_cumsum

    scored = unigram_logprob(df, id_col=id_col).select(id_col, "avg_logprob")
    # j feeds both the distributed cumsum and the per-language totals;
    # materialize it once so the unigram LM (token explode + two
    # aggregations) is not re-derived per consumer (r10, guide §3.3/§5).
    j = (
        df.select(id_col, "lang", F.col("n_chars").cast("long").alias("n_chars"))
        .join(scored, id_col)
        .localCheckpoint(eager=False)
    )
    cum = with_group_cumsum(
        j,
        ["lang"],
        [F.col("avg_logprob").desc(), F.col(id_col).asc()],
        "n_chars",
        out_col="cum",
    )
    totals = j.groupBy("lang").agg(F.sum("n_chars").alias("total"))
    bucket = (
        F.when(F.col("cum") * 3 <= F.col("total"), F.lit("head"))
        .when(F.col("cum") * 3 <= F.col("total") * 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    # null-safe re-join: with_group_cumsum groups NULL lang as its own
    # group (as does the oracle's PARTITION BY lang) — a plain equi-join
    # here would silently drop null-lang docs from the output
    return (
        cum.join(
            F.broadcast(totals.withColumnRenamed("lang", "_tlang")),
            F.col("lang").eqNullSafe(F.col("_tlang")),
        )
        .drop("_tlang")
        .withColumn("bucket", bucket)
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars"),
            F.min("avg_logprob").alias("min_lp"),
            F.max("avg_logprob").alias("max_lp"),
        )
        .orderBy("lang", "bucket")
    )


def ccnet_buckets_sql(table: str = "documents") -> str:
    return f"""
    WITH scored AS ({unigram_logprob_sql(table)}),
    j AS (
      SELECT s.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
             s.avg_logprob
      FROM scored s JOIN {table} d USING (doc_id)
    ), c AS (
      SELECT lang, n_chars, avg_logprob,
             sum(n_chars) OVER (PARTITION BY lang
                                ORDER BY avg_logprob DESC, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum,
             sum(n_chars) OVER (PARTITION BY lang) AS total
      FROM j
    )
    SELECT lang,
           CASE WHEN cum * 3 <= total THEN 'head'
                WHEN cum * 3 <= total * 2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           min(avg_logprob) AS min_lp,
           max(avg_logprob) AS max_lp
    FROM c GROUP BY 1, 2 ORDER BY 1, 2
    """


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lo_ppm: int = 300_000,
    hi_ppm: int = 900_000,
) -> DataFrame:
    """zlib compression-ratio quality gate (the RefinedWeb/Dolma-class
    heuristic the pure-SQL stats can't express): highly repetitive or
    templated text compresses far below normal prose, random gibberish
    barely compresses at all — keep documents whose
    ``compressed/raw`` ratio (integer parts-per-million) falls inside
    (lo_ppm, hi_ppm).

    Python is unavoidable here (no zlib in either engine's SQL), so
    the implementation is the sanctioned slow-path shape: Arrow-batched
    ``mapInPandas``, looping only within a batch — never a row-at-a-
    time UDF. Deterministic for a fixed zlib build (level pinned), so
    results are stable within an environment but NOT cross-engine
    oracleable — registered rows-only; the test instead pins
    bit-equality against a driver-side zlib call on the same strings.

    Returns (id, n_bytes, z_bytes, ratio_ppm, keep); empty text yields
    null ratio and keep=false.
    """
    import pandas as pd
    from pyspark.sql import types as T

    id_name, text_name = id_col, text_col

    def _batches(it):
        import zlib

        for pdf in it:
            rows = []
            for i, txt in zip(pdf[id_name], pdf[text_name]):
                raw = (txt or "").encode("utf-8")
                if raw:
                    z = len(zlib.compress(raw, 6))
                    ppm = z * 1_000_000 // len(raw)
                    keep = lo_ppm < ppm < hi_ppm
                    rows.append((int(i), len(raw), z, ppm, keep))
                else:
                    rows.append((int(i), 0, None, None, False))
            yield pd.DataFrame(
                rows, columns=["_id", "n_bytes", "z_bytes", "ratio_ppm", "keep"]
            )

    schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("z_bytes", T.LongType()),
            T.StructField("ratio_ppm", T.LongType()),
            T.StructField("keep", T.BooleanType()),
        ]
    )
    return (
        df.select(id_col, text_col)
        .mapInPandas(_batches, schema)
        .withColumnRenamed("_id", id_col)
    )


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language stopword-hit counts (with multiplicity) + predicted
    language (argmax, ties broken by LANG_STOPWORDS key order)."""
    t = tokens(text_col)
    out = df
    langs = list(LANG_STOPWORDS)
    for lang in langs:
        words = list(LANG_STOPWORDS[lang])
        out = out.withColumn(f"score_{lang}", F.size(F.filter(t, lambda x: x.isin(words))))
    pred = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            ge = F.col(f"score_{lang}") >= F.col(f"score_{other}")
            cond = ge if cond is None else (cond & ge)
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    out = out.withColumn("predicted_lang", pred.otherwise(F.lit(langs[-1])))
    return out


def _token_hash(tok: Column) -> Column:
    """Engine-independent 60-bit token hash: first 15 hex digits of md5.

    Uses md5 (identical across Spark/DuckDB/everything) instead of the
    engines' native hash functions so fingerprints are portable.
    """
    return F.conv(F.substring(F.md5(F.encode(tok, "utf-8")), 1, 15), 16, 10).cast("long")


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Order-sensitive document fingerprint: position-weighted polynomial
    over portable token hashes, mod a large prime. Reordering tokens
    changes the fingerprint; duplicates collide with prob ~1e-9."""
    t = tokens(text_col)
    hashed = F.transform(t, lambda x, i: ((_token_hash(x) % _FP_TOKEN_MOD) * (i + 1)))
    fp = F.aggregate(hashed, F.lit(0).cast("long"), lambda acc, x: (acc + x) % _FP_MOD)
    return df.withColumn(out, fp)


def repetition_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1, public):
    documents dominated by repeated tokens / a single repeated n-gram
    are boilerplate or spam and get filtered before pre-training.

      dup_token_frac  — 1 - distinct/total tokens
      top_bigram_frac — occurrences of the most frequent bigram over
                        total bigrams
      passes_repetition_gate — the standard keep decision

    Scale shape: ENTIRELY per-row expressions — the top-bigram count is
    a run-length fold over the SORTED per-doc bigram array (equal grams
    become adjacent), so there is no explode, no shuffle, and the
    operator is pure map-side at any corpus size. Per-doc work is
    O(len·log len), bounded by document length. No Python.
    """
    # Stage the token and gram arrays as their own projections so each
    # is built ONCE: inlined into one select, the multiply-referenced
    # array expressions are re-evaluated per reference under
    # interpreted higher-order eval (CollapseProject keeps the barrier
    # for non-cheap, multiply-referenced aliases).
    staged = df.withColumn("_toks", tokens(text_col))
    toks = F.col("_toks")
    n = F.size(toks)
    # zip two whole-array slices rather than slicing per element — the
    # per-gram slice allocates under interpreted higher-order eval and
    # was the dominant cost of this operator (~8x)
    staged = staged.withColumn(
        "_grams",
        F.when(
            n >= 2,
            F.zip_with(
                F.slice(toks, 1, n - 1),
                F.slice(toks, 2, n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    grams = F.col("_grams")
    dup_frac = F.when(
        n > 0, 1.0 - F.size(F.array_distinct(toks)).cast("double") / n
    ).otherwise(F.lit(0.0))
    # longest run of equal adjacent elements in the sorted gram array
    # == max frequency of any bigram; struct-accumulator fold
    top_freq = F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    # no rounding: plain IEEE divisions are bit-identical across
    # engines, while round() near .5 boundaries (e.g. 1/32) is not
    top_frac = F.when(
        F.size(grams) > 0, top_freq.cast("double") / F.size(grams)
    ).otherwise(F.lit(0.0))
    out = staged.select(
        F.col(id_col),
        dup_frac.alias("dup_token_frac"),
        top_frac.alias("top_bigram_frac"),
    )
    gate = (F.col("dup_token_frac") <= 0.7) & (F.col("top_bigram_frac") <= 0.2)
    return out.withColumn("passes_repetition_gate", gate.cast("int"))


# PII patterns kept to the regex subset where Java (Spark) and RE2
# (DuckDB) agree: character classes, bounded repeats, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9() -]{6,}[0-9]"


def pii_redact(
    df: DataFrame, text_col: str = "text", out: str = "redacted"
) -> DataFrame:
    """PII scrubbing for training corpora: replace emails/phones with
    typed placeholder tags and count what was removed — per-row regex
    expressions, fully JVM-side, zero shuffles."""
    c = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0))
    redacted = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    n_phones = F.size(F.regexp_extract_all(redacted, F.lit(PHONE_RE), 0))
    redacted = F.regexp_replace(redacted, PHONE_RE, "<PHONE>")
    return (
        df.withColumn("n_emails", n_emails)
        .withColumn("n_phones", n_phones)
        .withColumn(out, redacted)
    )


def lang_id_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB oracle SQL mirroring lang_scores(), generated from the
    same LANG_STOPWORDS table so both sides always agree."""
    langs = list(LANG_STOPWORDS)
    score_exprs = []
    for lang in langs:
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        score_exprs.append(
            f"len(list_filter(str_split({text_col}, ' '), x -> x IN ({words}))) AS score_{lang}"
        )
    pred_cases = []
    for lang in langs:
        conds = " AND ".join(
            f"score_{lang} >= score_{o}" for o in langs if o != lang
        )
        pred_cases.append(f"WHEN {conds} THEN '{lang}'")
    return f"""
    WITH scored AS (
      SELECT doc_id, lang, {", ".join(score_exprs)} FROM {table}
    )
    SELECT doc_id, lang, score_en, score_de, score_es, score_fr, score_zh,
           CASE {" ".join(pred_cases)} ELSE '{langs[-1]}' END AS predicted_lang
    FROM scored ORDER BY doc_id
    """


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_k: int = 50
) -> DataFrame:
    """One BPE-training pair-count iteration (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units") as
    a two-aggregate Spark plan — the map-reduce formulation tokenizer
    trainers use at corpus scale.

    The scale insight carried over from the paper's algorithm: pair
    counting never touches the corpus directly. Pass 1 (the ONLY
    corpus-proportional work) builds the word-frequency table — one
    explode + hash-aggregate, Heaps-law-sublinear output. Pass 2
    explodes each DISTINCT word into its adjacent character pairs
    (zip-of-slices, same codegen-friendly idiom as shingle_seq) and
    sums word frequencies per pair — work proportional to the word
    DICT, not the corpus, which is why real BPE training over
    trillions of tokens is feasible. Top-k pairs (count desc, pair asc
    tie-break) are the iteration's merge candidates.

    At 100 TB: both aggregates are partial (map-side combine); the
    first shuffles the token stream on the word, the second shuffles
    only the dict-sized pair stream. No Python, no driver loops.
    """
    words = df.select(F.explode(F.split(F.col(text_col), " ")).alias("w")).where(
        F.col("w") != ""
    )
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    cs = F.split(F.col("w"), "")
    n_pairs = F.size(cs) - 1
    pairs = F.zip_with(
        F.slice(cs, 1, n_pairs),
        F.slice(cs, 2, n_pairs),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        wc.select("f", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("f").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(top_k)
    )


def bpe_pair_counts_sql(
    table: str = "documents", text_col: str = "text", top_k: int = 50
) -> str:
    """DuckDB twin of :func:`bpe_pair_counts` (char slicing is
    per-code-point both sides; testdata is BMP-only so Java's
    code-unit split('') agrees)."""
    return f"""
    WITH words AS (
      SELECT unnest(str_split({text_col}, ' ')) AS w FROM {table}
    ), wc AS (
      SELECT w, count(*) AS f FROM words WHERE w <> '' GROUP BY w
    ), pairs AS (
      SELECT unnest(list_transform(range(1, length(w)),
                    i -> w[i:i] || ' ' || w[i+1:i+1])) AS pair, f
      FROM wc
    )
    SELECT pair, CAST(sum(f) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair ASC LIMIT {top_k}
    """


def feature_hash(
    df: DataFrame,
    dims: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashing-trick term-frequency features (Weinberger et al. 2009,
    "Feature Hashing for Large Scale Multitask Learning"): each token
    maps to ``portable_hash(token) % dims`` and the doc's feature
    vector is the per-dimension token count, emitted SPARSE as
    (doc, dim, tf) rows — the representation a downstream trainer or
    clusterer joins on.

    Why hashing beats a vocabulary at 100 TB: no vocabulary pass, no
    vocab broadcast, no OOV handling — the feature space is fixed
    before the first byte is read, so this is ONE explode + ONE
    partial-aggregated groupBy over the corpus, and two corpora
    hashed with the same dims are feature-compatible by construction.
    The hash is the engine-portable md5 bucket (same as splits /
    sampling), so features are reproducible across engines and runs.
    """
    from dvmax_spark.ext.traindata import hash_bucket

    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    return (
        toks.groupBy(id_col, hash_bucket("tok", dims).alias("dim"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def feature_hash_sql(
    dims: int = 64, table: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`feature_hash` (same md5 bucket)."""
    from dvmax_spark.ext.traindata import _duck_bucket

    b = _duck_bucket("tok", dims)
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(str_split({text_col}, ' ')) AS tok FROM {table}
    )
    SELECT doc_id, {b} AS dim, count(*) AS tf
    FROM toks WHERE tok <> ''
    GROUP BY doc_id, dim
    ORDER BY doc_id, dim
    """


def bigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Order-1 corpus LM quality score: each doc's mean log10 of the
    add-one-smoothed bigram conditional ``P(w2|w1) = (c(w1,w2)+1) /
    (ctx(w1)+V)`` under corpus statistics — one step past
    :func:`unigram_logprob` toward the CCNet LM filter: it penalizes
    UNLIKELY TRANSITIONS (word salad built from common words) that
    order-0 cannot see. Docs with fewer than two tokens have no
    bigrams and drop out.

    Scale shape mirrors unigram: the bigram stream aggregates to the
    (Heaps-sublinear) bigram and context tables, which join back on
    the bigram key; the vocab size is ONE broadcast scalar. No Python.
    """
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda x: x != ""
    )
    n = F.size(arr) - 1
    pairs = F.zip_with(
        F.slice(arr, 1, n),
        F.slice(arr, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    occ = df.select(F.col(id_col), F.explode(pairs).alias("s")).select(
        id_col, F.col("s.w1").alias("w1"), F.col("s.w2").alias("w2")
    )
    c2 = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    ctx = occ.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    vocab = df.select(F.explode(arr).alias("tok")).agg(
        F.countDistinct("tok").cast("double").alias("V")
    )
    p = (F.col("n2") + F.lit(1)).cast("double") / (
        F.col("n1") + F.col("V")
    )
    return (
        occ.join(c2, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log10(p)), 4).alias("avg_logprob"),
        )
    )


def bigram_logprob_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB twin of :func:`bigram_logprob`."""
    return f"""
    WITH arrs AS (
      SELECT doc_id,
             list_filter(str_split(lower({text_col}), ' '), x -> x <> '') AS a
      FROM {table}
    ), o AS (
      SELECT doc_id, s['w1'] AS w1, s['w2'] AS w2 FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(a)),
                      i -> {{'w1': a[i], 'w2': a[i+1]}})) AS s
        FROM arrs
      )
    ), c2 AS (
      SELECT w1, w2, count(*) AS n2 FROM o GROUP BY w1, w2
    ), ctx AS (
      SELECT w1, count(*) AS n1 FROM o GROUP BY w1
    ), v AS (
      SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS V
      FROM (SELECT unnest(a) AS tok FROM arrs)
    )
    SELECT o.doc_id, count(*) AS n_bigrams,
           round(avg(log10((c2.n2 + 1) / (ctx.n1 + v.V))), 4) AS avg_logprob
    FROM o JOIN c2 USING (w1, w2) JOIN ctx USING (w1), v
    GROUP BY o.doc_id ORDER BY o.doc_id
    """


# ----------------------------------------------------------- Gopher gate

# Distinct-presence stopword test (Gopher's "contains at least two of
# the following English words" rule) — reuses the lang-id list so the
# two heuristics can't drift.
_GOPHER_STOPWORDS: tuple[str, ...] = LANG_STOPWORDS["en"]


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words: int = 20,
    max_words: int = 1000,
    min_mwl_c: int = 300,
    max_mwl_c: int = 1000,
    max_symbol_ppm: int = 100_000,
    min_alpha_ppm: int = 800_000,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style document quality gate (Rae et al. 2021 §A1.1 /
    the MassiveWeb filter heuristics), evaluated per document with a
    first-failing-rule routing reason:

      * word count in [min_words, max_words]
      * mean word length in [3.0, 10.0] chars (reported ×100 exact)
      * symbol-to-word ratio ('#' and '...') <= 0.1 (reported in ppm)
      * >= 80% of words contain at least one alphabetic char (ppm)
      * contains >= ``min_stopwords`` DISTINCT common English words

    All arithmetic is EXACT bigint (`div` ratios reported ×100 / in
    parts-per-million, matching DuckDB `//`) — no float crosses the
    engine boundary, so parity is bit-exact by construction. Every
    rule is a map-side Catalyst expression over the token array; zero
    shuffles, zero Python (the reference's validation ops follow the
    same rule-to-expression compilation, validation/rules.py).

    Scale: embarrassingly parallel scan; at 100 TB this is the cheap
    first gate that runs BEFORE any dedup shuffle (each rule prunes
    the corpus the expensive operators see).
    """
    c = F.col(text_col)
    tk = tokens(text_col)
    sw = [F.lit(w) for w in _GOPHER_STOPWORDS]
    ell = F.length(c) - F.length(F.replace(c, F.lit("...")))
    staged = df.select(
        F.col(id_col),
        F.size(tk).cast("bigint").alias("n_words"),
        # exact char mass of the words themselves, robust to repeated
        # separators (translate strips EVERY space)
        F.length(F.translate(c, " ", "")).cast("bigint").alias("char_sum"),
        F.size(F.filter(tk, lambda x: x.rlike("[A-Za-z]")))
        .cast("bigint")
        .alias("n_alpha"),
        (
            (F.length(c) - F.length(F.replace(c, F.lit("#"))))
            + (ell - ell % 3) / 3
        )
        .cast("bigint")
        .alias("n_symbol"),
        F.size(F.array_distinct(F.array_intersect(tk, F.array(*sw))))
        .cast("bigint")
        .alias("n_stop"),
    )
    ratios = staged.select(
        id_col,
        "n_words",
        F.expr("CASE WHEN n_words > 0 THEN (100 * char_sum) div n_words ELSE 0 END")
        .cast("bigint")
        .alias("mwl_c"),
        F.expr(
            "CASE WHEN n_words > 0 THEN (1000000 * n_alpha) div n_words ELSE 0 END"
        )
        .cast("bigint")
        .alias("alpha_ppm"),
        F.expr(
            "CASE WHEN n_words > 0 THEN (1000000 * n_symbol) div n_words ELSE 0 END"
        )
        .cast("bigint")
        .alias("symbol_ppm"),
        "n_stop",
    )
    reason = (
        F.when(F.col("n_words") < min_words, F.lit("too_few_words"))
        .when(F.col("n_words") > max_words, F.lit("too_many_words"))
        .when(F.col("mwl_c") < min_mwl_c, F.lit("mean_word_len_low"))
        .when(F.col("mwl_c") > max_mwl_c, F.lit("mean_word_len_high"))
        .when(F.col("symbol_ppm") > max_symbol_ppm, F.lit("symbol_heavy"))
        .when(F.col("alpha_ppm") < min_alpha_ppm, F.lit("non_alpha_heavy"))
        .when(F.col("n_stop") < min_stopwords, F.lit("too_few_stopwords"))
        .otherwise(F.lit("ok"))
    )
    return ratios.select(
        id_col,
        "n_words",
        "mwl_c",
        "alpha_ppm",
        "symbol_ppm",
        "n_stop",
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    ).orderBy(id_col)


def gopher_rules_sql(
    table: str = "documents",
    *,
    min_words: int = 20,
    max_words: int = 1000,
    min_mwl_c: int = 300,
    max_mwl_c: int = 1000,
    max_symbol_ppm: int = 100_000,
    min_alpha_ppm: int = 800_000,
    min_stopwords: int = 2,
) -> str:
    sw = ", ".join(f"'{w}'" for w in _GOPHER_STOPWORDS)
    return f"""
    WITH staged AS (
      SELECT doc_id,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(length(replace(text, ' ', '')) AS BIGINT) AS char_sum,
             CAST(len(list_filter(str_split(text, ' '),
                      x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
             CAST((length(text) - length(replace(text, '#', '')))
                  + (length(text) - length(replace(text, '...', ''))) // 3
                  AS BIGINT) AS n_symbol,
             CAST(len(list_distinct(list_intersect(str_split(text, ' '),
                      [{sw}]))) AS BIGINT) AS n_stop
      FROM {table}
    ), ratios AS (
      SELECT doc_id, n_words,
             CAST(CASE WHEN n_words > 0 THEN (100 * char_sum) // n_words
                  ELSE 0 END AS BIGINT) AS mwl_c,
             CAST(CASE WHEN n_words > 0 THEN (1000000 * n_alpha) // n_words
                  ELSE 0 END AS BIGINT) AS alpha_ppm,
             CAST(CASE WHEN n_words > 0 THEN (1000000 * n_symbol) // n_words
                  ELSE 0 END AS BIGINT) AS symbol_ppm,
             n_stop
      FROM staged
    )
    SELECT doc_id, n_words, mwl_c, alpha_ppm, symbol_ppm, n_stop,
           CASE WHEN n_words < {min_words} THEN 'too_few_words'
                WHEN n_words > {max_words} THEN 'too_many_words'
                WHEN mwl_c < {min_mwl_c} THEN 'mean_word_len_low'
                WHEN mwl_c > {max_mwl_c} THEN 'mean_word_len_high'
                WHEN symbol_ppm > {max_symbol_ppm} THEN 'symbol_heavy'
                WHEN alpha_ppm < {min_alpha_ppm} THEN 'non_alpha_heavy'
                WHEN n_stop < {min_stopwords} THEN 'too_few_stopwords'
                ELSE 'ok' END AS reason,
           (CASE WHEN n_words < {min_words} THEN 'too_few_words'
                WHEN n_words > {max_words} THEN 'too_many_words'
                WHEN mwl_c < {min_mwl_c} THEN 'mean_word_len_low'
                WHEN mwl_c > {max_mwl_c} THEN 'mean_word_len_high'
                WHEN symbol_ppm > {max_symbol_ppm} THEN 'symbol_heavy'
                WHEN alpha_ppm < {min_alpha_ppm} THEN 'non_alpha_heavy'
                WHEN n_stop < {min_stopwords} THEN 'too_few_stopwords'
                ELSE 'ok' END) = 'ok' AS keep
    FROM ratios ORDER BY doc_id
    """


def token_entropy(
    df: DataFrame,
    min_tokens: int = 20,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document token-distribution Shannon entropy, surfacing the
    ``k`` LOWEST-entropy documents of ``min_tokens``+ length — the
    information-theoretic repetition filter: a doc that keeps reusing
    the same few tokens has low entropy regardless of WHICH pattern
    repeats, catching what the duplicate-fraction and top-bigram
    heuristics (:func:`repetition_stats`) each see only partially.

    Exactness: H = ln(n) − (1/n)·Σ n_c·ln(n_c) is computed as exact
    BIGINT ppm — each per-token-type term rounds ONCE
    (round(ln(n_c)·n_c·1e6)), the per-doc sum is an integer sum
    (order-independent, so Spark's partial aggregation agrees with
    DuckDB's serial fold), and the final combination is an integer
    div. Scale shape: one explode → (doc, token) hash-agg → per-doc
    agg; no joins, no corpus-global state.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    c = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("n_c"))
    d = c.groupBy(id_col).agg(
        F.sum("n_c").alias("n_tokens"),
        F.sum(
            F.expr("CAST(round(ln(n_c) * n_c * 1000000.0) AS BIGINT)")
        ).alias("s_ppm"),
    )
    ent = (
        F.expr("CAST(round(ln(n_tokens) * 1000000.0) AS BIGINT)")
        - F.expr("s_ppm div n_tokens")
    ).alias("entropy_x1e6")
    return (
        d.where(F.col("n_tokens") >= min_tokens)
        .select(id_col, "n_tokens", ent)
        .orderBy(F.asc("entropy_x1e6"), F.asc(id_col))
        .limit(k)
    )


def token_entropy_sql(
    min_tokens: int = 20,
    k: int = 20,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`token_entropy` — identical ppm rounding
    points and integer division."""
    return f"""
    WITH toks AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id, unnest(str_split(lower(text), ' ')) AS tok FROM {table}
      ) WHERE tok <> ''
    ), c AS (
      SELECT doc_id, tok, count(*) AS n_c FROM toks GROUP BY doc_id, tok
    ), d AS (
      SELECT doc_id, CAST(sum(n_c) AS BIGINT) AS n_tokens,
             CAST(sum(CAST(round(ln(n_c) * n_c * 1000000.0) AS BIGINT)) AS BIGINT)
               AS s_ppm
      FROM c GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           CAST(CAST(round(ln(n_tokens) * 1000000.0) AS BIGINT)
                - (s_ppm // n_tokens) AS BIGINT) AS entropy_x1e6
    FROM d WHERE n_tokens >= {min_tokens}
    ORDER BY entropy_x1e6 ASC, doc_id ASC LIMIT {k}
    """


_GOPHER_TOP_THRESH = {2: 0.20, 3: 0.18, 4: 0.16}
_GOPHER_DUP_THRESH = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def gopher_repetition(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The COMPLETE Gopher repetition battery (Rae et al. 2021 §A1.1):
    per document, the fraction of token positions covered by (a) the
    single most frequent n-gram for n in 2..4 and (b) ALL
    within-document duplicated n-grams for n in 5..10, plus the
    published keep gate (top-2/3/4 <= 0.20/0.18/0.16; dup-5..10 <=
    0.15/0.14/0.13/0.12/0.11/0.10). This is the position-COVERAGE form
    of the battery — overlapping occurrences count each position once
    (the paper measures character coverage; tokens are the exact
    analog on whitespace corpora) — complementing repetition_stats'
    cheap count-fraction gate.

    Fractions are exact integer ppm (1e6·covered div n_tokens), so the
    whole battery is value-exact cross-engine. Top-gram tie-break:
    highest count, then lexicographically smallest gram.

    Scale shape: ONE combined explode emits (n, start, gram) rows for
    all nine n in a single corpus pass (struct arrays concatenated
    map-side); per-(doc, n, gram) counts are one hash aggregate; the
    argmax per (doc, n<=4) is a window over the doc's own gram
    vocabulary; coverage expands only on SELECTED grams' occurrences
    and the distinct runs per (doc, n) — everything downstream of the
    one explode is bounded by document length, never corpus-wide.
    """
    # stage the split ONCE behind a projection barrier: the nine
    # zip-of-slices gram chains below reference the token array ~50
    # times, and under interpreted higher-order eval an inlined
    # split() re-runs PER REFERENCE (the repetition_stats lesson);
    # CollapseProject keeps the non-cheap multiply-referenced alias
    pre = df.select(F.col(id_col), tokens(text_col).alias("_tk")).withColumn(
        "_sz", F.size("_tk")
    )
    toks, sz = F.col("_tk"), F.col("_sz")
    arrays = []
    for n in (2, 3, 4, 5, 6, 7, 8, 9, 10):
        slices = [F.slice(toks, k + 1, sz - n + 1) for k in range(n)]
        gram = slices[0]
        for s in slices[1:]:
            gram = F.zip_with(gram, s, lambda a, b: F.concat_ws(" ", a, b))
        arr = F.when(sz >= n, gram).otherwise(F.array().cast("array<string>"))
        arrays.append(
            F.transform(
                arr,
                lambda g, i: F.struct(
                    F.lit(n).alias("n"), i.alias("gpos"), g.alias("g")
                ),
            )
        )
    staged = pre.select(
        F.col(id_col),
        sz.cast("bigint").alias("n_tokens"),
        F.explode_outer(F.concat(*arrays)).alias("o"),
    ).select(
        id_col, "n_tokens", F.col("o.n").alias("n"),
        F.col("o.gpos").alias("gpos"), F.col("o.g").alias("g"),
    )
    occ = staged.where(F.col("g").isNotNull()).localCheckpoint(eager=False)
    cnt = occ.groupBy(id_col, "n", "g").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(id_col, "n").orderBy(F.col("c").desc(), F.col("g").asc())
    # the paper measures the MOST FREQUENT n-gram's coverage regardless
    # of its count (a singleton top gram still covers n/n_tokens), so
    # no c >= 2 gate here — only the dup-gram family (n >= 5) requires
    # actual duplication by definition
    top = (
        cnt.where(F.col("n") <= 4)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, "n", "g")
    )
    dup = cnt.where((F.col("n") >= 5) & (F.col("c") >= 2)).select(id_col, "n", "g")
    sel = top.unionAll(dup)
    cov = (
        occ.join(sel, [id_col, "n", "g"], "left_semi")
        .select(
            F.col(id_col),
            "n",
            F.explode(F.sequence(F.col("gpos"), F.col("gpos") + F.col("n") - 1)).alias(
                "pos"
            ),
        )
        .distinct()
        .groupBy(id_col, "n")
        .agg(F.count(F.lit(1)).alias("covered"))
    )
    base = df.select(
        F.col(id_col), F.size(tokens(text_col)).cast("bigint").alias("n_tokens")
    )
    per_n = base.join(cov, id_col, "left")
    aggs = []
    names = []
    for n in (2, 3, 4, 5, 6, 7, 8, 9, 10):
        kind = "top" if n <= 4 else "dup"
        name = f"rep_{kind}{n}_ppm"
        names.append(name)
        aggs.append(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("n") == n,
                        F.expr("(1000000 * covered) div n_tokens"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias(name)
        )
    out = per_n.groupBy(id_col, "n_tokens").agg(*aggs)
    gate = F.lit(True)
    for n, t in _GOPHER_TOP_THRESH.items():
        gate = gate & (F.col(f"rep_top{n}_ppm") <= int(t * 1_000_000))
    for n, t in _GOPHER_DUP_THRESH.items():
        gate = gate & (F.col(f"rep_dup{n}_ppm") <= int(t * 1_000_000))
    return out.select(
        id_col, "n_tokens", *names, gate.alias("passes_repetition_battery")
    ).orderBy(id_col)


def gopher_repetition_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`gopher_repetition` — per-n CTEs generated
    from the same thresholds."""
    cov_ctes = []
    for n in (2, 3, 4, 5, 6, 7, 8, 9, 10):
        kind = "top" if n <= 4 else "dup"
        sel = (
            f"""sel{n} AS (
      SELECT {id_col}, g FROM (
        SELECT {id_col}, g, c,
               row_number() OVER (PARTITION BY {id_col}
                                  ORDER BY c DESC, g ASC) AS rn
        FROM (SELECT {id_col}, g, count(*) AS c FROM occ{n}
              GROUP BY {id_col}, g)
      ) WHERE rn = 1
    )"""
            if kind == "top"
            else f"""sel{n} AS (
      SELECT {id_col}, g FROM occ{n}
      GROUP BY {id_col}, g HAVING count(*) >= 2
    )"""
        )
        cov_ctes.append(
            f"""occ{n} AS (
      SELECT {id_col}, i, array_to_string(tk[i:i+{n - 1}], ' ') AS g
      FROM t, unnest(range(1, len(tk) - {n} + 2)) u(i)
    ),
    {sel},
    cov{n} AS (
      SELECT {id_col}, count(*) AS covered FROM (
        SELECT DISTINCT {id_col}, pos FROM (
          SELECT o.{id_col}, unnest(range(o.i, o.i + {n})) AS pos
          FROM occ{n} o SEMI JOIN sel{n} s USING ({id_col}, g)
        )
      ) GROUP BY {id_col}
    )"""
        )
    cols = []
    gates = []
    for n in (2, 3, 4, 5, 6, 7, 8, 9, 10):
        kind = "top" if n <= 4 else "dup"
        t = (_GOPHER_TOP_THRESH if n <= 4 else _GOPHER_DUP_THRESH)[n]
        cols.append(
            f"CAST(coalesce((1000000 * c{n}.covered) // b.n_tokens, 0) AS BIGINT)"
            f" AS rep_{kind}{n}_ppm"
        )
        gates.append(
            f"coalesce((1000000 * c{n}.covered) // b.n_tokens, 0)"
            f" <= {int(t * 1_000_000)}"
        )
    joins = "\n    ".join(
        f"LEFT JOIN cov{n} c{n} ON c{n}.{id_col} = b.{id_col}"
        for n in (2, 3, 4, 5, 6, 7, 8, 9, 10)
    )
    ctes_txt = ",\n    ".join(cov_ctes)
    cols_txt = ",\n           ".join(cols)
    gates_txt = " AND ".join(gates)
    return f"""
    WITH t AS (
      SELECT {id_col}, str_split({text_col}, ' ') AS tk FROM {table}
    ),
    {ctes_txt},
    base AS (
      SELECT {id_col}, CAST(len(tk) AS BIGINT) AS n_tokens FROM t
    )
    SELECT b.{id_col}, b.n_tokens,
           {cols_txt},
           ({gates_txt}) AS passes_repetition_battery
    FROM base b
    {joins}
    ORDER BY b.{id_col}
    """
