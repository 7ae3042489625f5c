"""Distributed BPE tokenizer training + encoding.

Implements the byte-pair-encoding subword algorithm of Sennrich et al.
2016 ("Neural Machine Translation of Rare Words with Subword Units")
as an iterative Spark job over the word-frequency dictionary — the
natural extension of the single-iteration ``bpe_pair_counts`` op
(ext/textstats.py:303) to a full tokenizer-training loop, something a
training-data pipeline needs end-to-end (train merges -> encode corpus
-> token-budget planning / sequence packing on REAL token counts).

Scale shape (the Heaps-law trick, applied twice):

* **Training never touches the corpus after pass 1.** The only
  corpus-proportional work is the word-frequency aggregate (one
  explode + partial hash-agg). Every merge iteration then runs over
  the word DICT (Heaps-law sublinear in corpus size: ~10^8 rows for a
  100 TB corpus — a small table by Spark standards), so 10k merges
  over trillions of tokens stay feasible.
* **Encoding segments DISTINCT words only**, then maps the corpus
  through the (word -> tokens) dict with one equi-join. The fold that
  applies merges runs dict-many times, not corpus-many times.
* **The merge decision is inherently sequential** (each iteration's
  argmax depends on the previous merge), so one 1-row collect per
  iteration is the irreducible driver traffic — the same structure
  every published distributed BPE trainer has. Everything else stays
  on executors as Catalyst expressions: the leftmost-greedy merge is
  a lazy ``CASE``-guarded ``aggregate()`` fold over the symbol array
  (no Python, no UDFs), and the dict is ``localCheckpoint``-ed each
  iteration so expression depth and lineage stay O(1) across
  thousands of merges.

Determinism: ties in the pair argmax break on (count desc, left asc,
right asc); given the same corpus the merge list is bit-identical
across runs and cluster layouts (counts are exact integers).

Reference behavior anchor: the reference repo ships token-counting
only (`tokens.py: count_tokens`, whitespace+punct heuristic); this
module goes past it per the brief's training-data-pipeline mandate.

Known caveats (standard for character-level BPE, documented rather
than hidden):

* **BMP-only character splitting.** Java's ``split("")`` yields UTF-16
  code units, so astral-plane characters (emoji, rare CJK) split into
  surrogate halves where a code-point tokenizer would keep one symbol.
  The testdata is BMP-only (same caveat as ext/textstats.py's
  ``bpe_pair_counts_sql``); a production deployment over astral text
  would switch the initial split to grapheme clusters.
* **Marker collision.** A merge chain can in principle assemble the
  literal ``</w>`` string from mid-word ``< / w >`` characters, making
  it indistinguishable from the end-of-word marker — the classic
  Sennrich-representation caveat; pick a marker outside the corpus
  alphabet if that matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "train_bpe",
    "bpe_encode",
    "bpe_vocab",
    "merges_to_df",
    "word_symbol_dict",
]


def word_symbol_dict(
    df: DataFrame, text_col: str = "text", eow: str = "</w>"
) -> DataFrame:
    """Pass 1: corpus -> word-frequency dict with initial symbol arrays.

    One explode + one partial hash-aggregate — the ONLY
    corpus-proportional stage in BPE training. Each word becomes its
    per-character symbol array with the end-of-word marker appended as
    a distinct final symbol (Sennrich's ``</w>``), so word-final
    merges are learned separately from word-internal ones.
    """
    words = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).where(F.col("w") != "")
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    return wc.select(
        "w",
        "f",
        F.concat(F.split(F.col("w"), ""), F.array(F.lit(eow))).alias("symbols"),
    )


def _pair_counts(dict_df: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol dict (overlap
    counting, matching reference BPE trainers). Shuffles only the
    dict-sized pair stream; partial aggregation applies."""
    syms = F.col("symbols")
    n = F.size(syms) - 1
    pairs = F.zip_with(
        F.slice(syms, 1, n),
        F.slice(syms, 2, n),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        dict_df.where(F.size(syms) >= 2)
        .select("f", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("f").alias("cnt"))
    )


def _merge_fold(symbols: Column, left: str, right: str, merged: str) -> Column:
    """Leftmost-greedy application of one merge (left,right)->merged to
    a symbol array, as a pure Catalyst ``aggregate`` fold.

    The fold appends each symbol unless the accumulator's last element
    is ``left`` and the current symbol is ``right``, in which case the
    pair collapses into ``merged``. Because the merged symbol differs
    from ``left`` (concat of two non-empty strings), an element
    produced by this merge can never immediately re-merge — exactly
    the leftmost-greedy, non-overlapping semantics of reference BPE
    (e.g. merge (a,a) turns ``a a a`` into ``aa a``).

    ``CASE`` branches are lazy at runtime, so the array-rebuild slice
    only evaluates on actual merges, and the whole fold is guarded by
    an ``array_contains`` pre-check so untouched words (the vast
    majority each iteration) skip it entirely.
    """
    l, r, m = F.lit(left), F.lit(right), F.lit(merged)

    def step(acc: Column, s: Column) -> Column:
        last = F.try_element_at(acc, F.lit(-1))
        hit = last.isNotNull() & (last == l) & (s == r)
        return F.when(
            hit, F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(m))
        ).otherwise(F.concat(acc, F.array(s)))

    folded = F.aggregate(symbols, F.array().cast("array<string>"), step)
    return F.when(F.array_contains(symbols, left), folded).otherwise(symbols)


def _batch_prefix(top: list, min_count: int, limit: int, fetch_k: int) -> list[dict]:
    """Maximal SEQUENTIALLY-EQUIVALENT prefix of the global pair
    ranking (job-fusion core; see :func:`train_bpe`).

    Soundness skeleton (``top`` is the true global top-``fetch_k`` by
    (cnt desc, left asc, right asc); iteration STOPS at the first
    violator rather than skipping it — every argument below leans on
    "a higher-ranked conflicting pair would have stopped us first"):

    * (a) symbol disjointness vs every accepted merge's
      ``{left, right, merged}``: applying the accepted batch then
      neither changes the candidate's count (adjacency of untouched
      symbols is invariant) nor lets it consume/feed merge sites.
    * A pair CREATED by the accepted merges can beat the candidate at
      its sequential turn only by count >= cand.cnt. Every created
      occurrence sits at a destroyed original boundary, so its
      original TWIN pair (e.g. (m.right, next) for (m.merged, next))
      has cnt_orig >= the created count and CONFLICTS with an accepted
      merge. A twin with cnt > cand.cnt sorts strictly before the
      candidate, is therefore inside the visible top-k, and already
      stopped the batch. So only count-TIES remain:
      - if the stream is COMPLETE at the candidate's count level
        (last visible row's cnt below it, or fewer than ``fetch_k``
        rows returned), every possible tying twin is visible: for
        each visible pair v with v.cnt == cand.cnt, construct its
        created partners ((m.merged, v.right) when v.left == m.right;
        (v.left, m.merged) when v.right == m.left — compound sites
        reduce to these with a lexicographically smaller-or-equal
        right, so the check is conservative) and reject the candidate
        if any partner would win the tie-break against it;
      - otherwise fall back to the blanket guard
        ``m.merged > cand.left`` for every accepted m (at equal
        counts every created pair then loses the left-asc tie-break;
        left-form partners with prev < cand.left are impossible —
        their twin (prev, m.left) would precede the candidate and
        stop the batch).

    The stop-not-skip rule plus these guards make the fused batch
    bit-identical to the one-merge-per-job sequential trainer
    (constructed counterexamples + randomized stress in
    tests/test_bpe.py).
    """
    accepted: list[dict] = []
    for row in top:
        if len(accepted) >= limit or row["cnt"] < min_count:
            break
        cand = {
            "left": row["left"],
            "right": row["right"],
            "merged": row["left"] + row["right"],
            "cnt": int(row["cnt"]),
        }
        if any(
            {cand["left"], cand["right"]} & {m["left"], m["right"], m["merged"]}
            for m in accepted
        ):
            break
        if accepted:
            level_complete = len(top) < fetch_k or top[-1]["cnt"] < cand["cnt"]
            if level_complete:
                ck = (cand["left"], cand["right"])
                unsafe = False
                for v in top:
                    if v["cnt"] != cand["cnt"]:
                        continue
                    for m in accepted:
                        if v["left"] == m["right"] and (m["merged"], v["right"]) < ck:
                            unsafe = True
                        if v["right"] == m["left"] and (v["left"], m["merged"]) < ck:
                            unsafe = True
            else:
                unsafe = not all(m["merged"] > cand["left"] for m in accepted)
            if unsafe:
                break
        accepted.append(cand)
    return accepted


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 16,
    min_count: int = 2,
    eow: str = "</w>",
    checkpoint_mode: str = "local",
    batch_k: int = 8,
) -> list[dict]:
    """Learn ``num_merges`` BPE merges from a corpus.

    Returns the ordered merge list
    ``[{"rank", "left", "right", "merged", "cnt"}, ...]`` (stops early
    when no pair reaches ``min_count``). The list is small by
    construction (one row per merge) — it is the tokenizer artifact a
    user persists and feeds to :func:`bpe_encode`.

    **Job fusion (r8):** each round collects the top ``batch_k`` pairs
    in one TakeOrdered job and applies the maximal prefix that is
    PROVABLY sequentially-equivalent (:func:`_batch_prefix`) in one
    fold chain + one lineage cut — cutting per-merge Spark jobs from 2
    to 2/|batch|. The equivalence conditions are exact, so the merge
    list stays bit-identical to the k=1 trainer (golden-pinned in
    tests/test_bpe.py); ``batch_k=1`` recovers the old loop verbatim.
    Measured at sf0.1: 12 merges in 7 rounds, same-session A/B 1.5x
    (SCALING.md r8) — and on a cluster the fused rounds are whole job
    launches saved, not just local wall.

    Each round: dict-sized pair count -> top-k collect -> Catalyst
    folds applying the batch -> LAZY lineage cut (truncates lineage
    and codegen expression depth O(1) immediately; the dict is
    Heaps-law small and, in ``checkpoint_mode='local'``, materializes
    inside the next round's collect job, so each round is ONE job —
    r10); ``checkpoint_mode='reliable'`` puts the per-round cut on
    shared storage so an executor loss resumes instead of failing the
    train (operators/lineage.py) — there the one-job claim does NOT
    hold: RDD.checkpoint on an unpersisted RDD launches a separate
    checkpoint-write job after the next action, recomputing the
    round's fold chain, so reliable mode stays ~2 jobs/round (the lazy
    cut saves only the old eager count job).
    """
    from dvmax_spark.operators.lineage import cut_lineage

    # Cuts are LAZY (r10): a lazy cut truncates lineage/codegen depth
    # exactly like an eager one, but in local mode the materialization
    # folds into the NEXT round's top-k collect job instead of being
    # its own job — one job per round instead of two — and the FINAL
    # round's fold chain (whose dict no consumer ever reads: train_bpe
    # returns the merge list) is never executed at all. In reliable
    # mode the lazy cut saves only the eager count job (RDD.checkpoint
    # still writes in its own post-action job; see docstring).
    dict_df = cut_lineage(
        word_symbol_dict(df, text_col, eow), mode=checkpoint_mode, eager=False
    )
    merges: list[dict] = []
    while len(merges) < num_merges:
        top = (
            _pair_counts(dict_df)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(max(1, batch_k))
            .collect()
        )
        # training ends only when the CURRENT argmax is below
        # min_count — later candidates below it merely end the batch
        # (merges applied this round may create new pairs above it)
        if not top or top[0]["cnt"] < min_count:
            break
        batch = _batch_prefix(
            top, min_count, num_merges - len(merges), max(1, batch_k)
        )
        for m in batch:
            m["rank"] = len(merges)
            merges.append(m)
            # one withColumn PER merge, not one chained expression: the
            # fold's array_contains guard references its input 3x, so
            # chaining inside a single expression grows 3^|batch| — the
            # project barrier keeps each fold's input a plain attribute
            # (CollapseProject leaves non-cheap multi-ref aliases alone)
            dict_df = dict_df.withColumn(
                "symbols", _merge_fold(F.col("symbols"), m["left"], m["right"], m["merged"])
            )
        dict_df = cut_lineage(dict_df, mode=checkpoint_mode, eager=False)
    return merges


def merges_to_df(spark: SparkSession, merges: list[dict]) -> DataFrame:
    """Materialize a learned merge list as a DataFrame
    (rank, left, right, merged, cnt) — the persistable tokenizer
    artifact."""
    schema = "rank INT, left STRING, right STRING, merged STRING, cnt BIGINT"
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["cnt"]) for m in merges],
        schema=schema,
    )


def _apply_merges(
    dict_df: DataFrame, merges: list[dict], checkpoint_every: int
) -> DataFrame:
    """Apply a learned merge list in rank order to a (w, symbols, ...)
    dict, eagerly checkpointing every ``checkpoint_every`` merges so
    codegen expression depth and lineage stay bounded regardless of
    merge-list length."""
    for i, m in enumerate(sorted(merges, key=lambda x: x["rank"])):
        dict_df = dict_df.withColumn(
            "symbols", _merge_fold(F.col("symbols"), m["left"], m["right"], m["merged"])
        )
        if (i + 1) % checkpoint_every == 0:
            dict_df = dict_df.localCheckpoint(eager=True)
    return dict_df


def bpe_vocab(
    df: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    eow: str = "</w>",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Final subword vocabulary after a merge list: (token, freq).

    The third tokenizer artifact (merges -> segmented dict -> vocab):
    re-derives the word dict, applies the merges (dict-sized work),
    and sums word frequencies per surviving symbol. Deterministic
    given the merge list; golden-tested against the sequential
    reference in tests/test_bpe.py.
    """
    dict_df = _apply_merges(word_symbol_dict(df, text_col, eow), merges, checkpoint_every)
    return (
        dict_df.select("f", F.explode("symbols").alias("token"))
        .groupBy("token")
        .agg(F.sum("f").alias("freq"))
    )


def bpe_encode(
    df: DataFrame,
    merges: list[dict],
    id_col: str = "doc_id",
    text_col: str = "text",
    eow: str = "</w>",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Encode a corpus with a learned merge list: (id, tokens, n_tokens).

    Scale shape: segmentation runs over DISTINCT words only (the
    Heaps-law dict), applying each merge in rank order with the same
    lazy Catalyst fold used in training; every ``checkpoint_every``
    merges the dict is eagerly checkpointed so expression depth stays
    bounded no matter how long the merge list is. The corpus then maps
    word -> tokens with ONE equi-join on the word (AQE broadcasts the
    dict when it is small; at 10^8-word scale it is a plain shuffle
    join on an already-aggregated table) and per-doc token arrays are
    rebuilt with an order-preserving ``array_sort`` on (position,
    token-index) — no Python anywhere.

    Tokens keep the ``eow`` marker on word-final symbols, matching the
    training representation; downstream token counts are therefore
    consistent with what the trained vocabulary would produce.
    """
    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    ).where(F.col("w") != "")

    dict_df = _apply_merges(
        words.select("w")
        .distinct()
        .select(
            "w",
            F.concat(F.split(F.col("w"), ""), F.array(F.lit(eow))).alias("symbols"),
        ),
        merges,
        checkpoint_every,
    )

    per_word = words.join(dict_df, "w")
    return (
        per_word.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", F.col("symbols").alias("toks")))
            ).alias("ordered")
        )
        .select(
            id_col,
            F.flatten(F.col("ordered.toks")).alias("tokens"),
        )
        .withColumn("n_tokens", F.size("tokens"))
    )


def save_merges(spark: SparkSession, merges: list[dict], path: str) -> None:
    """Persist a learned merge list as a parquet artifact (the
    tokenizer file a 100 TB pipeline trains once and ships to every
    encode job). Single small file; overwrite is atomic enough at
    this granularity because readers list the directory at load time
    (same contract as the sketch tables — a torn read sees the old or
    the new artifact, never a mix, since ranks are self-describing)."""
    merges_to_df(spark, merges).repartition(1).write.mode("overwrite").parquet(path)


def load_merges(spark: SparkSession, path: str) -> list[dict]:
    """Load a persisted merge list, rank-ordered, ready for
    :func:`bpe_encode` / :func:`bpe_vocab`."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [
        {
            "rank": r["rank"],
            "left": r["left"],
            "right": r["right"],
            "merged": r["merged"],
            "cnt": r["cnt"],
        }
        for r in rows
    ]
