"""BPE trainer/encoder: golden parity vs an exact pure-Python
reference (Sennrich-style learn_bpe semantics), invariants, edges.

Rows-only registered queries (iterative algorithm, SURVEY §2.12) get
their correctness evidence here: the distributed trainer must produce
BIT-IDENTICAL merge lists and token arrays to the sequential
reference on the same corpus.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from dvmax_spark.ext.bpe import (
    bpe_encode,
    bpe_vocab,
    merges_to_df,
    train_bpe,
    word_symbol_dict,
)

EOW = "</w>"


# ---------------------------------------------------------------- reference
def ref_train(texts: list[str], num_merges: int, min_count: int = 2):
    """Sequential reference: identical semantics to ext/bpe.py
    (overlap pair counting, (cnt desc, left asc, right asc) argmax,
    leftmost-greedy merge application)."""
    wc = Counter(w for t in texts for w in t.split(" ") if w)
    dict_ = {w: (list(w) + [EOW], f) for w, f in wc.items()}
    merges = []
    for rank in range(num_merges):
        pc: Counter = Counter()
        for syms, f in dict_.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merged = left + right
        merges.append(
            {"rank": rank, "left": left, "right": right, "merged": merged, "cnt": cnt}
        )
        for w, (syms, f) in dict_.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            dict_[w] = (out, f)
    return merges


def ref_encode(text: str, merges: list[dict]) -> list[str]:
    toks: list[str] = []
    for w in text.split(" "):
        if not w:
            continue
        syms = list(w) + [EOW]
        for m in sorted(merges, key=lambda x: x["rank"]):
            out: list[str] = []
            for s in syms:
                if out and out[-1] == m["left"] and s == m["right"]:
                    out[-1] = m["merged"]
                else:
                    out.append(s)
            syms = out
        toks.extend(syms)
    return toks


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new low",
    "the newest the widest the lowest",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id BIGINT, text STRING"
    )


# ------------------------------------------------------------------ golden
def test_train_matches_reference(docs):
    got = train_bpe(docs, num_merges=12)
    want = ref_train(CORPUS, 12)
    assert got == want
    assert len(got) >= 6  # corpus is rich enough that the test is non-vacuous


def test_train_deterministic_across_runs(docs):
    a = train_bpe(docs.repartition(7), num_merges=8)
    b = train_bpe(docs.repartition(2), num_merges=8)
    assert a == b


def test_encode_matches_reference(docs):
    merges = train_bpe(docs, num_merges=10)
    enc = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    for i, t in enumerate(CORPUS):
        want = ref_encode(t, merges)
        assert enc[i][0] == want, f"doc {i}"
        assert enc[i][1] == len(want)


# --------------------------------------------------------------- invariants
def test_zero_merges_is_chars_plus_eow(docs):
    enc = {r["doc_id"]: r["tokens"] for r in bpe_encode(docs, []).collect()}
    for i, t in enumerate(CORPUS):
        want = [c for w in t.split(" ") if w for c in list(w) + [EOW]]
        assert enc[i] == want


def test_token_count_monotone_in_merges(docs):
    merges = train_bpe(docs, num_merges=10)
    prev = None
    for k in (0, 3, 6, 10):
        total = (
            bpe_encode(docs, merges[:k])
            .agg(F.sum("n_tokens").alias("s"))
            .collect()[0]["s"]
        )
        if prev is not None:
            assert total <= prev
        prev = total


def test_tokens_reconstruct_text(docs):
    """Stripping EOW markers and concatenating tokens reproduces the
    original words — encoding is lossless."""
    merges = train_bpe(docs, num_merges=8)
    enc = {r["doc_id"]: r["tokens"] for r in bpe_encode(docs, merges).collect()}
    for i, t in enumerate(CORPUS):
        joined = "".join(enc[i]).replace(EOW, " ").strip()
        assert joined == " ".join(w for w in t.split(" ") if w)


def test_merge_counts_reflect_overlap_counting(docs):
    """First merge count equals the raw weighted adjacent-pair count
    (incl. overlaps) of the initial symbol dict."""
    merges = train_bpe(docs, num_merges=1)
    wc = Counter(w for t in CORPUS for w in t.split(" ") if w)
    pc: Counter = Counter()
    for w, f in wc.items():
        syms = list(w) + [EOW]
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += f
    (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    assert merges[0]["left"] == left and merges[0]["right"] == right
    assert merges[0]["cnt"] == cnt


def test_overlapping_run_merges_leftmost_greedy(spark):
    """'aaaa' with merge (a,a) must become aa aa (+eow), not aaa a."""
    df = spark.createDataFrame([(0, "aaaa aaaa aa")], "doc_id BIGINT, text STRING")
    merges = train_bpe(df, num_merges=1)
    assert (merges[0]["left"], merges[0]["right"]) == ("a", "a")
    enc = bpe_encode(df, merges).collect()[0]["tokens"]
    assert enc == ["aa", "aa", EOW, "aa", "aa", EOW, "aa", EOW]


def test_min_count_stops_early(spark):
    df = spark.createDataFrame([(0, "ab cd")], "doc_id BIGINT, text STRING")
    # every pair occurs once; min_count=2 learns nothing
    assert train_bpe(df, num_merges=5, min_count=2) == []
    # min_count=1 learns deterministically: ties break lexicographically
    merges = train_bpe(df, num_merges=2, min_count=1)
    assert merges == ref_train(["ab cd"], 2, min_count=1)


def test_empty_and_whitespace_docs(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "hi hi hi")], "doc_id BIGINT, text STRING"
    )
    merges = train_bpe(df, num_merges=3)
    assert merges == ref_train(["", "   ", "hi hi hi"], 3)
    enc = {r["doc_id"]: r["tokens"] for r in bpe_encode(df, merges).collect()}
    # empty/whitespace docs contribute no words => absent from encode output
    assert 0 not in enc and 1 not in enc
    assert "".join(enc[2]).replace(EOW, " ").strip() == "hi hi hi"


def test_vocab_matches_reference_and_encode_totals(spark, docs):
    """bpe_vocab must equal the reference's token-frequency table, and
    its total mass must equal the INDEPENDENT encode path's total
    token count (dict aggregation vs join-back cross-check)."""
    merges = train_bpe(docs, num_merges=8)
    got = {r["token"]: r["freq"] for r in bpe_vocab(docs, merges).collect()}
    want: Counter = Counter()
    for t in CORPUS:
        for tok in ref_encode(t, merges):
            want[tok] += 1
    assert got == dict(want)
    total_enc = (
        bpe_encode(docs, merges).agg(F.sum("n_tokens").alias("s")).collect()[0]["s"]
    )
    assert sum(got.values()) == total_enc


def test_merges_to_df_roundtrip(spark, docs):
    merges = train_bpe(docs, num_merges=5)
    df = merges_to_df(spark, merges)
    back = [r.asDict() for r in df.orderBy("rank").collect()]
    assert back == merges


def test_word_dict_no_python_in_plan(docs):
    plan = word_symbol_dict(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_save_load_merges_roundtrip(spark, docs, tmp_path):
    from dvmax_spark.ext.bpe import load_merges, save_merges

    merges = train_bpe(docs, num_merges=6)
    path = str(tmp_path / "bpe_merges")
    save_merges(spark, merges, path)
    loaded = load_merges(spark, path)
    assert loaded == merges
    # encode with the loaded artifact == encode with the in-memory one
    a = {r["doc_id"]: r["tokens"] for r in bpe_encode(docs, loaded).collect()}
    b = {r["doc_id"]: r["tokens"] for r in bpe_encode(docs, merges).collect()}
    assert a == b


# ------------------------------------------------- r8 job-fusion batching
def test_batched_equals_sequential_trainer(docs):
    """batch_k>1 must be bit-identical to the one-merge-per-job loop
    (the fused batch is only applied where provably sequential-
    equivalent; see ext/bpe.py:_batch_prefix)."""
    seq = train_bpe(docs, num_merges=12, batch_k=1)
    for k in (2, 4, 8, 32):
        assert train_bpe(docs, num_merges=12, batch_k=k) == seq


def test_batch_prefix_stops_on_created_pair_tie(spark):
    """Adversarial corpus for the fusion rules: after merge (a,z) the
    CREATED pair (az,n) ties (b,c) at cnt=50 and wins the left-asc
    tie-break ('az' < 'b'). A batcher that accepted any non-
    interacting candidate would emit (b,c) second; the m.merged >
    cand.left guard must stop the batch instead."""
    df = spark.createDataFrame(
        [(i, "azn bc") for i in range(50)], "doc_id BIGINT, text STRING"
    )
    got = train_bpe(df, num_merges=3, batch_k=8)
    want = ref_train(["azn bc"] * 50, 3)
    assert got == want
    assert (got[0]["left"], got[0]["right"]) == ("a", "z")
    assert (got[1]["left"], got[1]["right"]) == ("az", "n")


@pytest.mark.slow  # long-tail tier (tests/conftest.py)
def test_batched_trainer_randomized_tie_stress(spark):
    """Tiny alphabets maximize count ties and merge interactions — the
    regime where an unsound fusion rule diverges from sequential."""
    import random

    rng = random.Random(80808)
    # tiny alphabets tie counts constantly (stressing the blanket
    # fallback guard); wider alphabets separate counts (stressing the
    # level-complete created-partner check)
    for trial, alpha in enumerate(["ab", "abc", "ab", "abc", "abcdefgh", "abcdefgh"]):
        corpus = [
            " ".join(
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 5)))
                for _ in range(rng.randint(1, 6))
            )
            for _ in range(30 if len(alpha) < 4 else 80)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(corpus)], "doc_id BIGINT, text STRING"
        )
        got = train_bpe(df, num_merges=10, batch_k=8, min_count=1)
        want = ref_train(corpus, 10, min_count=1)
        assert got == want, f"trial {trial} diverged: {got} vs {want}"
