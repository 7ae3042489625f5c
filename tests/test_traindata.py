"""Semantic invariants of the training-data pipeline ops (X18-X21) on
adversarial synthetic corpora — guarantees the oracle hash can't state:
decontamination actually removes every overlapping doc, splits
partition exactly, packing assigns every doc exactly once and respects
context boundaries, sampling is deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from dvmax_spark.ext.traindata import (
    contaminated_ids,
    decontaminate,
    hash_bucket,
    pack_sequences,
    train_split,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_decontaminate_removes_all_overlap(spark):
    """Every kept doc must share ZERO n-grams with the eval set —
    including docs whose overlap is a substring in the middle."""
    ev = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    train = _docs(
        spark,
        [
            (1, "clean text with completely different words entirely"),
            (2, "prefix quick brown fox jumps over suffix tokens here"),  # embedded 5-gram
            (3, "another totally unrelated document body for padding"),
            (4, "the quick brown fox jumps"),  # exact 5-gram, no more
        ],
    )
    kept = {r["doc_id"] for r in decontaminate(train, ev, n=5).collect()}
    assert kept == {1, 3}
    bad = {r["doc_id"] for r in contaminated_ids(train, ev, n=5).collect()}
    assert bad == {2, 4}


def test_decontaminate_short_docs_never_match(spark):
    """Docs shorter than the n-gram width produce no grams, hence can
    never be flagged (and an eval set of short docs flags nothing)."""
    ev = _docs(spark, [(100, "four words only here")])
    train = _docs(spark, [(1, "four words only here")])  # 4 toks < n=5
    assert contaminated_ids(train, ev, n=5).count() == 0


def test_train_split_is_exact_partition(spark):
    """split() assigns every row exactly one label, deterministically
    (same ids -> same splits on a re-run / other cluster size)."""
    df = _docs(spark, [(i, "x") for i in range(500)])
    a = {r["doc_id"]: r["split"] for r in train_split(df).collect()}
    b = {r["doc_id"]: r["split"] for r in train_split(df).collect()}
    assert a == b
    assert set(a) == set(range(500))
    assert set(a.values()) == {"train", "val", "test"}
    n_train = sum(1 for v in a.values() if v == "train")
    assert 0.8 * 500 < n_train < 0.97 * 500  # hash balance sanity


def test_pack_sequences_covers_all_docs_exactly_once(spark):
    """Sum of per-sequence doc/token counts equals the corpus totals —
    nothing dropped, nothing double-packed; and every sequence's
    START offset respects the ctx boundary (seq_id * ctx <= cumsum)."""
    rows = [(i, " ".join(["tok"] * (5 + i % 37))) for i in range(300)]
    df = _docs(spark, rows)
    packed = pack_sequences(df, ctx_len=64, n_buckets=4).collect()
    assert sum(r["n_docs"] for r in packed) == 300
    assert sum(r["seq_tokens"] for r in packed) == sum(5 + i % 37 for i in range(300))
    for r in packed:
        assert r["seq_id"] >= 0
        assert r["n_docs"] >= 1
    # per-bucket seq ids are dense enough to be windows, not garbage
    by_bucket = {}
    for r in packed:
        by_bucket.setdefault(r["bucket"], []).append(r["seq_id"])
    for seqs in by_bucket.values():
        assert seqs == sorted(seqs)


def test_hash_bucket_portable_and_stable(spark):
    """hash_bucket must be a pure function of the VALUE (not partition,
    not row order): repartitioned input produces identical buckets."""
    df = _docs(spark, [(i, "x") for i in range(200)])
    a = {r["doc_id"]: r["b"] for r in df.select("doc_id", hash_bucket("doc_id", 16).alias("b")).collect()}
    b = {
        r["doc_id"]: r["b"]
        for r in df.repartition(7)
        .select("doc_id", hash_bucket("doc_id", 16).alias("b"))
        .collect()
    }
    assert a == b
    assert all(0 <= v < 16 for v in a.values())


def test_mixture_rebalance_exact_and_approximate(spark):
    """Exact path: every stratum's kept count equals the smallest
    stratum's size exactly. Approximate (map-side) path: within
    binomial noise of the quota, deterministic across calls."""
    from dvmax_spark.ext.traindata import mixture_rebalance

    rows = (
        [(i, "big") for i in range(900)]
        + [(1000 + i, "mid") for i in range(400)]
        + [(2000 + i, "small") for i in range(150)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, source string")

    exact = {r["source"]: r for r in mixture_rebalance(df).collect()}
    assert exact["big"]["n_total"] == 900 and exact["big"]["n_kept"] == 150
    assert exact["mid"]["n_kept"] == 150
    assert exact["small"]["n_kept"] == 150

    approx = {r["source"]: r for r in mixture_rebalance(df, approximate=True).collect()}
    for s, quota in (("big", 150), ("mid", 150), ("small", 150)):
        # binomial(n, quota/n): 4 sigma ~ 4*sqrt(150) ~ 49
        assert abs(approx[s]["n_kept"] - quota) <= 50, (s, approx[s])
    approx2 = {r["source"]: r for r in mixture_rebalance(df, approximate=True).collect()}
    assert approx == approx2  # deterministic, no rand()


def test_write_training_shards_deterministic_and_complete(spark, tmp_path):
    """Shard writer invariants: every doc appears in exactly one window,
    window token sums cover the corpus, the manifest matches the data,
    and a re-run produces identical shard contents (deterministic)."""
    import json

    from dvmax_spark.ext.traindata import write_training_shards

    rows = [(i, " ".join(f"w{i}_{j}" for j in range(1 + i % 30))) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    out1 = str(tmp_path / "s1")
    m1 = write_training_shards(df, out1, ctx_len=64, seqs_per_shard=32)
    shards = spark.read.parquet(out1 + "/shards")

    assert m1["n_docs"] == 500
    assert m1["n_windows"] == shards.count()
    got_docs = sorted(
        d for r in shards.select("doc_ids").collect() for d in r["doc_ids"]
    )
    assert got_docs == sorted(r[0] for r in rows)  # exactly-once cover
    from pyspark.sql import functions as F

    assert (
        shards.agg(F.sum("seq_tokens")).first()[0] == m1["n_tokens"]
    )
    assert json.load(open(out1 + "/manifest.json")) == m1

    out2 = str(tmp_path / "s2")
    m2 = write_training_shards(df, out2, ctx_len=64, seqs_per_shard=32)
    assert m2 == m1
    a = sorted(map(tuple, spark.read.parquet(out1 + "/shards").collect()))
    b = sorted(map(tuple, spark.read.parquet(out2 + "/shards").collect()))
    assert [r[:2] + (list(r[2]),) + r[3:] for r in a] == [
        r[:2] + (list(r[2]),) + r[3:] for r in b
    ]


def test_source_quota_caps_and_bands(spark):
    """Each source keeps at most `quota` docs; kept-quality bands are
    drawn from that source's own docs; a source smaller than the quota
    keeps everything."""
    from dvmax_spark.ext.traindata import source_quota

    rows = [(i, "big", "the a of and in " * (i + 1)) for i in range(8)]
    rows += [(100 + i, "small", "tiny doc text") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in source_quota(df, quota=5).collect()}
    assert out["big"]["n_docs"] == 8 and out["big"]["n_kept"] == 5
    assert out["small"]["n_docs"] == 2 and out["small"]["n_kept"] == 2
    assert out["big"]["min_kept_q"] <= out["big"]["max_kept_q"]


def test_token_budget_plan_exact_allocation(spark):
    """Allocations are exact bigint shares of the budget; a source that
    can't fill its share reports the shortfall and a 1.0 (1e6 ppm)
    sampling rate; totals never exceed budget."""
    from dvmax_spark.ext.traindata import token_budget_plan

    rows = [(1, "src0", "w " * 99 + "w"), (2, "srcX", "w w w w")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    plan = {r["source"]: r for r in token_budget_plan(df, budget=300).collect()}
    # weights: src0=2, srcX=1, total 3 -> needed 200 / 100
    assert plan["src0"]["needed_tokens"] == 200
    assert plan["srcX"]["needed_tokens"] == 100
    # src0 has 100 tokens available -> planned 100, shortfall 100, rate 1.0
    assert plan["src0"]["planned_tokens"] == 100
    assert plan["src0"]["shortfall"] == 100
    assert plan["src0"]["sample_rate_ppm"] == 1_000_000
    # srcX has only 4 tokens -> its whole supply is planned (rate 1.0)
    assert plan["srcX"]["planned_tokens"] == 4
    assert plan["srcX"]["sample_rate_ppm"] == 1_000_000
    total_planned = sum(r["planned_tokens"] for r in plan.values())
    assert total_planned <= 300


def test_bpe_pair_counts_matches_python_reference(spark):
    """bpe_pair_counts vs a direct Counter implementation of the BPE
    pair-count step, on a corpus with repeated words, 1-char words,
    multi-space runs and within-word repeated pairs ('aaa' -> 'a a'
    twice)."""
    from collections import Counter

    from dvmax_spark.ext.textstats import bpe_pair_counts

    texts = [
        "aaa ab  b aaa",
        " x aaa banana",
        "banana banana b",
        "",
        "ab",
    ]
    ref: Counter = Counter()
    wc: Counter = Counter(w for t in texts for w in t.split(" ") if w != "")
    for w, f in wc.items():
        for i in range(len(w) - 1):
            ref[f"{w[i]} {w[i+1]}"] += f
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["pair"]: r["cnt"] for r in bpe_pair_counts(df, top_k=100).collect()}
    assert got == dict(ref)


def test_contamination_overlap_exact_fractions(spark):
    """Graded contamination: exact ppm fractions, threshold semantics,
    and the no-gram edge (doc shorter than n reports 0 ppm, clean)."""
    from dvmax_spark.ext.traindata import contamination_overlap

    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    tr = spark.createDataFrame(
        [
            # grams (n=5): 2 of 2 distinct grams shared -> 1000000 ppm
            (1, "alpha beta gamma delta epsilon zeta"),
            # 6 tokens -> 2 grams, 1 shared -> 500000 ppm (>= threshold)
            (2, "alpha beta gamma delta epsilon other"),
            # no overlap
            (3, "one two three four five six seven"),
            # shorter than n: zero grams
            (4, "tiny doc here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in contamination_overlap(tr, ev, n=5, threshold_ppm=500_000).collect()
    }
    assert out[1]["overlap_ppm"] == 1_000_000 and out[1]["contaminated"]
    assert out[2]["n_grams"] == 2 and out[2]["n_hit"] == 1
    assert out[2]["overlap_ppm"] == 500_000 and out[2]["contaminated"]
    assert out[3]["n_hit"] == 0 and not out[3]["contaminated"]
    assert out[4]["n_grams"] == 0 and out[4]["overlap_ppm"] == 0
    assert not out[4]["contaminated"]


def test_funnel_attrition_monotone_and_jvm_side(spark):
    """Cumulative gates can only shrink counts, and the whole matrix
    is one JVM-side pass (broadcast semi-join for contamination)."""
    from dvmax_spark.queries_traindata import x_funnel_attrition

    df = x_funnel_attrition(spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for r in df.collect():
        assert r["n_raw"] >= r["n_clean"] >= r["n_len"] >= r["n_decontam"] >= r["n_final"]
        assert r["tok_final"] >= r["n_final"] * 10  # every survivor has >= min_tok tokens


def test_mixture_schedule_interleaves_uniformly(spark):
    """Stride scheduling must spread every source near-evenly across
    the global-order bands (no contiguous source blocks), and the
    rollup must partition the corpus."""
    from dvmax_spark.catalog import load_table
    from dvmax_spark.ext.traindata import mixture_schedule

    docs = load_table(spark, "documents", "/root/testdata/sf0.01")
    out = mixture_schedule(docs, n_bands=5).collect()
    n_total = docs.count()
    assert sum(r["n_docs"] for r in out) == n_total
    per_src = {}
    for r in out:
        per_src.setdefault(r["source"], []).append(r["n_docs"])
    for src, counts in per_src.items():
        assert len(counts) == 5, (src, counts)  # present in EVERY band
        assert max(counts) - min(counts) <= 2, (src, counts)


def test_weighted_sample_properties(spark):
    """Priority sampling: exactly k rows, reproducible across calls,
    and weight-proportionality holds directionally — the heavy stratum
    (100x weight) wins far more slots than uniform would give it."""
    from dvmax_spark.ext.traindata import weighted_sample

    rows = [(i, "t", 1000 if i < 100 else 10) for i in range(1100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    s1 = weighted_sample(docs, k=100).collect()
    s2 = weighted_sample(docs, k=100).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]  # deterministic
    assert len(s1) == 100
    heavy = sum(1 for r in s1 if r["doc_id"] < 100)
    # 100 heavy docs at 100x weight vs 1000 light: expected heavy share
    # ~ 100*1000/(100*1000+1000*10) = 90%; uniform would give ~9%.
    assert heavy > 50


def test_weighted_sample_zero_weight_excluded(spark):
    from dvmax_spark.ext.traindata import weighted_sample

    docs = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 5)], "doc_id long, text string, n_chars long"
    )
    got = [r["doc_id"] for r in weighted_sample(docs, k=10).collect()]
    assert got == [2]


def test_bloom_decontam_recall_one_and_fp_detection(spark):
    """No false negatives at any filter size (n_bloom >= n_exact and
    every exact hit is bloom-flagged); a comically small filter (8
    bits) must produce false positives on disjoint grams, a large one
    (2^20) none on this corpus."""
    from dvmax_spark.ext.traindata import bloom_decontam_stats

    rows = [(0, "alpha beta gamma delta epsilon zeta", "src0")]
    rows += [
        (i, f"alpha beta gamma delta epsilon zeta tail{i}", "src1")
        for i in range(1, 11)
    ]  # truly contaminated (share the 5-gram prefix)
    rows += [
        (i, " ".join(f"w{i}_{j}" for j in range(8)), "src1")
        for i in range(11, 61)
    ]  # disjoint grams
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    big = bloom_decontam_stats(docs, m_bits=2**20).collect()[0]
    assert big["n_exact"] == 10 and big["n_bloom"] == 10 and big["n_false_pos"] == 0

    tiny = bloom_decontam_stats(docs, m_bits=8).collect()[0]
    assert tiny["n_exact"] == 10
    assert tiny["n_bloom"] >= tiny["n_exact"]  # recall 1
    assert tiny["n_false_pos"] == tiny["n_bloom"] - tiny["n_exact"]
    assert tiny["n_false_pos"] > 0  # 8 bits vs ~200 grams must collide


def test_spfhp_strategy_invariants_on_random_histograms():
    """Driver-side SPFHP: every doc of every length class is slotted
    exactly once, no pack exceeds ctx_len, every pack id in
    [0, n_packs) is used, and total padding beats (or ties) the naive
    next-fit-by-arrival baseline."""
    import random

    from dvmax_spark.ext.traindata import _spfhp_strategy

    for seed in (1, 2, 3, 4, 5):
        rng = random.Random(seed)
        ctx = 128
        hist = {}
        for _ in range(rng.randint(3, 40)):
            hist[rng.randint(1, ctx)] = rng.randint(1, 50)
        slots, n_packs = _spfhp_strategy(list(hist.items()), ctx)
        per_len = {}
        load = [0] * n_packs
        ndocs = [0] * n_packs
        for length, rank_base, cnt, pack_base in slots:
            assert per_len.get(length, 0) == rank_base  # ranks contiguous
            per_len[length] = rank_base + cnt
            for p in range(pack_base, pack_base + cnt):
                load[p] += length
                ndocs[p] += 1
        assert per_len == hist, f"seed={seed}"
        assert all(l <= ctx for l in load)
        assert all(n >= 1 for n in ndocs)
        # naive next-fit baseline over an arbitrary arrival order
        arrivals = [ln for ln, c in sorted(hist.items()) for _ in range(c)]
        packs, cur = 1, 0
        for ln in arrivals:
            if cur + ln > ctx:
                packs += 1
                cur = 0
            cur += ln
        assert n_packs <= packs, f"seed={seed}: {n_packs} vs naive {packs}"


def test_pack_spfhp_end_to_end(spark):
    """Distributed application: every doc in exactly one pack, packs
    within capacity, rerun-identical output."""
    import random

    from dvmax_spark.ext.traindata import pack_spfhp

    rng = random.Random(9)
    docs = spark.createDataFrame(
        [(i, " ".join("w" for _ in range(rng.randint(1, 200)))) for i in range(300)],
        "doc_id long, text string",
    )
    out1 = pack_spfhp(docs, ctx_len=128).collect()
    out2 = pack_spfhp(docs, ctx_len=128).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    assert sum(r["n_docs"] for r in out1) == 300
    assert all(r["pack_tokens"] <= 128 and r["padding"] >= 0 for r in out1)
    assert sorted(r["pack_id"] for r in out1) == list(range(len(out1)))


def test_pack_spfhp_null_text_counts_as_one_token(spark):
    from dvmax_spark.ext.traindata import pack_spfhp

    docs = spark.createDataFrame(
        [(1, None), (2, "a b c")], "doc_id long, text string"
    )
    out = pack_spfhp(docs, ctx_len=8).collect()
    assert sum(r["n_docs"] for r in out) == 2
    assert sum(r["pack_tokens"] for r in out) == 4  # 1 (null) + 3


def test_fixture_backed_oracles_fail_loudly_at_wrong_sf():
    """r8 ADVICE: the bpe/spfhp golden fixtures are solved over the
    sf0.01 corpus; run against any other corpus the oracle SQL must
    raise a NAMED error ('pinned to sf0.01'), never a silent value
    mismatch. At sf0.01 the guard is transparent (non-empty result)."""
    import duckdb
    import pytest

    from dvmax_spark.queries_traindata import _bpe_golden_sql, _spfhp_oracle_sql

    for sql in (_bpe_golden_sql(), _spfhp_oracle_sql()):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.1/documents.parquet'"
        )
        with pytest.raises(duckdb.Error, match="pinned to sf0.01"):
            con.execute(sql).fetchall()
        con.execute(
            "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.01/documents.parquet'"
        )
        assert len(con.execute(sql).fetchall()) > 0
        con.close()


def test_sf1_corpus_generator_deterministic_and_schema_compatible(tmp_path, monkeypatch):
    """The second-decade corpus (tools/gen_sf1_corpus.py) must be
    byte-stable for a fixed seed and schema-identical to the driver's
    documents/embeddings tables — otherwise the 0.1->1 scaling table
    isn't comparing like with like."""
    import sys
    from pathlib import Path

    import numpy as np
    import pyarrow.parquet as pq

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import gen_sf1_corpus as g

    monkeypatch.setattr(g, "N_DOCS", 300)
    monkeypatch.setattr(g, "N_EMB", 120)
    vocab = g.real_vocab()
    assert len(vocab) == 31  # constant across the testdata sfs

    t1 = g.gen_documents(np.random.default_rng(g.SEED), vocab)
    t2 = g.gen_documents(np.random.default_rng(g.SEED), vocab)
    assert t1.equals(t2)
    e1 = g.gen_embeddings(np.random.default_rng(g.SEED))
    e2 = g.gen_embeddings(np.random.default_rng(g.SEED))
    assert e1.equals(e2)

    real_docs = pq.read_schema("/root/testdata/sf0.1/documents.parquet")
    real_emb = pq.read_schema("/root/testdata/sf0.1/embeddings.parquet")
    assert [(f.name, str(f.type)) for f in t1.schema] == [
        (f.name, str(f.type)) for f in real_docs
    ]
    assert [(f.name, str(f.type)) for f in e1.schema] == [
        (f.name, str(f.type)) for f in real_emb
    ]
    # n_chars really is len(text), langs/sources in-domain
    rows = t1.to_pylist()
    assert all(r["n_chars"] == len(r["text"]) for r in rows)
    assert {r["lang"] for r in rows} <= set(g.LANGS)
    norms = np.linalg.norm(np.array(e1["embedding"].to_pylist()), axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)


def test_sf1_star_schema_tables_match_driver_schemas(monkeypatch):
    """Every generated sf1 table must be arrow-schema-identical to the
    driver's sf0.1 parquet (including timestamp unit/NTZ-ness) so the
    full-roster 0.1->1 decade compares like with like."""
    import sys
    from pathlib import Path

    import numpy as np
    import pyarrow.parquet as pq

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import gen_sf1_corpus as g

    for attr, val in [
        ("N_CUSTOMER", 50),
        ("N_SUPPLIER", 20),
        ("N_PART", 40),
        ("N_ORDERS", 100),
        ("N_EVENTS", 200),
        ("N_USERS", 30),
    ]:
        monkeypatch.setattr(g, attr, val)
    rng = np.random.default_rng(g.SEED)
    orders, lineitem = g.gen_orders_lineitem(np.random.default_rng(g.SEED))
    built = {
        "customer": g.gen_customer(rng),
        "supplier": g.gen_supplier(rng),
        "part": g.gen_part(rng),
        "orders": orders,
        "lineitem": lineitem,
        "events": g.gen_events(rng),
    }
    for name, tbl in built.items():
        real = pq.read_schema(f"/root/testdata/sf0.1/{name}.parquet")
        got = [(f.name, str(f.type)) for f in tbl.schema]
        want = [(f.name, str(f.type)) for f in real]
        assert got == want, (name, got, want)
    # lineitem keys reference the generated orders, line numbers start at 1
    lk = set(lineitem["l_orderkey"].to_pylist())
    assert lk <= set(orders["o_orderkey"].to_pylist())
    assert min(lineitem["l_linenumber"].to_pylist()) == 1
