"""ExactSubstr-family scale evidence, two decades above the oracle SF:
a 100k-doc synthetic corpus with PLANTED duplicated runs through the
three sub-document surfaces — within-corpus exact_substr_dedup,
cross-corpus exact_substr_clean_vs, and the persisted GramIndex
build+match path — recording wall-times plus exact conservativeness
checks (planted runs removed with exact boundaries, unique background
untouched) for SCALING.md. The dedup_scale.py protocol applied to the
r5 substr family (the r5 VERDICT's ask #8).

Corpus (100,000 docs, whitespace tokens):
  * 5,000 docs sharing one 25-token boilerplate run, each wrapped in
    unique 8-token prefix/suffix  -> exactly the 25-token run removed
  * 500 fully identical 40-token docs -> fully removed (one run)
  * 94,500 unique 20-token docs       -> zero tokens removed

Usage: python tools/substr_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BOILER = 5_000
N_IDENT = 500
N_UNIQUE = 94_500
BOILER = " ".join(f"b{j}" for j in range(25))
IDENT = " ".join(f"i{j}" for j in range(40))


def _corpus(spark):
    rows = []
    for i in range(N_BOILER):
        pre = " ".join(f"p{i}_{j}" for j in range(8))
        suf = " ".join(f"s{i}_{j}" for j in range(8))
        rows.append((i, f"{pre} {BOILER} {suf}"))
    for i in range(N_IDENT):
        rows.append((200_000 + i, IDENT))
    for i in range(N_UNIQUE):
        rows.append((300_000 + i, " ".join(f"u{i}_{j}" for j in range(20))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from pyspark.sql import functions as F

    from dvmax_spark.ext.retrieval import (
        GramIndex,
        exact_substr_clean_vs,
        exact_substr_dedup,
    )
    from dvmax_spark.session import get_spark

    spark = get_spark("substr_scale", shuffle_partitions=16)
    docs = _corpus(spark).repartition(16).localCheckpoint()
    n_docs = docs.count()
    print(f"corpus: {n_docs} docs")

    # ---------------------------------------- within-corpus ExactSubstr
    t0 = time.perf_counter()
    out = exact_substr_dedup(docs, n=8, min_len=20).localCheckpoint()
    agg = out.agg(
        F.sum("n_removed").alias("rm"), F.sum(F.col("n_runs")).alias("runs")
    ).first()
    wall = time.perf_counter() - t0
    boiler = {
        r["doc_id"]: r for r in out.where(F.col("doc_id") < 100_000).collect()
    }
    ident = out.where(
        (F.col("doc_id") >= 200_000) & (F.col("doc_id") < 300_000)
    ).collect()
    uniq_touched = out.where(
        (F.col("doc_id") >= 300_000) & (F.col("n_removed") > 0)
    ).count()
    assert all(
        r["n_removed"] == 25 and r["n_runs"] == 1 and r["max_run_len"] == 25
        for r in boiler.values()
    ), "boilerplate run boundaries not exact"
    assert all(r["n_removed"] == 40 for r in ident), "identical docs not removed"
    assert uniq_touched == 0, f"{uniq_touched} unique docs lost tokens"
    print(
        f"exact_substr_dedup: {wall:.1f} s — removed {agg['rm']} tokens in "
        f"{agg['runs']} runs; boiler=25/doc exact, ident=40/doc, unique untouched"
    )

    # ------------------------------------- cross-corpus vs a reference
    ref = docs.where(F.col("doc_id") < 100_000)  # the boilerplate side
    new = _corpus(spark).where(F.col("doc_id") >= 300_000).limit(10_000).unionAll(
        spark.createDataFrame(
            [(900_000 + i, f"q{i}a q{i}b {BOILER} q{i}c") for i in range(1_000)],
            "doc_id long, text string",
        )
    ).repartition(16).localCheckpoint()
    t0 = time.perf_counter()
    cleaned = exact_substr_clean_vs(new, ref, n=8, min_len=20).localCheckpoint()
    wall2 = time.perf_counter() - t0
    contaminated = cleaned.where(F.col("n_removed") > 0)
    n_cont = contaminated.count()
    bad = contaminated.where(F.col("n_removed") != 25).count()
    assert n_cont == 1_000 and bad == 0, (n_cont, bad)
    print(
        f"exact_substr_clean_vs: {wall2:.1f} s — 1,000 planted contaminated "
        f"docs excised exactly 25 tokens each, 10,000 clean docs untouched"
    )

    # -------------------------------------------- persisted GramIndex
    import tempfile
    import uuid

    path = os.path.join(
        tempfile.gettempdir(), f"substr_scale_{os.getpid()}_{uuid.uuid4().hex[:8]}"
    )
    t0 = time.perf_counter()
    idx = GramIndex(spark, path, n=8)
    idx.build(ref)
    wall3 = time.perf_counter() - t0
    t0 = time.perf_counter()
    cleaned2 = idx.clean_new(new, min_len=20).localCheckpoint()
    wall4 = time.perf_counter() - t0
    same = (
        cleaned.select("doc_id", "n_removed")
        .join(
            cleaned2.select("doc_id", F.col("n_removed").alias("n2")), "doc_id"
        )
        .where(F.col("n_removed") != F.col("n2"))
        .count()
    )
    assert same == 0, "GramIndex path disagrees with direct clean_vs"
    print(
        f"GramIndex: build {wall3:.1f} s (5k-doc ref), clean-vs-index "
        f"{wall4:.1f} s (11k new docs) — identical to direct clean_vs"
    )
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
