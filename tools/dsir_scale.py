"""DSIR scale evidence, two decades above the oracle SF: a 100k-doc
synthetic bilingual corpus through fit + score + select, recording
wall-times and the model/selection invariants for SCALING.md.

Corpus (100,000 docs, ~20 tokens each ≈ 2M grams):
  * 30% target-language docs drawn from a "target" vocabulary
  * 70% raw docs from a disjoint background vocabulary, with a 10%
    vocabulary bleed so the distributions overlap (non-degenerate
    log-ratios)

Checks: model is exactly 256 rows regardless of corpus size (the
fixed-feature-space property DSIR's scalability rests on), selection
is exactly floor(N/4), and the selected set is overwhelmingly
target-like (direction check at scale).

Usage: python tools/dsir_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 100_000
TARGET_FRAC = 0.3


def _corpus(spark):
    rows = []
    for i in range(N_DOCS):
        is_t = (i % 10) < 3  # 30% target
        base = "t" if is_t else "b"
        # 10% bleed: every 10th word comes from the other vocabulary
        words = [
            f"{'b' if (is_t and j % 10 == 0) else base}{(i * 7 + j * 13) % 500}"
            for j in range(20)
        ]
        rows.append((i, " ".join(words), "en" if is_t else "xx"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    from pyspark.sql import functions as F

    from dvmax_spark.ext.dsir import dsir_bucket_counts, dsir_select
    from dvmax_spark.session import get_spark

    spark = get_spark("dsir_scale", shuffle_partitions=16)
    docs = _corpus(spark).repartition(16).cache()
    n = docs.count()
    print(f"corpus: {n} docs")

    t0 = time.time()
    model = dsir_bucket_counts(docs, target=F.col("lang") == "en").collect()
    t_fit = time.time() - t0
    print(f"fit: {t_fit:.2f} s, model rows: {len(model)} (must be <= 256)")

    t0 = time.time()
    sel = dsir_select(docs, target=F.col("lang") == "en", pct=25, group_col="lang")
    rows = sel.collect()
    t_sel = time.time() - t0
    n_sel = sum(r["n_selected"] for r in rows)
    by_lang = {r["lang"]: (r["n_docs"], r["n_selected"]) for r in rows}
    print(f"fit+score+select: {t_sel:.2f} s, selected {n_sel} (= {n * 25 // 100}?)")
    print(f"per-lang (n_docs, n_selected): {by_lang}")
    assert n_sel == n * 25 // 100
    # direction: the 25% selection should be dominated by target docs
    assert by_lang["en"][1] > 0.9 * n_sel, by_lang


if __name__ == "__main__":
    main()
