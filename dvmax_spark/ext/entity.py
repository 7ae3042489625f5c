"""Entity resolution: fuzzy equi-joins without the n² cross product.

A raw ``levenshtein(a, b) <= k`` join predicate is a nested-loop
cross product — O(|L|·|R|) edit-distance evaluations, dead at scale.
The standard fix for k=1 (SymSpell / symmetric-delete spelling
correction, Garbe 2012) turns it into an EQUI-join: every string's
candidate block key set is {itself} ∪ {all single-character
deletions}. Two strings within edit distance 1 provably share a key
(equal → self; substitution at i → both i-deletions collide;
insertion → the shorter string IS a deletion of the longer), so the
blocked join has PERFECT recall and the exact distance check runs
only on candidates — O(Σ len) block rows instead of n² pairs, the
same explode → equi-join → verify shape as MinHash banding and the
aHash hamming bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_variants(col: str) -> F.Column:
    """{s} ∪ {s with one char deleted} as an array<string>."""
    return F.expr(
        f"array_union(array({col}), transform(sequence(1, length({col})),"
        f" i -> concat(substring({col}, 1, i-1),"
        f" substring({col}, i+1, length({col})))))"
    )


def edit1_pairs(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    max_bucket: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) whose ``text_col`` values are within
    edit distance 1, via deletion-neighborhood blocking + exact
    levenshtein verification on candidates only.

    ``max_bucket`` caps the within-variant quadratic blowup on
    degenerate keys (identical-prefix corpora — same knob and same
    conservative semantics as the text LSH's cap_buckets: dropping a
    hot block can only MISS pairs, never invent them). The oracled
    query runs uncapped."""
    from dvmax_spark.ext.dedup import cap_buckets

    blocked = df.select(
        F.col(id_col), F.col(text_col), F.explode(_deletion_variants(text_col)).alias("v")
    )
    blocked = cap_buckets(blocked, ["v"], max_bucket)
    a = blocked.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("name_a"), "v"
    )
    b = blocked.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("name_b"), "v"
    )
    return (
        a.join(b, "v")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
        .where(F.levenshtein("name_a", "name_b") <= 1)
        .select(
            "id_a",
            "id_b",
            F.levenshtein("name_a", "name_b").cast("bigint").alias("dist"),
        )
    )
