"""Scalar expression helpers (SURVEY.md §2.8 F1-F12, §2.2 P5-P11).

Parity notes baked in (SURVEY §7 hard parts):
  * Division: Polars float x/0 -> inf/NaN; Spark (ANSI off) -> null.
    Every ratio goes through ``safe_div`` with an explicit default.
  * NaN vs null: NaN is normalized to null at transform boundaries
    (``nan_to_null``); presence flags (``has_flag``) treat NaN as
    missing BEFORE normalization, matching `ticker_row_builder.py:22`.
  * Rounding/downcast happens only at the storage edge
    (``round_downcast``), never mid-computation.
"""

from __future__ import annotations

from typing import Iterable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def safe_div(num: Column | str, den: Column | str, default=0.0) -> Column:
    """F12: num/den with an explicit value when den is 0/null."""
    num, den = _c(num), _c(den)
    return F.when(den.isNotNull() & (den != 0), num / den).otherwise(
        F.lit(default).cast("double")
    )


def epoch_micros(col: Column | str) -> Column:
    """Microseconds since the epoch for a TIMESTAMP_NTZ column,
    timezone-independent (F2 calendar arithmetic).

    ``F.unix_micros`` only accepts TIMESTAMP_LTZ, but the testdata's
    TIMESTAMP(NANOS) parquet reads as TIMESTAMP_NTZ under
    ``nanosAsLong`` — and casting NTZ->LTZ would shift values by the
    session timezone (driver sessions don't pin UTC). ``timestampdiff``
    against an NTZ epoch literal stays in wall-clock space, matching
    DuckDB's ``epoch_us`` on naive timestamps exactly.
    """
    name = col if isinstance(col, str) else None
    if name is None:
        raise TypeError("epoch_micros needs a column name (SQL expr under the hood)")
    quoted = "`" + name.replace("`", "``") + "`"
    return F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {quoted})")


def is_finite(col: Column | str) -> Column:
    """F7: non-null, non-NaN, non-infinite."""
    c = _c(col).cast("double")
    return c.isNotNull() & ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))


def nan_to_null(col: Column | str) -> Column:
    """Normalize the NaN missing-value sentinel to null (F7)."""
    c = _c(col)
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


def has_flag(col: Column | str) -> Column:
    """P8: 1 when the value is present and not NaN, else 0 (int).

    Matches the reference's `int(not isnan(x))` has_* flags
    (`ticker_row_builder.py:20-23`).
    """
    c = _c(col)
    return F.when(c.isNull() | F.isnan(c.cast("double")), F.lit(0)).otherwise(F.lit(1))


def clip_cap(col: Column | str, cap: float, cap_to=None) -> Column:
    """F8: values above ``cap`` become ``cap_to`` (default: the cap)."""
    c = _c(col)
    repl = F.lit(cap if cap_to is None else cap_to)
    return F.when(c > cap, repl).otherwise(c)


def slug(col: Column | str) -> Column:
    """P9: lowercase, non-alnum runs -> '_', trimmed of leading/trailing '_'.

    Mirrors the reference's `_slug` (`static_features.py:6-10`).
    """
    c = F.lower(_c(col))
    return F.regexp_replace(F.regexp_replace(c, r"[^a-z0-9]+", "_"), r"^_+|_+$", "")


def parse_date_flex(col: Column | str, fmt: str = "yyyy-MM-dd") -> Column:
    """F1: strict parse with regex fallback — extract the first
    YYYY-MM-DD-looking token anywhere in the string (the reference's
    regex slow path, `macro_batch_runner.py:11-45`)."""
    c = _c(col)
    strict = F.try_to_timestamp(c, F.lit(fmt)).cast("date")
    loose = F.to_date(F.regexp_extract(c, r"(\d{4})-(\d{2})-(\d{2})", 0), "yyyy-MM-dd")
    return F.coalesce(strict, loose)


def pct_to_prop(col: Column | str) -> Column:
    """F10: percent units -> proportion."""
    return _c(col) / 100.0


def round_downcast(col: Column | str, digits: int = 2) -> Column:
    """F5: round + cast to float — STORAGE EDGE ONLY (keep double in compute)."""
    return F.round(_c(col), digits).cast("float")


def one_hot_exprs(
    col: Column | str,
    vocab: Iterable[str],
    prefix: str,
    include_other: bool = True,
    slugify: bool = True,
) -> list[Column]:
    """P10: fixed-vocabulary one-hot columns + an ``_other`` bucket.

    Reproduces `_encode_one_hot` (`static_features.py:12-25`): one int
    column per vocab value named ``{prefix}_{slug(value)}``, plus
    ``{prefix}_other`` = 1 when the value is non-null but outside the
    vocabulary.
    """
    import re

    c = _c(col)
    vocab = list(vocab)

    def _pyslug(s: str) -> str:
        return re.sub(r"^_+|_+$", "", re.sub(r"[^a-z0-9]+", "_", s.lower()))

    cols = []
    for v in vocab:
        name = f"{prefix}_{_pyslug(v) if slugify else v}"
        cols.append(F.when(c == F.lit(v), 1).otherwise(0).alias(name))
    if include_other:
        other = F.when(c.isNotNull() & ~c.isin(vocab), 1).otherwise(0)
        cols.append(other.alias(f"{prefix}_other"))
    return cols


def map_lookup(col: Column | str, mapping: Mapping[str, str], default=None) -> Column:
    """P11: dict-lookup mapping via an inline literal map (JVM-side).

    For big mappings use a broadcast-join dim table instead; this is
    for small constant tables (sector->ETF etc.).
    """
    c = _c(col)
    pairs = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    looked = F.element_at(F.create_map(*pairs), c)
    return looked if default is None else F.coalesce(looked, F.lit(default))
