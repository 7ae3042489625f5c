"""Registry invariants: the external driver only evaluates the FIRST
50 registered queries, so registration ORDER is evidence. These tests
fail the build if a future query addition silently pushes an operator
ID's only covering query past the cap (the round-2 X18-X21 gap)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from driver_sim import DRIVER_QUERY_CAP  # noqa: E402

from dvmax_spark.registry import PRIORITY, all_queries


def test_every_operator_id_covered_inside_driver_cap():
    qs = all_queries()
    incap = list(qs)[:DRIVER_QUERY_CAP]
    all_ids = {i for spec in qs.values() for i in spec.ids}
    cap_ids = {i for n in incap for i in qs[n].ids}
    missing = sorted(all_ids - cap_ids)
    assert not missing, (
        f"operator IDs with no covering query inside the driver's "
        f"first-{DRIVER_QUERY_CAP} evidence window: {missing} — reorder "
        f"registry.PRIORITY (displace a redundant query) before adding more"
    )


def test_priority_names_are_registered_and_unique():
    qs = all_queries()
    unknown = [n for n in PRIORITY if n not in qs]
    assert not unknown, f"PRIORITY lists unregistered queries: {unknown}"
    assert len(set(PRIORITY)) == len(PRIORITY), "duplicate names in PRIORITY"


def test_in_cap_queries_are_oracled():
    """Inside the evidence window, rows-only queries burn a hard-signal
    slot; only genuinely non-SQL-expressible ops may do that."""
    qs = all_queries()
    # x_cosine_topk_ivf: IVF probe-set is engine-specific by design.
    # a_hll_sketch_rollup: r10 rotation (VERDICT r9 #2 asked for a
    # sketch-family driver row; Spark's Datasketches HLL estimates are
    # engine-native, so rows-only is the honest contract).
    allowed_rows_only = {"x_cosine_topk_ivf", "a_hll_sketch_rollup"}
    offenders = [
        n
        for n in list(qs)[:DRIVER_QUERY_CAP]
        if qs[n].sql is None and n not in allowed_rows_only
    ]
    assert not offenders, f"unexpected rows-only queries in-cap: {offenders}"
