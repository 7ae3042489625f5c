"""Every registered query must EXECUTE at sf0.1 — ten times the
correctness SF. Catches data-dependent landmines the sf0.01 oracle
pass can't see (e.g. ANSI DIVIDE_BY_ZERO on value=0 rows that only
exist at larger scale, degenerate LSH buckets, skew blowups). Caught
a real one: a7_cumprod crashed on value/lag(value) at sf0.1."""

from __future__ import annotations

SF_01 = "/root/testdata/sf0.1"


def test_all_queries_execute_at_sf01(spark):
    from dvmax_spark.registry import all_queries

    failures = []
    for name, spec in all_queries().items():
        # one retry: deep into a full-suite session (10k+ stages) a
        # transient JVM/py4j hiccup can fail a query that is fine in
        # isolation (observed once on an MLlib fit). A REAL landmine
        # (ANSI error, degenerate plan) fails deterministically twice.
        for attempt in (1, 2):
            try:
                spec.fn(spark, SF_01).write.format("noop").mode("overwrite").save()
                break
            except Exception as e:  # noqa: BLE001
                if attempt == 1:
                    # deep-session flakes (MLlib fit/transform after
                    # ~450 tests of accumulated JVM state) respond to
                    # pressure relief; a REAL landmine still fails the
                    # clean retry
                    try:
                        spark.catalog.clearCache()
                        spark.sparkContext._jvm.System.gc()
                    except Exception:  # noqa: BLE001
                        pass
                if attempt == 2:
                    # py4j buries the real cause lines deep — keep the
                    # first java exception line too, not just the
                    # opaque "An error occurred calling oNNN.save."
                    lines = str(e).splitlines()
                    detail = next(
                        (
                            ln.strip()
                            for ln in lines[1:]
                            if ("Exception" in ln or "Error" in ln)
                        ),
                        "",
                    )
                    failures.append((name, (lines[0] + " | " + detail)[:300]))
    assert not failures, failures
