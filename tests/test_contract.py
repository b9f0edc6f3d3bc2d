"""The executable golden suite: every contract query vs its DuckDB oracle.

Exactly the check the driver runs at sf0.01 (row count + schema + value
compare, order-insensitive), run here at sf0.001 for speed. Queries with
``oracle=None`` get a rows-only smoke (must build + count without error).
"""

from __future__ import annotations

import pytest

from simple_pos_kafka_pyspark_airflow_spark.plans import load_registry
from simple_pos_kafka_pyspark_airflow_spark.testing import check_query

REGISTRY = load_registry()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_contract_query(spark, sf_dir, name):
    res = check_query(spark, name, sf_dir)
    assert res.ok, str(res)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns == ["c_custkey", "c_name", "lifetime_spend", "membership_level"]
    assert len(rows) > 0


def test_every_query_has_registry_metadata():
    for name, cq in REGISTRY.items():
        assert cq.category
        assert cq.notes, f"{name} missing notes"


STRICT_SAMPLE = [
    "q_tpch_q1",      # ROUND over money sums + avgs
    "q_agg_sum",      # ROUND(SUM) per group
    "q_derive_arith", # FLOOR-cents canonicalization (round-1 driver failure)
    "q_tpch_q8",      # ROUND of a ratio of sums
    "q_text_tfidf",   # ROUND of tf * ln(ratio)
    "q_window_cume",  # rank-count ratios, no rounding at all
    "q_simsearch_batch",  # ROUND of cosine quotients feeding rank selection
    "q_anomaly_zscore",   # ROUND of a z-score quotient feeding the |z| gate
]


@pytest.mark.parametrize("name", STRICT_SAMPLE)
def test_float_queries_bit_identical(spark, sf_dir, name):
    """The driver's gate is a value HASH — floats must match bit-for-bit,
    not within tolerance. Pin the float-heaviest query families to the
    strict compare so a tolerance-masked drift can't reach the driver
    (round 1's q_derive_arith failed exactly this way)."""
    res = check_query(spark, name, sf_dir, strict=True)
    assert res.ok, str(res)


def test_survey_inventory_matches_registry():
    """SURVEY.md §2 is the judge-facing operator inventory — every query
    named there must exist in the registry and every registered query must
    be documented there. Drift in either direction is a contract bug."""
    import re

    doc = set(re.findall(r"\bq_[a-z0-9_]+\b", open("SURVEY.md").read()))
    reg = set(REGISTRY)
    assert doc - reg == set(), f"SURVEY names unknown queries: {sorted(doc - reg)}"
    assert reg - doc == set(), f"undocumented queries: {sorted(reg - doc)}"


def test_driver_ordering_is_a_permutation():
    """The driver-facing ordering must contain exactly the registry —
    a grouping bug that drops or duplicates a query would silently
    shrink the verification surface."""
    from simple_pos_kafka_pyspark_airflow_spark.plans.contract import driver_ordered_registry

    ordered = driver_ordered_registry()
    assert list(sorted(ordered)) == sorted(REGISTRY)
    assert len(ordered) == len(REGISTRY)


def test_stable_order_env_disables_disk_derived_rotation(monkeypatch):
    """The window rotation reads CORRECTNESS_r*.json from the repo root —
    a hidden input to the public queries() ordering. The escape hatch must
    really escape: with SPARK_GRAFT_STABLE_ORDER=1 the ordering is pure
    registration order, independent of checkout state."""
    from simple_pos_kafka_pyspark_airflow_spark.plans.contract import driver_ordered_registry

    monkeypatch.setenv("SPARK_GRAFT_STABLE_ORDER", "1")
    assert list(driver_ordered_registry()) == list(REGISTRY)
    monkeypatch.delenv("SPARK_GRAFT_STABLE_ORDER")
    assert list(driver_ordered_registry()) != list(REGISTRY)


def test_bench_headline_names_resolve():
    """bench.py silently skips unknown names (names = [n for n in HEADLINE
    if n in registry]) — a renamed query would vanish from BENCH_r{N}
    without an error. Pin every headline name to the registry."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert missing == [], missing
