"""Plan-shape assertions: the properties that matter at 100 TB.

These tests pin the *logical* plan contract — which sides carry
broadcast hints — rather than the physical join picked at sandbox
scale (AQE may legitimately broadcast a runtime-small side; what must
never happen is a *forced* broadcast of a table that grows with the
corpus).
"""

from __future__ import annotations

from mimeograph_spark.plans import relational

SF = "/root/testdata/sf0.001"


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_q3_has_no_forced_broadcast(spark):
    """orders/customer/lineitem all grow with the corpus: q3 must not
    pin any join side, leaving strategy choice to AQE."""
    plan = _analyzed(relational.q3_shipping_priority(spark, SF))
    assert "ResolvedHint" not in plan, plan


def test_q5_broadcasts_only_fixed_dimensions(spark):
    """q5 may hint only region + nation (fixed cardinality); every
    sf-scaling table (orders/customer/supplier/lineitem) must be
    hint-free."""
    plan = _analyzed(relational.q5_local_suppliers(spark, SF))
    lines = plan.splitlines()
    hint_idx = [i for i, l in enumerate(lines) if "ResolvedHint" in l]
    assert len(hint_idx) == 2, plan
    for i in hint_idx:
        subtree = "\n".join(lines[i : i + 4])
        assert ("n_nationkey" in subtree) or ("r_regionkey" in subtree), (
            "broadcast hint on a non-dimension table:\n" + subtree
        )


def test_extract_is_single_scan(spark):
    """Both extract branches (main + mega-doc) must consume the cached
    classified frame — one materialization of the input — instead of
    each branch re-scanning and re-classifying the full corpus."""
    from mimeograph_spark.corpus import derive_documents
    from mimeograph_spark.plans.pipeline import extract_flat

    docs = derive_documents(
        spark.read.parquet(f"{SF}/documents.parquet")
    )
    plan = (
        extract_flat(docs, single_scan=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("InMemoryTableScan") == 2, plan


def test_topk_uses_window_group_limit(spark):
    """Top-k window rank must run as a partial per-partition top-k
    (WindowGroupLimit) before the shuffle, not a full sort."""
    df = relational.window_top_orders_per_customer(spark, SF)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in physical, physical
