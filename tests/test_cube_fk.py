"""cube_agg grouping-set semantics and foreign_key_check profiling."""

import pytest
from pyspark.sql import functions as F

from pybabe_spark.operators.group import cube_agg
from pybabe_spark.operators.infra import foreign_key_check


def _sales(spark):
    rows = [
        ("A", "x", 10.0),
        ("A", "y", 20.0),
        ("B", "x", 5.0),
        (None, "x", 1.0),  # genuine NULL dim value
    ]
    return spark.createDataFrame(rows, "status string, prio string, v double")


def test_cube_emits_all_subsets_with_grouping_id(spark):
    out = cube_agg(
        _sales(spark), ["status", "prio"], {"n": F.count(F.lit(1))}
    ).collect()
    by_gid = {}
    for r in out:
        by_gid.setdefault(r["grouping_id"], []).append(r)
    # gid 0: detail; 1: prio aggregated; 2: status aggregated; 3: total
    assert set(by_gid) == {0, 1, 2, 3}
    assert len(by_gid[3]) == 1 and by_gid[3][0]["n"] == 4
    # the genuine NULL status detail row is distinguishable from the
    # status-subtotal rows ONLY via grouping_id
    null_detail = [r for r in by_gid[0] if r["status"] is None]
    assert len(null_detail) == 1 and null_detail[0]["n"] == 1
    assert all(r["status"] is None for r in by_gid[2])


def test_rollup_is_hierarchical_prefixes_only(spark):
    out = cube_agg(
        _sales(spark), ["status", "prio"], {"n": F.count(F.lit(1))},
        kind="rollup",
    ).collect()
    gids = {r["grouping_id"] for r in out}
    assert gids == {0, 1, 3}  # no "status aggregated away" set (gid 2)


def test_cube_agg_guards(spark):
    with pytest.raises(ValueError, match="kind"):
        cube_agg(_sales(spark), ["status"], {"n": F.count(F.lit(1))},
                 kind="grouping_sets")
    with pytest.raises(ValueError, match="dimension"):
        cube_agg(_sales(spark), [], {"n": F.count(F.lit(1))})


def test_foreign_key_check_counts_orphans_and_nulls(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = foreign_key_check(child, "fk", parent, "pk").collect()[0]
    assert r["n_rows"] == 5
    assert r["n_null_rows"] == 1
    assert r["n_values"] == 3        # 1, 2, 99
    assert r["n_orphan_values"] == 1  # 99
    assert r["full_coverage"] is False
    ok = foreign_key_check(
        child.filter(F.col("fk") != 99), "fk", parent, "pk"
    ).collect()[0]
    assert ok["full_coverage"] is True and ok["n_orphan_values"] == 0


def test_cube_fk_plans(spark):
    from pybabe_spark.plans.lint import plan_lint

    assert plan_lint(
        cube_agg(_sales(spark), ["status", "prio"], {"n": F.count(F.lit(1))})
    ) == []
    child = spark.createDataFrame([(1,)], "fk long")
    parent = spark.createDataFrame([(1,)], "pk long")
    # the two attach_scalars are 1-row-proven — no findings
    assert plan_lint(foreign_key_check(child, "fk", parent, "pk")) == []


def test_psi_identical_distributions_near_zero(spark):
    from pybabe_spark.operators.validate import population_stability

    base = spark.range(1000).select(
        (F.col("id") % 100).cast("double").alias("v")
    )
    out = population_stability(base, base, "v", bins=5).collect()
    assert len(out) == 5
    assert all(r["psi"] == 0.0 for r in out)  # identical -> every term 0
    assert sum(r["ref_n"] for r in out) == 1000


def test_psi_detects_shift_and_smooths_empty_bins(spark):
    from pybabe_spark.operators.validate import population_stability

    ref = spark.range(1000).select(
        (F.col("id") % 100).cast("double").alias("v")
    )
    shifted = spark.range(1000).select(
        (F.col("id") % 100 + 200).cast("double").alias("v")
    )
    out = population_stability(ref, shifted, "v", bins=5).collect()
    psi = out[0]["psi"]
    assert psi > 0.25  # full shift: everything lands in the top bin
    # bins the new batch vacated are Laplace-smoothed, not -inf/NaN
    assert all(r["term"] is not None for r in out)
    # all new mass in the last bin
    by_bin = {r["bin"]: r for r in out}
    assert by_bin[4]["new_n"] == 1000
    import pytest as _pt
    with _pt.raises(ValueError, match="bins"):
        population_stability(ref, shifted, "v", bins=1)


def test_psi_plan_lints_clean(spark):
    from pybabe_spark.operators.validate import population_stability
    from pybabe_spark.plans.lint import plan_lint

    ref = spark.range(100).select(F.col("id").cast("double").alias("v"))
    assert plan_lint(population_stability(ref, ref, "v", bins=4)) == []
