"""Write-once materialized views (pipeline/materialize.py).

VERDICT r3 #1: report queries must read a materialized cluster table,
not re-run the LSH + connected-components pipeline per query.
"""

import pyspark.sql.functions as F
import pytest

from tstoolbox_spark.pipeline.materialize import (
    input_fingerprint,
    materialized_view,
)

TESTDATA = "/root/testdata/sf0.001"


def test_build_runs_once_then_scans(spark, tmp_path):
    calls = []

    def build(s):
        calls.append(1)
        return s.range(10).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        )

    root = str(tmp_path / "mv")
    a = materialized_view(
        spark, "t", [f"{TESTDATA}/documents.parquet"], {"p": 1},
        build, cache_root=root,
    )
    assert a.count() == 10
    b = materialized_view(
        spark, "t", [f"{TESTDATA}/documents.parquet"], {"p": 1},
        build, cache_root=root,
    )
    assert len(calls) == 1, "second call must read, not rebuild"
    assert sorted(r.v for r in b.collect()) == [i * 2 for i in range(10)]
    # the read side is a plain parquet scan of the committed snapshot
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan


def test_changed_params_or_inputs_rebuild(spark, tmp_path):
    calls = []

    def build(s):
        calls.append(1)
        return s.range(3).select("id")

    root = str(tmp_path / "mv")
    common = dict(build=build, cache_root=root)
    materialized_view(spark, "t", [], {"p": 1}, **common)
    materialized_view(spark, "t", [], {"p": 2}, **common)
    assert len(calls) == 2, "different params must not alias"
    assert input_fingerprint("t", [], {"p": 1}) != input_fingerprint(
        "t", [], {"p": 2}
    )
    assert input_fingerprint("t", [f"{TESTDATA}/documents.parquet"],
                             {"p": 1}) != input_fingerprint(
        "t", [f"{TESTDATA}/embeddings.parquet"], {"p": 1}
    )


def test_cache_hit_never_calls_build(spark, tmp_path):
    root = str(tmp_path / "mv")

    def build(s):
        return s.range(5).select("id")

    materialized_view(spark, "t", [], {"p": 1}, build, cache_root=root)

    def explode(s):
        raise AssertionError("build must not run on cache hit")

    out = materialized_view(
        spark, "t", [], {"p": 1}, explode, cache_root=root
    )
    assert out.count() == 5


def test_lineage_row_committed(spark, tmp_path):
    from tstoolbox_spark.tables import ParquetSnapshotCatalog

    root = str(tmp_path / "mv")
    materialized_view(
        spark, "clusters", [], {"p": 1},
        lambda s: s.range(7).select("id"), cache_root=root,
    )
    fp = input_fingerprint("clusters", [], {"p": 1})
    cat = ParquetSnapshotCatalog(f"{root}/clusters/{fp}")
    lin = cat.read(spark, "lineage").collect()
    assert len(lin) == 1
    assert lin[0].stage == "mv:clusters"
    assert lin[0].unit == fp
    assert lin[0].rows_out == 7


def test_report_queries_read_materialized_clusters(spark):
    """The canonical_docs / dup_size_histogram entry queries must scan
    the committed cluster table — no MinHash/LSH stages in their
    executed plans once the view exists."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # first call may build; second must be a pure read
    qs["canonical_docs"](spark, TESTDATA).count()
    for name in ("canonical_docs", "dup_size_histogram"):
        df = qs[name](spark, TESTDATA)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "posexplode" not in plan and "xxhash64" not in plan, (
            f"{name} recomputes the dedup pipeline"
        )
        assert "FileScan parquet" in plan
