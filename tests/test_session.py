"""configure_session: the one-stop recommended configuration (round-3
verdict item #2 — the ObjectHashAggregate fallback threshold must stop being
a foot-gun users can only find in bench.py)."""

import pytest
from pyspark.sql import functions as F

import hllspark


def test_builder_gets_recommended_confs():
    from pyspark.sql import SparkSession

    b = hllspark.configure_session(SparkSession.builder.master("local[2]"))
    opts = b._options
    assert opts["spark.sql.objectHashAggregate.sortBased.fallbackThreshold"] == "131072"
    assert opts["spark.sql.shuffle.partitions"] == "256"
    assert opts["spark.sql.adaptive.enabled"] == "true"
    assert opts["spark.sql.execution.arrow.maxRecordsPerBatch"] == "131072"


def test_builder_respects_explicit_user_confs():
    from pyspark.sql import SparkSession

    b = SparkSession.builder.master("local[2]").config("spark.sql.shuffle.partitions", "7")
    b = hllspark.configure_session(b, fallback_threshold=1234)
    opts = b._options
    assert opts["spark.sql.shuffle.partitions"] == "7"  # user's choice kept
    assert opts["spark.sql.objectHashAggregate.sortBased.fallbackThreshold"] == "1234"


def test_builder_ships_udaf_jar_when_available():
    import shutil

    from pyspark.sql import SparkSession

    b = hllspark.configure_session(SparkSession.builder.master("local[2]"))
    jars = b._options.get("spark.jars", "")
    if shutil.which("javac") or "hllspark-udaf.jar" in jars:
        assert "hllspark-udaf.jar" in jars


def test_live_session_runtime_confs(spark):
    prior = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        out = hllspark.configure_session(spark, shuffle_partitions=64, fallback_threshold=4096)
        assert out is spark
        assert spark.conf.get("spark.sql.objectHashAggregate.sortBased.fallbackThreshold") == "4096"
        assert spark.conf.get("spark.sql.shuffle.partitions") == "64"
    finally:
        for k, v in prior.items():
            if v is not None:
                spark.conf.set(k, v)


def test_grouped_udaf_plan_is_object_hash_aggregate(spark):
    """The udaf engine's grouped plan must aggregate through
    ObjectHashAggregate (the TypedImperativeAggregate container — the
    sort-based FALLBACK past the threshold is a runtime mode inside it, which
    is why configure_session raises the threshold) and never degrade to a
    plain SortAggregate."""
    ju = pytest.importorskip("hllspark.jvm_udaf")
    if not ju.available(spark):
        pytest.skip("hllspark-udaf.jar not loadable (no JDK?)")
    hllspark.configure_session(spark)
    df = spark.range(100_000).select((F.col("id") % 10_000).alias("g"), (F.col("id") % 977).alias("v"))
    plan = ju.sketch_jvm_udaf(df, "v", ["g"])._jdf.queryExecution().executedPlan().toString()
    assert "ObjectHashAggregate" in plan
    assert "SortAggregate" not in plan
