"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exercises the hllspark surface (SURVEY.md §2) at sf=0.01 and
``oracle_sql()`` gives the DuckDB-checkable equivalent.  Because DuckDB
cannot evaluate our sketches, each approximate query returns the *exact*
answer (computed in Spark too) plus a boolean ``within_bound`` asserting the
sketch estimate is inside the published error envelope — the oracle returns
the same exact answer and literal TRUE.  Deterministic golden replays of the
reference regression suite (test/sql/aggs.ref, set_ops.ref) are compared as
micro-units (×10^6, rounded) against literal oracles.
"""

from __future__ import annotations

import math
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

BOUND_B14 = 1.04 / math.sqrt(2**14)  # 0.8125%
MARGIN = 3.0  # σ-multiple on the envelope


def _register(spark: SparkSession) -> None:
    from hllspark.functions import register_sql

    register_sql(spark)


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# approximate-vs-exact queries (exact value must match the oracle exactly;
# within_bound must be TRUE)
# ---------------------------------------------------------------------------


def _bound_check(est_df: DataFrame, exact_df: DataFrame, keys: list[str]) -> DataFrame:
    cond = (F.abs(F.col("est") - F.col("exact_cnt")) <= F.lit(MARGIN * BOUND_B14) * F.col("exact_cnt")) | (
        (F.col("exact_cnt") == 0) & (F.col("est") == 0)
    )
    if keys:
        j = est_df.join(exact_df, on=keys)
    else:
        j = est_df.crossJoin(exact_df)
    return j.select(*keys, "exact_cnt", cond.alias("within_bound")).orderBy(*keys) if keys else j.select(
        "exact_cnt", cond.alias("within_bound")
    )


def q_distinct_orderkey_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hyperloglog_distinct over a 60k-row fact table (global, two-phase)."""
    from hllspark import agg

    li = _read(spark, sf_dir, "lineitem")
    est = agg.distinct(li, "l_orderkey")
    exact = li.agg(F.countDistinct("l_orderkey").alias("exact_cnt"))
    return _bound_check(est, exact, [])


def q_distinct_custkey_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouped hyperloglog_accum + estimate per group key."""
    from hllspark import agg

    o = _read(spark, sf_dir, "orders")
    est = agg.distinct(o, "o_custkey", by=["o_orderpriority"])
    exact = o.groupBy("o_orderpriority").agg(F.countDistinct("o_custkey").alias("exact_cnt"))
    return _bound_check(est, exact, ["o_orderpriority"])


def q_distinct_users_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hllspark import agg

    e = _read(spark, sf_dir, "events")
    est = agg.distinct(e, "user_id", by=["event_type"])
    exact = e.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact_cnt"))
    return _bound_check(est, exact, ["event_type"])


def q_distinct_partsupp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct over a composite value (string concat) — exercises the UTF-8
    hashing path on a JVM-computed projection."""
    from hllspark import agg

    li = _read(spark, sf_dir, "lineitem").withColumn(
        "pair", F.concat_ws("|", F.col("l_partkey"), F.col("l_suppkey"))
    )
    est = agg.distinct(li, "pair")
    exact = li.agg(F.countDistinct("pair").alias("exact_cnt"))
    return _bound_check(est, exact, [])


def q_reagg_stored_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum(counter) workflow: per-group sketches re-merged to a global
    estimate with NO raw-data pass (README.md:135-166); checks the merged
    estimate equals the direct global sketch byte-for-byte via estimates."""
    from hllspark import agg
    from hllspark.functions import hll_estimate

    o = _read(spark, sf_dir, "orders")
    per_group = agg.sketch(o, "o_custkey", by=["o_orderpriority"])
    remerged = agg.merge_partials(per_group.select("sketch"))
    est = remerged.select(hll_estimate("sketch").alias("est"))
    direct = agg.sketch(o, "o_custkey").select(hll_estimate("sketch").alias("est_direct"))
    exact = o.agg(F.countDistinct("o_custkey").alias("exact_cnt"))
    j = est.crossJoin(direct).crossJoin(exact)
    return j.select(
        "exact_cnt",
        (F.abs(F.col("est") - F.col("exact_cnt")) <= F.lit(MARGIN * BOUND_B14) * F.col("exact_cnt")).alias("within_bound"),
        (F.col("est") == F.col("est_direct")).alias("merge_matches_direct"),
    )


def q_distinct_pages_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship shape: per-lang distinct URLs over the Common-Crawl-style
    pages table (BASELINE.json north_star), skewed lang distribution."""
    from hllspark import agg
    from hllspark.pipeline.pages import ensure_small

    path = str(ensure_small(Path(__file__).resolve().parent))
    pages = spark.read.parquet(path)
    est = agg.distinct(pages, "url", by=["lang"])
    exact = pages.groupBy("lang").agg(F.countDistinct("url").alias("exact_cnt"))
    return _bound_check(est, exact, ["lang"])


# ---------------------------------------------------------------------------
# golden replays (deterministic to 10 decimals → compared in micro-units)
# ---------------------------------------------------------------------------


def _golden_df(spark: SparkSession, rows: list[tuple[str, float]]) -> DataFrame:
    return spark.createDataFrame(
        [(name, int(round(val * 1_000_000))) for name, val in rows], "fixture string, est_micro long"
    )


def q_golden_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference regression goldens (aggs.ref:29-69) recomputed through the
    full Spark pipeline with int32 datum hashing."""
    from hllspark import agg
    from hllspark.functions import hll_estimate

    out = []
    for n in (1, 100, 1020, 10000, 100000):
        df = spark.range(1, n + 1).select(F.col("id").cast("int").alias("i"))
        sk = agg.sketch(df, "i", input_type="int32")
        est = sk.select(hll_estimate("sketch")).first()[0]
        out.append((f"n={n:06d}", est))
    return _golden_df(spark, out)


def q_golden_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation goldens (set_ops.ref): disjoint intersection, mixed-size
    union, compliment — evaluated through the SQL UDF surface."""
    from hllspark import agg

    _register(spark)
    a10k = spark.range(1, 10001).select(F.col("id").cast("int").alias("i"))
    neg = spark.range(1, 10001).select((-F.col("id")).cast("int").alias("i"))
    a1k = spark.range(1, 1001).select(F.col("id").cast("int").alias("i"))
    b2k = spark.range(1, 2001).select(F.col("id").cast("int").alias("i"))
    s = {
        "a10k": agg.sketch(a10k, "i", input_type="int32").withColumnRenamed("sketch", "a"),
        "neg": agg.sketch(neg, "i", input_type="int32").withColumnRenamed("sketch", "b"),
    }
    pair = s["a10k"].crossJoin(s["neg"])
    pair.createOrReplaceTempView("pair_disjoint")
    inter = spark.sql("SELECT hll_intersection(a, b) AS v FROM pair_disjoint").first()["v"]
    u12 = (
        agg.sketch(a1k, "i", input_type="int32")
        .withColumnRenamed("sketch", "a")
        .crossJoin(agg.sketch(b2k, "i", input_type="int32").withColumnRenamed("sketch", "b"))
    )
    u12.createOrReplaceTempView("pair_mixed")
    union_mixed = spark.sql("SELECT hll_union_estimate(a, b) AS v FROM pair_mixed").first()["v"]
    return _golden_df(
        spark,
        [("disjoint_10k_intersection", inter), ("union_1k_2k", union_mixed)],
    )


def q_golden_grouped_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregation golden (aggs.ref:1448-1508): 100 groups × 400,
    per-group accum then merge-aggregate; sum() → 39920."""
    from hllspark import agg
    from hllspark.functions import hll_estimate_bigint

    df = (
        spark.range(1, 101)
        .select(F.col("id").alias("g"))
        .join(spark.range(1, 401).select(F.col("id").alias("m")))
        .select(F.col("g"), (F.col("g") * 400 + F.col("m")).cast("int").alias("v"))
    )
    per_group = agg.sketch(df, "v", by=["g"], input_type="int32")
    merged = agg.merge_partials(per_group.select("sketch"))
    return merged.select(hll_estimate_bigint("sketch").alias("sum_est"))


# ---------------------------------------------------------------------------
# contract entry points
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: grouped approximate distinct on sf0.001 lineitem."""
    return q_distinct_custkey_by_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "distinct_orderkey_global": q_distinct_orderkey_global,
        "distinct_custkey_by_priority": q_distinct_custkey_by_priority,
        "distinct_users_by_event_type": q_distinct_users_by_event_type,
        "distinct_partsupp_pairs": q_distinct_partsupp_pairs,
        "reagg_stored_sketches": q_reagg_stored_sketches,
        "distinct_pages_by_lang": q_distinct_pages_by_lang,
        "golden_series": q_golden_series,
        "golden_setops": q_golden_setops,
        "golden_grouped_sum": q_golden_grouped_sum,
    }


def oracle_sql() -> dict[str, str]:
    pages_glob = str(Path(__file__).resolve().parent / "data" / "pages_small" / "*.parquet")
    return {
        "distinct_orderkey_global": (
            "SELECT count(DISTINCT l_orderkey) AS exact_cnt, TRUE AS within_bound FROM lineitem"
        ),
        "distinct_custkey_by_priority": (
            "SELECT o_orderpriority, count(DISTINCT o_custkey) AS exact_cnt, TRUE AS within_bound "
            "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
        "distinct_users_by_event_type": (
            "SELECT event_type, count(DISTINCT user_id) AS exact_cnt, TRUE AS within_bound "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "distinct_partsupp_pairs": (
            "SELECT count(DISTINCT concat(l_partkey, '|', l_suppkey)) AS exact_cnt, TRUE AS within_bound "
            "FROM lineitem"
        ),
        "reagg_stored_sketches": (
            "SELECT count(DISTINCT o_custkey) AS exact_cnt, TRUE AS within_bound, "
            "TRUE AS merge_matches_direct FROM orders"
        ),
        "distinct_pages_by_lang": (
            f"SELECT lang, count(DISTINCT url) AS exact_cnt, TRUE AS within_bound "
            f"FROM read_parquet('{pages_glob}') GROUP BY lang ORDER BY lang"
        ),
        # goldens from the reference regression suite, ×10^6 rounded
        # (aggs.ref:32,38,44,50,56; set_ops.ref:57; aggs.ref:1534; aggs.ref:1500-1508)
        "golden_series": (
            "SELECT * FROM (VALUES "
            "('n=000001', 1000000), "
            "('n=000100', 100000149), "
            "('n=001020', 1020015503), "
            "('n=010000', 9998401035), "
            "('n=100000', 98643350682)"
            ") AS t(fixture, est_micro)"
        ),
        "golden_setops": (
            "SELECT fixture, CAST(est_micro AS BIGINT) AS est_micro FROM (VALUES "
            "('disjoint_10k_intersection', 190209961), "
            "('union_1k_2k', 2003673602)"
            ") AS t(fixture, est_micro)"
        ),
        "golden_grouped_sum": "SELECT CAST(39920 AS BIGINT) AS sum_est",
    }
