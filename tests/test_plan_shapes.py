"""Physical-plan regression tests: the properties that make the engine hold
at 100 TB are plan shapes, not timings — column pruning to the scan, filter
pushdown into parquet, map-side partial aggregation ahead of the shuffle,
and whole-stage codegen on the hot path.  These assert the shapes directly
so a refactor that silently loses one fails fast.
"""

import pytest
from pyspark.sql import functions as F

from hllspark import agg


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_prunes_to_value_column(spark, pages_small_dir):
    """The register reduction over (url) must read ONLY url from parquet."""
    pages = spark.read.parquet(pages_small_dir)
    _, regs = agg._hll_kernel_frames(pages, "url", [], 14, 6)
    plan = _plan(regs)
    assert "ReadSchema: struct<url:string>" in plan, plan
    # html/text (the wide columns) must not appear anywhere in the scan
    assert "html" not in plan and "text" not in plan


def test_filter_pushed_to_parquet(spark, pages_small_dir):
    pages = spark.read.parquet(pages_small_dir)
    _, regs = agg._hll_kernel_frames(pages.filter(F.col("lang") == "en"), "url", [], 14, 6)
    plan = _plan(regs)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan, plan


def test_partial_aggregation_before_shuffle(spark, pages_small_dir):
    """groupBy(key, idx).agg(max(rho)) must partial-aggregate map-side: at
    most P × 2^b rows cross the exchange, never the raw rows."""
    pages = spark.read.parquet(pages_small_dir)
    _, regs = agg._hll_kernel_frames(pages, "url", ["lang"], 14, 6)
    plan = _plan(regs)
    exch = plan.index("Exchange hashpartitioning")
    # a partial HashAggregate appears BELOW (after, in toString order) the
    # exchange — i.e. on the map side
    below = plan[exch:]
    assert "partial_max" in below or "partial" in below, plan
    assert "HashAggregate" in below


def test_whole_stage_codegen_on_hot_path(spark, pages_small_dir):
    """The kernel columns (hash, clz cascade, encode) and the register
    reduction must run inside WholeStageCodegen spans — no interpreted
    projections on the per-row path."""
    import contextlib
    import io

    pages = spark.read.parquet(pages_small_dir)
    _, regs = agg._hll_kernel_frames(pages, "url", [], 14, 6)
    regs.collect()  # under AQE, codegen subtrees exist only in the final plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        regs.explain("codegen")
    cg = buf.getvalue()
    assert "Found" in cg and "WholeStageCodegen subtrees" in cg, cg[:500]
    # the map-side partial aggregate and every kernel projection must be
    # inside a codegen span (starred nodes)
    assert "*(1) HashAggregate" in cg and "partial_max" in cg, cg[:800]
    assert "*(1) Project" in cg


def test_minhash_jvm_single_aggregate(spark, pages_small_dir):
    """minhash_jvm's k mins must be ONE hash aggregate (one shuffle), not k
    of them."""
    from hllspark.sketches.jvm import minhash_jvm

    pages = spark.read.parquet(pages_small_dir)
    out = minhash_jvm(pages, "url", by=["lang"], k=32)
    plan = _plan(out)
    assert plan.count("Exchange hashpartitioning") <= 2, plan  # agg + (maybe) pandas grouping


def test_udaf_engine_plan_shape(spark, pages_small_dir):
    """engine=jvm_udaf must plan as ObjectHashAggregate (the
    TypedImperativeAggregate home) with a map-side partial before the
    exchange, one buffer row per (partition, key) crossing it, and the scan
    pruned to the value column — never the raw rows through the shuffle."""
    ju = pytest.importorskip("hllspark.jvm_udaf")
    if not ju.available(spark):
        pytest.skip("udaf jar not loadable")
    pages = spark.read.parquet(pages_small_dir)
    out = ju.sketch_jvm_udaf(pages, "url", ["lang"])
    plan = _plan(out)
    assert "ObjectHashAggregate" in plan, plan
    assert (
        "ReadSchema: struct<url:string,lang:string>" in plan
        or "ReadSchema: struct<lang:string,url:string>" in plan
    ), plan
    assert "html" not in plan and "warc_ts" not in plan
    exch = plan.index("Exchange hashpartitioning")
    assert "ObjectHashAggregate" in plan[exch:], plan  # partial below the exchange
    assert "hllregisteraggregator" in plan.lower() or "HllRegisterAggregator".lower() in plan.lower(), plan


def test_quantile_udaf_plan_shape(spark, pages_small_dir):
    """Round-4 quantile aggregate buffers: ObjectHashAggregate with a
    map-side partial, the scan pruned to the value column, ONE exchange of
    buffer rows — the whole point is that a continuous column never
    shuffles one row per distinct value (the groupBy builder's
    groupBy(key, value).count() reduction does)."""
    ju = pytest.importorskip("hllspark.jvm_udaf")
    if not ju.available(spark):
        pytest.skip("udaf jar not loadable")
    pages = spark.read.parquet(pages_small_dir)
    src = pages.select("lang", F.unix_timestamp("warc_ts").alias("ts"))
    out = ju.tdigest_jvm_udaf(src, "ts", by=["lang"])
    plan = _plan(out)
    assert "ObjectHashAggregate" in plan, plan
    assert "html" not in plan and "url" not in plan
    exch = plan.index("Exchange hashpartitioning")
    assert "ObjectHashAggregate" in plan[exch:], plan  # partial below the exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan  # buffers only, once
    assert "tdigestaggregator" in plan.lower(), plan


def test_minhash_udaf_plan_shape(spark, pages_small_dir):
    ju = pytest.importorskip("hllspark.jvm_udaf")
    if not ju.available(spark):
        pytest.skip("udaf jar not loadable")
    pages = spark.read.parquet(pages_small_dir)
    out = ju.minhash_jvm_udaf(pages, "url", by=["lang"], k=32)
    plan = _plan(out)
    assert "ObjectHashAggregate" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "minhashaggregator" in plan.lower(), plan


def test_cosine_pairs_lsh_exchange_reuse(spark, sf001_dir):
    """Round-5: cosine_pairs_lsh's candidate branches (small / oversized /
    sub-bucket / chain) all derive from ONE scan→GEMM→groupBy subtree; AQE
    must REUSE that exchange at runtime so the embedding scan + hyperplane
    GEMM executes once, not once per branch (statically the plan prints the
    subtree per branch — only the executed adaptive plan shows the reuse)."""
    from hllspark.pipeline import ann

    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    p = ann.cosine_pairs_lsh(emb, threshold=0.5, dim=64, h=8)
    p.collect()
    plan = _plan(p)
    assert "ReusedExchange" in plan, plan
