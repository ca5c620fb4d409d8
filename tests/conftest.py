import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("hllspark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "6g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_small_dir():
    """Gitignored pages fixture, generated on first use (marker-cached) so a
    fresh checkout doesn't fail with AnalysisException on a missing path.
    Rooted at THIS checkout (not a hardcoded /root/repo) so worktrees and
    relocated clones generate their own fixture."""
    from pathlib import Path

    from hllspark.pipeline.pages import ensure_small

    repo_root = os.environ.get("SPARK_GRAFT_REPO_ROOT", str(Path(__file__).resolve().parents[1]))
    return str(ensure_small(repo_root))


@pytest.fixture(scope="session")
def sf001_dir():
    return os.environ.get("SPARK_GRAFT_SF001", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf01_dir():
    return os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.01")
