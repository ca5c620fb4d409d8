"""Packaging contract (north_rule: delivered as a spark-submit --py-files
package): the zip alone must supply the library to a driver launched from
OUTSIDE the repo tree."""

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

JOB = """
from pyspark.sql import SparkSession
from hllspark import agg

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
rows = agg.distinct(li, "l_orderkey", by=["l_returnflag"], bigint=True).collect()
print("SUBMIT_RESULT", sorted((r["l_returnflag"], r["est"]) for r in rows))
spark.stop()
"""


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files(tmp_path):
    subprocess.run([sys.executable, str(ROOT / "tools" / "make_pyfiles.py")], check=True, cwd=ROOT)
    job = tmp_path / "job.py"
    job.write_text(JOB)
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(ROOT / "dist" / "hllspark.zip"),
            str(job),
        ],
        cwd=tmp_path,  # NOT the repo root: only the zip can supply hllspark
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("SUBMIT_RESULT")]
    assert line and "('A', 1085)" in line[0] and "('N', 1117)" in line[0] and "('R', 1103)" in line[0], line


JAR_JOB = """
from pyspark.sql import SparkSession
from hllspark import agg
from hllspark.jvm_udaf import sketch_jvm_udaf, available

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
assert available(spark), "udaf class not visible via --jars"
li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
u = sketch_jvm_udaf(li, "l_orderkey", ["l_returnflag"], finalize="estimate_bigint")
rows = sorted((r["l_returnflag"], r["est"]) for r in u.collect())
print("SUBMIT_RESULT", rows)
spark.stop()
"""


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="spark-submit not on PATH")
@pytest.mark.skipif(
    shutil.which("javac") is None and not (ROOT / "dist" / "hllspark-udaf.jar").exists(),
    reason="no JDK and no prebuilt udaf jar",
)
def test_spark_submit_with_udaf_jar(tmp_path):
    """--py-files zip + --jars udaf jar from OUTSIDE the repo tree: the
    engine=jvm_udaf class must resolve through the driver classpath (the
    tools/build_jar fallback is unreachable inside the zip — by design)."""
    subprocess.run([sys.executable, str(ROOT / "tools" / "make_pyfiles.py")], check=True, cwd=ROOT)
    if shutil.which("javac"):
        subprocess.run([sys.executable, str(ROOT / "tools" / "build_jar.py")], check=True, cwd=ROOT)
    # else: a prebuilt (possibly stale) jar is fine — the job only needs
    # the HLL aggregator class, present since the jar first shipped
    job = tmp_path / "job_jar.py"
    job.write_text(JAR_JOB)
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(ROOT / "dist" / "hllspark.zip"),
            "--jars", str(ROOT / "dist" / "hllspark-udaf.jar"),
            str(job),
        ],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("SUBMIT_RESULT")]
    # same estimates as the fallback engine (byte-identical sketches)
    assert line and "('A', 1085)" in line[0] and "('N', 1117)" in line[0] and "('R', 1103)" in line[0], line
