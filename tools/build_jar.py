"""Compile jvm/src → dist/hllspark-udaf.jar against the installed pyspark jars.

Idempotent: skips the build when the jar is newer than every source file.
Used by hllspark.jvm_udaf.ensure_jar() as a lazy fallback, and runnable
directly:  python tools/build_jar.py
"""

import glob
import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SRC = ROOT / "jvm" / "src"
JAR = ROOT / "dist" / "hllspark-udaf.jar"


def build(force: bool = False) -> Path:
    sources = sorted(SRC.rglob("*.java"))
    if not sources:
        raise FileNotFoundError(f"no java sources under {SRC}")
    if JAR.exists() and not force:
        if JAR.stat().st_mtime >= max(s.stat().st_mtime for s in sources):
            return JAR
    javac = shutil.which("javac")
    jar = shutil.which("jar")
    if not javac or not jar:
        raise RuntimeError("JDK (javac/jar) not available")
    import pyspark

    spark_jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    cp = os.path.join(spark_jars, "*")
    with tempfile.TemporaryDirectory() as td:
        subprocess.run(
            [javac, "-classpath", cp, "-d", td, "--release", "17"]
            + [str(s) for s in sources],
            check=True,
        )
        JAR.parent.mkdir(parents=True, exist_ok=True)
        tmp_jar = Path(td) / "out.jar"
        subprocess.run([jar, "cf", str(tmp_jar), "-C", td, "hllsparkjvm"], check=True)
        shutil.move(str(tmp_jar), str(JAR))
    return JAR


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
