"""Build helper for the JVM-side Catalyst extension (SURVEY §4.2d).

The engine's codec-identity rewrite `inflate(deflate(x)) → x` exists in
two forms: the Python-side expression-build fold (functions/binary.py
codec_plan — always on, driver-contract safe) and the REAL Catalyst
optimizer rule here, compiled from the checked-in Java sources against
the installed Spark's own jars and injected via spark.sql.extensions.
The compiled jar is a build artifact (not committed); `ensure_jar()`
compiles it on demand with javac (present in this JDK 17 image) and
caches it next to the sources.

The shared engine session stays vanilla — the driver contract builds
its own SparkSession where no extension config exists, so the rule is
exercised by a dedicated subprocess session (tests/test_catalyst_ext.py)
that proves the rewrite fires inside `explain()` with no Python-side
help. On a production cluster the jar would ship with --jars and the
extension class via spark.sql.extensions exactly as the test does.
"""

from __future__ import annotations

import os
import subprocess

_JVM_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC_DIR = os.path.join(_JVM_DIR, "src")
_BUILD_DIR = os.path.join(_JVM_DIR, "build")
JAR_PATH = os.path.join(_BUILD_DIR, "hgspark-ext.jar")

EXTENSION_CLASS = "hgspark.CodecExtensions"


def _spark_jars_glob() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "jars", "*")


def _sources() -> list[str]:
    out = []
    for root, _, files in os.walk(_SRC_DIR):
        out.extend(os.path.join(root, f) for f in files if f.endswith(".java"))
    return sorted(out)


def ensure_jar() -> str:
    """Compile the extension jar if absent or older than any source."""
    srcs = _sources()
    if os.path.exists(JAR_PATH) and all(
        os.path.getmtime(JAR_PATH) >= os.path.getmtime(s) for s in srcs
    ):
        return JAR_PATH
    classes = os.path.join(_BUILD_DIR, "classes")
    os.makedirs(classes, exist_ok=True)
    subprocess.run(
        ["javac", "-cp", _spark_jars_glob(), "-d", classes, *srcs],
        check=True,
        capture_output=True,
        text=True,
    )
    subprocess.run(
        ["jar", "cf", JAR_PATH, "-C", classes, "."],
        check=True,
        capture_output=True,
        text=True,
    )
    return JAR_PATH
