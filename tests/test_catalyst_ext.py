"""The JVM-side Catalyst extension (SURVEY §4.2d, VERDICT r6 stretch):
the codec-identity rewrite `inflate(deflate(x)) → x` as a REAL
optimizer rule — Java sources under hive_gateway_spark/jvm/src,
compiled against the installed Spark's jars and injected via
spark.sql.extensions — not the Python-side codec_plan fold.

The rule needs its own SparkSession (extensions bind at session
creation; the shared test session and the driver's session stay
vanilla), so the probe runs in a subprocess and reports one JSON
verdict line."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_codec_identity_rule_fires_in_optimized_plan():
    out = subprocess.run(
        [sys.executable, "-m", "hive_gateway_spark.jvm._probe"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=280,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    verdict = json.loads(out.stdout.strip().splitlines()[-1])
    # rewritten: the nested pair is gone from the OPTIMIZED logical plan
    # (no Python-side help — the builder emitted both UDF nodes);
    # control_keeps_udf: a lone deflate is NOT touched (the rule matches
    # only the identity composition); roundtrip_ok: values unchanged;
    # lev_*: the LevenshteinPruneRule inserts the constant-time
    # abs(length−length) guard in front of the DP predicate and keeps
    # the result set identical.
    assert verdict == {
        "rewritten": True,
        "control_keeps_udf": True,
        "roundtrip_ok": True,
        "lev_guard_added": True,
        "lev_rows_ok": True,
    }
