"""Regression: every query must be self-sufficient on a VANILLA SparkSession.

Round-1 lesson: the external correctness harness builds its own
SparkSession (no tsengine configs, no PYTHONPATH export), so 32/50
driver entries failed at the events.parquet TIMESTAMP(NANOS) scan even
though all passed under the builder's session.  This test replicates the
harness exactly — a subprocess with PYTHONPATH stripped, cwd outside the
repo, ``SparkSession.builder.master(...).getOrCreate()`` with zero
configs — and runs representative queries end-to-end:

* an events-derived scan (needs ``spark.sql.legacy.parquet.nanosAsLong``
  set at runtime),
* two Arrow-kernel queries (mapInPandas conv + pandas_udf path — need
  the tsengine package importable on python workers via addPyFile),
* ``entry()`` (the driver's smoke check).

Any future session-level dependence (timezone, Arrow conf, broadcast
threshold, worker imports) fails HERE instead of in the driver's round
report.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E

    qs = E.queries()
    sf = "/root/testdata/sf0.001"
    for name in ["scan_examples", "conv1d_encode", "gru_context", "ann_lsh",
                 "tokenize_udtf", "scan_python_datasource", "stream_tumbling"]:
        n = qs[name](spark, sf).count()
        assert n > 0, f"{{name}}: 0 rows"
        print(f"VANILLA-OK {{name}} {{n}}")
    n = E.entry(spark).count()
    assert n > 0, "entry: 0 rows"
    print(f"VANILLA-OK entry {{n}}")
    spark.stop()
    """
).format(repo=REPO)


def test_queries_run_on_vanilla_session_without_pythonpath():
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd="/tmp",  # NOT the repo: workers must get the package via addPyFile
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    for name in ["scan_examples", "conv1d_encode", "gru_context", "ann_lsh", "entry"]:
        assert f"VANILLA-OK {name} " in proc.stdout, proc.stdout
