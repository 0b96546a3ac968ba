"""The registry (all 140 query definitions and their oracle SQL) must
import WITHOUT an active SparkSession: the coverage generator, the
driver's module import, and any tooling that only wants oracle strings
all load it session-less.  A module-level ``F.col(...)`` in a query's
metadata breaks this (caught live in r5 with dq_expectations' first
rule-table formulation) — this guard keeps it structural.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_registry_imports_without_spark_session():
    code = (
        "from jcf_nb_migration_spark import registry\n"
        "qs = registry.all_queries()\n"
        "assert len(qs) >= 140, len(qs)\n"
        "assert all(q.oracle for q in qs.values())\n"
        "from pyspark import SparkContext\n"
        "assert SparkContext._active_spark_context is None\n"
        "print('OK', len(qs))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, capture_output=True,
        text=True, env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.startswith("OK")
