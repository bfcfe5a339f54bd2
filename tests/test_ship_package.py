"""ship_package: Python-worker lanes must work when the repo is NOT
on the worker's import path — the cluster-deploy scenario.

The scenario is reproduced faithfully in a subprocess whose cwd is a
temp dir and whose driver imports the package via an explicit
sys.path entry: local-mode Python workers inherit neither, so a
mapInPandas closure referencing ``dataengineering_spark`` dies with
ModuleNotFoundError at unpickle time — exactly what an executor
without the package does — unless ship_package() has shipped the zip.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

# Packaging-lane subprocess tests (~45 s): excluded from the default
# (driver-budget) pytest run; gates shipping via `make test-slow`.
pytestmark = pytest.mark.slow

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")  # driver-side import path only
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .appName("ship-test").config("spark.ui.enabled","false").getOrCreate())
import __spark_entry__ as e
from dataengineering_spark.session import ship_package
if "SHIP" in sys.argv:
    ship_package(spark)
try:
    n = e.queries()["media_durations"](spark, "/root/testdata/sf0.001").count()
    print("OUTCOME ok", n)
except Exception as ex:
    msg = str(ex)
    print("OUTCOME fail", "ModuleNotFoundError" in msg or "dataengineering_spark" in msg)
spark.stop()
"""


def _run(*args):
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT, *args],
        capture_output=True, text=True, timeout=300, cwd="/tmp",
    )
    for line in out.stdout.splitlines():
        if line.startswith("OUTCOME"):
            return line.split(None, 2)[1:]
    raise AssertionError(f"no OUTCOME line:\n{out.stdout}\n{out.stderr}")


def test_worker_lane_fails_without_shipping():
    status, detail = _run()
    assert status == "fail" and detail == "True", (status, detail)


def test_ship_package_fixes_worker_imports():
    status, rows = _run("SHIP")
    assert status == "ok" and int(rows) > 0, (status, rows)
