"""Clean-worker environment guard: every query that ships Python to
executors must survive a worker whose PYTHONPATH does NOT contain this
package.

Why this exists: cloudpickle serializes closures BY VALUE but
module-level functions BY REFERENCE (module + qualname). A kernel that
references a module-level helper therefore requires
``dex_data_ingestor_spark`` to be importable inside every executor's
Python worker — true on this repo's test rig (cwd is the repo), false
on a real cluster where only the application code was submitted, and
false under the driver's own harness when it runs from another
directory. Round 9's full-registry clean-worker driver-sim caught
exactly two such queries (q_embed_gram_fast, q_ann_ivfpq — both via
the shared ``_np_quantize_units`` module helper, since rebuilt as the
``_make_np_quantizer`` closure factory); this test pins the whole
class: one subprocess whose driver imports the package via sys.path
only (never PYTHONPATH), run over every registry query whose plan
ships a Python kernel, from a cwd far away from the repo.

The query list is DERIVED, not hand-maintained: a registry entry is
Python-shipping iff its analyzed plan contains a Python eval node
(ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas / BatchEvalPython
— checked on the driver side, which needs no worker).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SUBPROC = r"""
import os, sys, re
sys.path.insert(0, "@REPO@")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("clean-worker-guard")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from dex_data_ingestor_spark.plans.testbed import QUERIES

SF = "/root/testdata/sf0.001"
PY_NODES = re.compile(
    "ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|"
    "FlatMapCoGroupsInPandas|BatchEvalPython|PythonMapInArrow"
)

shipping = []
for name, fn in QUERIES.items():
    df = fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if PY_NODES.search(plan):
        shipping.append((name, df))

assert shipping, "plan scan found no Python-shipping queries — regex rot?"
print("PYSHIP:" + ",".join(n for n, _ in shipping), flush=True)

for name, df in shipping:
    n = df.count()  # forces worker-side execution of the kernel
    print(f"OK {name} {n}", flush=True)
print("CLEAN_WORKER_ALL_OK", flush=True)
spark.stop()
"""


@pytest.mark.slow
def test_python_kernels_survive_clean_worker(tmp_path):
    env = {
        k: v
        for k, v in os.environ.items()
        # strip every channel that could leak the repo onto the
        # workers' import path
        if k not in ("PYTHONPATH",)
    }
    script = tmp_path / "clean_worker_guard.py"
    script.write_text(_SUBPROC.replace("@REPO@", REPO))
    proc = subprocess.run(
        [sys.executable, str(script)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    out = proc.stdout
    assert proc.returncode == 0, (out[-3000:], proc.stderr[-3000:])
    assert "CLEAN_WORKER_ALL_OK" in out, out[-3000:]
    # the known kernel families must actually be in the derived set —
    # if the plan-scan regex rots, this keeps the guard honest
    shipped = next(
        line for line in out.splitlines() if line.startswith("PYSHIP:")
    )
    # the fast twins are the registry's only Python-shipping entries
    # (q_token_price's registry entry is the double variant; the Q96
    # UDF, codecs and BPE mirror are covered by the test below)
    for must in ("q_embed_gram_fast", "q_ann_ivfpq", "q_semdedup_fast"):
        assert must in shipped, (must, shipped)


_SUBPROC_HELPERS = r"""
import os, sys
sys.path.insert(0, "@REPO@")

# get_session ships the package zip via addPyFile — the layer under
# test; every kernel below calls module-level helpers by reference.
from dex_data_ingestor_spark.session import get_session

spark = get_session(
    app_name="clean-worker-helpers",
    master="local[2]",
    shuffle_partitions=2,
    extra_confs={"spark.ui.enabled": "false"},
)
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F

# 1. Q96 exact-decimal pandas UDF (calls _price_pair_py by reference)
from dex_data_ingestor_spark.functions.decimalq96 import (
    token_prices_q96_exact,
)

q96 = "CAST('79228162514264337593543950336' AS DECIMAL(38,0))"  # 2^96
df = spark.range(4).select(
    F.expr(f"CAST((id + 1) * {q96} AS DECIMAL(38,0))").alias("sqrt_price"),
    F.lit(18).alias("d0"), F.lit(18).alias("d1"),
    F.lit(1.0).alias("u0"), F.lit(None).cast("double").alias("u1"),
)
n = df.select(
    token_prices_q96_exact("sqrt_price", "d0", "d1", "u0", "u1")
).count()
assert n == 4, n
print("OK q96_udf", flush=True)

# 2. multimodal image decode kernel (calls decode_media by reference);
#    a 2x2 binary PPM exercises the real codec path end-to-end
from dex_data_ingestor_spark.operators.multimodal import image_stats

ppm = b"P6 2 2 255\n" + bytes(range(12))
mm = spark.createDataFrame(
    [(1, bytearray(ppm)), (2, None)], "doc_id long, payload binary"
)
rows = {r.doc_id: r.decoded for r in image_stats(mm).collect()}
assert rows == {1: True, 2: False}, rows
print("OK image_stats_kernel", flush=True)

# 3. BPE pandas mirror (calls _encode_words_python by reference)
from dex_data_ingestor_spark.operators.bpe import apply_bpe

docs = spark.createDataFrame(
    [(1, "aa ab aa")], "doc_id long, text string"
)
out = apply_bpe(
    docs, [("a", "a")], engine="pandas"
).select("bpe_tokens").head()[0]
assert "aa" in out, out
print("OK bpe_pandas_kernel", flush=True)

print("CLEAN_WORKER_HELPERS_OK", flush=True)
spark.stop()
"""


@pytest.mark.slow
def test_module_helper_kernels_survive_clean_worker_via_package_ship(
    tmp_path,
):
    """The non-registry kernel surface — Q96 UDF, multimodal codecs,
    BPE pandas mirror — references module helpers by name, which is
    fine ONLY because configure_session ships the package zip to
    executors (addPyFile, the --py-files mechanism). This proves the
    ship end-to-end: driver imports via sys.path alone, cwd far from
    the repo, PYTHONPATH empty — exactly a cluster executor's world."""
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    script = tmp_path / "clean_worker_helpers.py"
    script.write_text(_SUBPROC_HELPERS.replace("@REPO@", REPO))
    proc = subprocess.run(
        [sys.executable, str(script)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        proc.stdout[-3000:], proc.stderr[-3000:],
    )
    assert "CLEAN_WORKER_HELPERS_OK" in proc.stdout, proc.stdout[-3000:]
