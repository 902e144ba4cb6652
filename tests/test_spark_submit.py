"""The north rule's deployment shape, executed for real:
``spark-submit --py-files crba_etl_spark.zip run_cdc.py replay ...``.

The zip is built fresh from the package sources; the subprocess runs
from a NEUTRAL working directory with the repo stripped from
PYTHONPATH, so the engine import provably resolves from the shipped
--py-files archive — exactly what a multi-executor cluster submission
does. Final state is asserted against the independent DuckDB replay
oracle, and a second submission proves exactly-once redelivery across
separately-submitted driver processes.
"""

import json
import os
import shutil
import subprocess
import zipfile

import pandas as pd
import pytest

from crba_etl_spark.gen import StreamSpec, generate_stream, oracle_final

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_zip(out_path: str) -> None:
    pkg = os.path.join(REPO, "crba_etl_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_replay(spark, tmpdir_):
    stream = os.path.join(tmpdir_, "events")
    generate_stream(
        stream, StreamSpec(seed=17, n_events=3000, n_epochs=2, evolve_epoch=1)
    )
    zip_path = os.path.join(tmpdir_, "crba_etl_spark.zip")
    _build_zip(zip_path)
    driver = os.path.join(tmpdir_, "run_cdc.py")
    shutil.copy(os.path.join(REPO, "scripts", "run_cdc.py"), driver)
    table = os.path.join(tmpdir_, "table")
    neutral_cwd = os.path.join(tmpdir_, "cwd")
    os.makedirs(neutral_cwd)

    env = {
        k: v for k, v in os.environ.items() if k not in ("PYTHONPATH",)
    }
    env["SPARK_GRAFT_CPUS"] = "4"

    def submit():
        return subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--py-files", zip_path,
                driver,
                "replay", "--events", stream, "--table", table,
                "--n-buckets", "4",
            ],
            capture_output=True, text=True, cwd=neutral_cwd, env=env,
            timeout=600,
        )

    r = submit()
    assert r.returncode == 0, (r.stderr or "")[-3000:]
    out = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert out["epochs_applied"] == [0, 1]

    from crba_etl_spark.icelite import IceliteTable

    got = (
        IceliteTable(table).read(spark)
        .orderBy("conv_id", "turn_idx", "ts")
        .toPandas().reset_index(drop=True)
    )
    exp = oracle_final(stream).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[exp.columns.tolist()], exp, check_dtype=False
    )

    # second submission (a fresh driver process): exactly-once redelivery
    r2 = submit()
    assert r2.returncode == 0, (r2.stderr or "")[-3000:]
    out2 = json.loads([l for l in r2.stdout.splitlines() if l.startswith("{")][-1])
    assert out2["epochs_applied"] == [] and out2["epochs_skipped"] == [0, 1]
