"""Ship-as-package evidence: the pipeline runs via
``spark-submit --py-files sparkclean.zip`` from a directory where the
package is NOT importable — exactly the cluster deployment path the
north star prescribes."""

import json
import os
import shutil
import subprocess
import sys

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import sys
from sparkclean.cli import main
main(sys.argv[1:])
"""


def test_spark_submit_py_files(spark, tmp_path):
    from sparkclean import synth

    corpus = str(tmp_path / "corpus")
    synth.synth_images(spark, 300, with_images=True, partitions=4).write.parquet(corpus)

    zip_path = shutil.make_archive(
        str(tmp_path / "sparkclean"), "zip", root_dir=REPO, base_dir="sparkclean"
    )
    runner = tmp_path / "runner.py"
    runner.write_text(RUNNER)
    out_dir = str(tmp_path / "scored")

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be the only import path
    res = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zip_path,
            str(runner),
            "--input", corpus,
            "--output", out_dir,
            "--buckets", "8",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),
        env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]

    # counters JSON printed by the CLI
    counters = json.loads(
        "{" + res.stdout.split("{", 1)[1].rsplit("}", 1)[0] + "}"
    )
    assert counters["rows_scored"] == 300
    assert counters["rows_kept"] + sum(counters["dropped_by_rule"].values()) <= 300
    assert counters["rows_kept"] > 0

    manifest_path = os.path.join(out_dir, "_sparkclean_manifest.json")
    assert os.path.exists(manifest_path)
    manifest = json.load(open(manifest_path))
    assert len(manifest["buckets"]) == 8
