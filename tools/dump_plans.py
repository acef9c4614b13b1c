"""Dump .explain('formatted') for named queries() entries to plans/<dir>/<name>_<tag>.txt.

Usage: python tools/dump_plans.py <out_dir> <tag> <query...>
Uses the bench session shape (local[$SPARK_GRAFT_CPUS], sf from $SPARK_GRAFT_SF_DIR).
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry_mod
from sparkclean.session import get_spark

out_dir, tag = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("sparkclean-plans", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus * 2, 8))
spark.sparkContext.setLogLevel("ERROR")
os.makedirs(out_dir, exist_ok=True)
qs = entry_mod.queries()
for name in names:
    df = qs[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
        fh.write(buf.getvalue())
    spark.catalog.clearCache()
    print(name, "->", len(buf.getvalue()), "chars")
spark.stop()
