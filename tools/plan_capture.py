"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python tools/plan_capture.py TAG SUFFIX KEY [KEY...]
e.g.   python tools/plan_capture.py r14 before q1_pricing_summary ...

Writes plans/TAG/<key>_<SUFFIX>.txt at the repo root. Uses the same
staged sf0.1 layout as bench.py so the captured plans are the ones
the bench actually runs.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix, *keys = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.session import get_spark

    operators.load_all()
    import __spark_entry__ as entry
    import bench

    every = entry.queries()
    spark = get_spark("plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    staged_dir, max_partition_bytes = bench.stage_multi_rowgroup(sf_dir)
    if max_partition_bytes:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(max_partition_bytes))
        spark.conf.set("spark.sql.files.openCostInBytes", str(256 * 1024))
        sf_dir = staged_dir

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    for key in keys:
        df = every[key](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
