"""Dump .explain("formatted") for every declared catalog query to
plans/<tag>/<name>_<suffix>.txt (judge-checkable plan evidence).

Usage: python tools/dump_plans.py <sf_dir> <tag> <suffix> [name ...]
e.g.   python tools/dump_plans.py /root/testdata/sf0.01 r12 before
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from hawk_pack_spark.queries.catalog import ALL_SPECS as CATALOG  # noqa: E402
from hawk_pack_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    tag = sys.argv[2] if len(sys.argv) > 2 else "r12"
    suffix = sys.argv[3] if len(sys.argv) > 3 else "before"
    names = sys.argv[4:] or sorted(CATALOG)
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("hawk-pack-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = CATALOG[name]
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} bytes")
    spark.stop()


if __name__ == "__main__":
    main()
