"""Run the DuckDB-oracle parity sweep from the CLI.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from hawk_pack_spark.oracle import check_catalog
from hawk_pack_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    spark = get_spark("parity-check")
    results = check_catalog(spark, sf_dir, names)
    n_bad = 0
    for r in results:
        mark = "PASS" if r.ok else "FAIL"
        print(f"{mark} {r.name} (spark={r.spark_rows} oracle={r.oracle_rows}) {r.detail}")
        for m in r.mismatches:
            print(f"     {m}")
        n_bad += 0 if r.ok else 1
    print(f"\n{len(results) - n_bad}/{len(results)} parity checks pass")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
