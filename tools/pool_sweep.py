"""Full-pool parity sweep: EVERY oracle-paired spec in ALL_SPECS
(driver window + rotation pool + retired) through the check_parity
replica in one artifact (VERDICT r11 #2 — re-establish "zero
never-recorded debt" post-catalog-split in a single file).

Usage: python tools/pool_sweep.py [sf_dir] [out_file]
Writes a POOL_r{N}.txt-style report and exits non-zero on any FAIL.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from hawk_pack_spark.oracle import check_catalog
from hawk_pack_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_file = sys.argv[2] if len(sys.argv) > 2 else None
    from hawk_pack_spark.queries import ALL_SPECS

    names = sorted(n for n, s in ALL_SPECS.items() if s.oracle is not None)
    spark = get_spark("pool-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    lines = [
        f"# POOL sweep — ALL {len(names)} oracle-paired specs (window + "
        f"pool + retired) through the check_parity replica at {sf_dir}.",
    ]
    n_bad = 0
    # batch to bound memory growth of one long-lived session's listener
    # state; each call reuses the same SparkSession
    for i in range(0, len(names), 25):
        batch = names[i : i + 25]
        for r in check_catalog(spark, sf_dir, batch):
            mark = "PASS" if r.ok else "FAIL"
            line = f"{mark} {r.name} (spark={r.spark_rows} oracle={r.oracle_rows}) {r.detail}"
            print(line, flush=True)
            lines.append(line)
            n_bad += 0 if r.ok else 1
    dt = time.time() - t0
    tail = f"\n{len(names) - n_bad}/{len(names)} pool specs pass ({dt:.0f}s)"
    print(tail)
    lines.append(tail)
    if out_file:
        with open(out_file, "w") as f:
            f.write("\n".join(lines) + "\n")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
