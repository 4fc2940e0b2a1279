"""Ad-hoc single-key oracle parity checker for development.

Usage: python tools/check_keys.py key1 key2 ...  [--sf /root/testdata/sf0.01]

Runs each key's Spark plan and DuckDB oracle side by side with the same
comparator the driver (and tests/test_oracle.py) use, printing PASS/FAIL.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from billing_data_loader_spark.oracle import check_query  # noqa: E402
from billing_data_loader_spark.plans.catalog import catalog  # noqa: E402
from billing_data_loader_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        if i + 1 >= len(args):
            sys.exit("--sf requires a directory argument")
        sf = args[i + 1]
        del args[i : i + 2]
    spark = get_spark("bdl-check-keys")
    specs = catalog()
    unknown = [k for k in args if k not in specs]
    if unknown:
        sys.exit(f"unknown keys (not in the catalog): {unknown}")
    failed = []
    for key in args:
        spec = specs[key]
        df = spec.fn(spark, sf)
        if spec.oracle is None:
            n = df.count()
            print(f"{key}: rows-only ({n} rows)")
            continue
        ok, msg = check_query(df, spec.oracle, sf)
        print(f"{key}: {'PASS' if ok else 'FAIL — ' + msg}")
        if not ok:
            failed.append(key)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
