"""Dev harness: oracle-compare a subset of registered queries.

Usage: python scripts/check_parity.py [prefix ...]   (default: all)
"""

import os
import sys
import time

from kinesis_customer_sample_spark.compare import compare_query, duckdb_connection
from kinesis_customer_sample_spark.registry import load_registry
from kinesis_customer_sample_spark.session import get_spark

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    prefixes = tuple(sys.argv[1:])
    reg = load_registry()
    spark = get_spark(cpus="8")
    con = duckdb_connection(SF_DIR)
    failed = []
    timings = []
    for name, q in sorted(reg.items()):
        if prefixes and not name.startswith(prefixes):
            continue
        t0 = time.monotonic()
        if q.oracle is None:
            n = q.fn(spark, SF_DIR).count()
            dt = time.monotonic() - t0
            timings.append((dt, name))
            print(f"CHECK [..] {name}: rows-only, {n} rows ({dt:.2f}s)", flush=True)
            continue
        try:
            res = compare_query(spark, q, SF_DIR, con)
        except Exception as ex:  # surface engine errors as failures
            print(f"CHECK [XX] {name}: ERROR {str(ex)[:500]}", flush=True)
            failed.append(name)
            timings.append((time.monotonic() - t0, name))
            continue
        dt = time.monotonic() - t0
        timings.append((dt, name))
        print(f"CHECK {res.report()} ({dt:.2f}s)", flush=True)
        if not res.ok:
            failed.append(name)
    spark.stop()
    total = sum(t for t, _ in timings)
    print(f"CHECK TOTAL: {total:.1f}s over {len(timings)} queries", flush=True)
    print("CHECK SLOWEST:", [(n, round(t, 2)) for t, n in sorted(timings, reverse=True)[:12]], flush=True)
    print("CHECK FAILED:", failed, flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
