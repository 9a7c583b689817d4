"""Dev harness: oracle-compare a subset of registered queries.

Usage: python scripts/check_parity.py [prefix ...]   (default: all)
"""

import sys

from kinesis_customer_sample_spark.compare import compare_query, duckdb_connection
from kinesis_customer_sample_spark.registry import load_registry
from kinesis_customer_sample_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    prefixes = tuple(sys.argv[1:])
    reg = load_registry()
    spark = get_spark(cpus="8")
    con = duckdb_connection(SF_DIR)
    failed = []
    for name, q in sorted(reg.items()):
        if prefixes and not name.startswith(prefixes):
            continue
        if q.oracle is None:
            n = q.fn(spark, SF_DIR).count()
            print(f"CHECK [..] {name}: rows-only, {n} rows", flush=True)
            continue
        try:
            res = compare_query(spark, q, SF_DIR, con)
        except Exception as ex:  # surface engine errors as failures
            print(f"CHECK [XX] {name}: ERROR {str(ex)[:500]}", flush=True)
            failed.append(name)
            continue
        print("CHECK " + res.report(), flush=True)
        if not res.ok:
            failed.append(name)
    spark.stop()
    print("CHECK FAILED:", failed, flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
