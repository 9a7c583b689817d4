"""Partition-invariance sweep: every registered query must produce the
IDENTICAL canonical row set when the physical partitioning is perturbed.

Why this gate exists: the one class of nondeterminism the DuckDB oracle
sweep CANNOT catch by construction is partition-order dependence that
happens to agree with the oracle on the default layout — float aggregates
whose partial-sum order varies with the shuffle fan-in, partition-local
logic (spark_partition_id two-phase top-k, mapInPandas carry-state)
whose merge step silently assumes a layout. The repo's discipline is
"no float ever enters an aggregate" (SCALE.md); this sweep PROVES it per
query by running each query twice in one session —

  run A: the engine defaults (spark.sql.shuffle.partitions = 32,
         spark.sql.files.maxPartitionBytes = 128m), and
  run B: a hostile layout (shuffle.partitions = 7, maxPartitionBytes =
         1m — many small scan splits, different reduce fan-in)

— and diffing the canonical sorted row tuples (compare.py's exact
comparator, NULL-vs-NaN-faithful, no float widening).

Usage: PYTHONPATH=/root/repo python scripts/check_partition_invariance.py [prefix...]
Env:   PARITY_SF_DIR (default /root/testdata/sf0.01)

Prints one line per query and a CHECK FAILED summary, mirroring
scripts/check_parity.py.

Cross-process mode — executor-count independence (spark.range fixtures
partition by defaultParallelism = local[N] cores, so N is a layout axis
only a separate JVM can vary):

  SPARK_GRAFT_CPUS=32 ... check_partition_invariance.py --dump /tmp/h32.json
  SPARK_GRAFT_CPUS=4  ... check_partition_invariance.py --compare /tmp/h32.json

--dump writes one sha256 of each query's canonical rows (single run,
default confs); --compare recomputes and diffs against the dump.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from kinesis_customer_sample_spark.compare import _arrow_rows  # noqa: E402
from kinesis_customer_sample_spark.registry import load_registry  # noqa: E402
from kinesis_customer_sample_spark.session import get_spark  # noqa: E402

_PERTURBED = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": "1m",
    # also flip AQE off: coalesced-partition and runtime-replan effects are
    # a second layout axis the default run exercises and this one removes
    "spark.sql.adaptive.enabled": "false",
}
_DEFAULTS = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.sql.adaptive.enabled": "true",
}


def _rows(spark, q, sf_dir):
    spark.catalog.clearCache()
    return _arrow_rows(q.fn(spark, sf_dir).toArrow())


def _row_hash(cols, rows) -> str:
    h = hashlib.sha256()
    h.update(repr(cols).encode())
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()


def _cross_process(mode: str, path: str, prefixes: list[str]) -> None:
    """--dump / --compare: canonical-row hashes across separate processes
    (the executor-count axis — see module docstring)."""
    sf_dir = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
    reg = load_registry()
    names = [
        n
        for n in reg
        if not prefixes or any(n.startswith(p) or p in n for p in prefixes)
    ]
    spark = get_spark(app_name="kcss-cross-process-invariance")
    hashes: dict[str, str] = {}
    failed: list[str] = []
    baseline = json.load(open(path)) if mode == "--compare" else {}
    for name in names:
        try:
            cols, rows = _rows(spark, reg[name], sf_dir)
            hashes[name] = _row_hash(cols, rows)
            if mode == "--compare":
                want = baseline.get(name)
                if want is None:
                    print(f"INVAR [ERR] {name}: not in baseline dump")
                    failed.append(name)
                elif want != hashes[name]:
                    print(f"INVAR [FAIL] {name}: hash differs across processes")
                    failed.append(name)
                else:
                    print(f"INVAR [OK] {name}: cross-process hash match")
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"INVAR [ERR] {name}: {type(ex).__name__}: {str(ex)[:160]}")
        sys.stdout.flush()
    if mode == "--dump":
        json.dump(hashes, open(path, "w"))
        print(f"INVAR DUMPED: {len(hashes)} hashes -> {path}")
    if mode == "--compare":
        # Symmetric coverage check: baseline entries the current run never
        # examined mean the registry shrank or a prefix filter was typo'd —
        # the gate must not pass silently with reduced coverage (r8 advice).
        # Scope the check to the same prefix filter as the run itself: a
        # prefix-scoped --compare against a full --dump is a documented
        # workflow and must not fail on the baseline's out-of-scope keys
        # (r9 advice).
        in_scope = {
            n
            for n in baseline
            if not prefixes or any(n.startswith(p) or p in n for p in prefixes)
        }
        unexamined = sorted(in_scope - set(names))
        if unexamined:
            print(
                f"INVAR [ERR] baseline-only entries never examined "
                f"({len(unexamined)}): {unexamined[:10]}"
                f"{' ...' if len(unexamined) > 10 else ''}"
            )
            failed.extend(unexamined)
    print(f"INVAR FAILED: {failed}")
    spark.stop()
    sys.exit(1 if failed else 0)


def main() -> None:
    sf_dir = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
    prefixes = sys.argv[1:]
    if prefixes and prefixes[0] in ("--dump", "--compare"):
        _cross_process(prefixes[0], prefixes[1], prefixes[2:])
        return
    reg = load_registry()
    names = [
        n
        for n in reg
        if not prefixes or any(n.startswith(p) or p in n for p in prefixes)
    ]
    spark = get_spark(app_name="kcss-partition-invariance")
    failed: list[str] = []
    timings: list[tuple[str, float]] = []
    t_all = time.perf_counter()
    for name in names:
        q = reg[name]
        t0 = time.perf_counter()
        try:
            for k, v in _DEFAULTS.items():
                spark.conf.set(k, v)
            cols_a, rows_a = _rows(spark, q, sf_dir)
            for k, v in _PERTURBED.items():
                spark.conf.set(k, v)
            cols_b, rows_b = _rows(spark, q, sf_dir)
            for k, v in _DEFAULTS.items():
                spark.conf.set(k, v)
            dt = time.perf_counter() - t0
            timings.append((name, dt))
            if cols_a != cols_b:
                failed.append(name)
                print(f"INVAR [FAIL] {name}: schema drift {cols_a} vs {cols_b}")
            elif rows_a != rows_b:
                failed.append(name)
                n_diff = sum(1 for a, b in zip(rows_a, rows_b) if a != b) + abs(
                    len(rows_a) - len(rows_b)
                )
                print(
                    f"INVAR [FAIL] {name}: {n_diff} rows differ under perturbed"
                    f" partitioning ({len(rows_a)} vs {len(rows_b)} rows)"
                )
                for a, b in list(zip(rows_a, rows_b))[:3]:
                    if a != b:
                        print(f"    A={a!r}\n    B={b!r}")
            else:
                print(
                    f"INVAR [OK] {name}: {len(rows_a)} rows invariant ({dt:.2f}s)"
                )
        except Exception as ex:  # noqa: BLE001 — isolate, report, continue
            failed.append(name)
            print(f"INVAR [ERR] {name}: {type(ex).__name__}: {str(ex)[:160]}")
        sys.stdout.flush()
    total = time.perf_counter() - t_all
    timings.sort(key=lambda kv: -kv[1])
    print(f"INVAR TOTAL: {total:.1f}s over {len(names)} queries")
    print(f"INVAR SLOWEST: {[(n, round(t, 2)) for n, t in timings[:10]]}")
    print(f"INVAR FAILED: {failed}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
