"""Run the driver surface N times and flag run-to-run instability.

The driver hashes query results, so ANY nondeterminism — a double sum
crossing a rounding boundary under a different partition merge order
(the tpch_q5 incident, SCALING.md round 6), a LIMIT without a total
order, an uncapped collect — shows up as a flaky verdict even when a
single run matches the oracle. This sweep catches the class directly:
same query, same data, N runs, value-hashes must be identical.

Usage:
    python tools/stability_check.py [--sf-dir DIR] [--runs N] [--all]
        [--only name ...] [--skip name ...]

Exit code 1 if any query is unstable. Round-6 baseline: 50/50 stable
at sf0.01 and the full surface hash-exact vs DuckDB at sf1.0.
"""

from __future__ import annotations

import argparse
import hashlib
import sys


def value_hash(spd) -> str:
    cols = sorted(spd.columns)
    a = spd[cols].sort_values(cols).reset_index(drop=True).astype(str)
    return hashlib.md5(a.to_csv(index=False).encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument(
        "--all",
        action="store_true",
        help="sweep EVERY registered query (the full registry), not just "
        "the ~50-entry driver surface — the excluded entries get oracle "
        "checks from tests/test_oracle_parity.py but a single oracle run "
        "cannot distinguish deterministic from got-lucky",
    )
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod

    from vector_db_example_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if args.all:
        from vector_db_example_spark.queries.registry import QUERIES

        qs = {name: q.fn for name, q in QUERIES.items()}
    else:
        qs = entry_mod.queries()
    if args.only:
        missing = sorted(set(args.only) - set(qs))
        if missing:
            print(
                f"WARNING: --only name(s) not in the selected set "
                f"(did you mean --all --only?): {', '.join(missing)}",
                file=sys.stderr,
            )
        qs = {n: f for n, f in qs.items() if n in set(args.only)}
    qs = {n: f for n, f in qs.items() if n not in set(args.skip)}

    baseline: dict[str, str] = {}
    unstable: set[str] = set()
    for run in range(args.runs):
        for name, fn in qs.items():
            h = value_hash(fn(spark, args.sf_dir).toPandas())
            if run == 0:
                baseline[name] = h
            elif h != baseline[name]:
                unstable.add(name)
                print(f"UNSTABLE: {name} (run {run})", flush=True)
    print(f"stable: {len(qs) - len(unstable)}/{len(qs)} over {args.runs} runs "
          f"at {args.sf_dir}")
    return 1 if unstable else 0


if __name__ == "__main__":
    raise SystemExit(main())
