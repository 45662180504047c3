"""Full-surface Spark-vs-DuckDB hash-parity sweep at an arbitrary SF.

The driver's correctness gate runs at sf0.01; this tool re-runs the SAME
string-exact comparison (sorted columns, sorted rows, astype(str)) at a
larger scale factor — the repo's discipline is one hash-exact run at
sf1.0 (100x the driver's scale) for every surfaced query, recorded in
SCALING.md. Floats are bit-exact vs DuckDB by design (double math,
left-to-right array folds, identical round() on both sides); a mismatch
is a real semantics bug, never noise.

Usage:
    python tools/parity_sweep.py [--sf-dir /tmp/sf1.0] [--only name ...]
        [--skip name ...] [--all]

By default sweeps the ~50-entry driver surface (the first 50 queries()
entries, same truncation the driver applies); --all sweeps every
registered query. Prints one `name: match=... rows=a/b wall=Ns` line per
query, flushed as it goes so an interrupted sweep leaves a usable
prefix. Exit code 1 if any surfaced comparison mismatches.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# Runnable from any cwd: __spark_entry__ lives at the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1.0")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument(
        "--all",
        action="store_true",
        help="sweep every registered query, not just the driver surface",
    )
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as e
    from vector_db_example_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    if args.all:
        # The driver surface (e.queries()) is capped at 50; --all sweeps
        # the FULL registry, exactly like tools/stability_check.py.
        from vector_db_example_spark.queries.registry import QUERIES

        qs = {name: q.fn for name, q in QUERIES.items()}
        oracles = {
            name: q.oracle for name, q in QUERIES.items() if q.oracle is not None
        }
    else:
        qs, oracles = e.queries(), e.oracle_sql()
    names = list(qs)
    if args.only:
        missing = sorted(set(args.only) - set(names))
        if missing:
            # Without --all the selection is the 50-entry driver surface;
            # an excluded/mid-round query silently matching nothing cost
            # a round-8 session a confusing empty sweep.
            print(
                f"WARNING: --only name(s) not in the selected set "
                f"(did you mean --all --only?): {', '.join(missing)}",
                file=sys.stderr,
            )
        names = [n for n in names if n in set(args.only)]
    names = sorted(n for n in names if n not in set(args.skip))

    failures = 0
    for name in names:
        t0 = time.monotonic()
        spd = qs[name](spark, args.sf_dir).toPandas()
        if name not in oracles:
            print(
                f"{name}: rows={len(spd)} (rows-only) "
                f"wall={time.monotonic() - t0:.2f}s",
                flush=True,
            )
            continue
        dpd = con.execute(oracles[name]).fetchdf()
        cols = sorted(spd.columns)
        a = spd[cols].sort_values(cols).reset_index(drop=True).astype(str)
        b = dpd[cols].sort_values(cols).reset_index(drop=True).astype(str)
        ok = a.equals(b)
        failures += 0 if ok else 1
        print(
            f"{name}: match={ok} rows={len(spd)}/{len(dpd)} "
            f"wall={time.monotonic() - t0:.2f}s",
            flush=True,
        )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
