#!/usr/bin/env python3
"""Dev-only pre-check of the driver's DuckDB oracle compare.

Replays what the driver does with Verify's output: registers the sf parquet
tables in DuckDB, runs each oracle_sql.json statement, and compares against
the corresponding <name>/ parquet dump (column names sorted, rows sorted,
exact match for non-floats, exact-then-tolerance report for floats).

Usage: python3 tools/check_oracle.py [--parts] <sfDir> <verifyOutDir> [query ...]

With query names given, only those oracles are compared — the 100×
stress tier runs one query at a time this way, so a DuckDB spill on one
pathological oracle (70 GB of temp on the first attempt) cannot starve
the disk for the rest of the batch.

--parts (r15 verdict #1): for queries that ship a capacity decomposition
in oracle_parts.json (SparkEntry.oracleParts), evaluate the oracle as
the concatenation of its part statements, each on a FRESH connection run
sequentially — every part gets the full memory/spill budget, so a query
whose single-statement oracle exceeds the spill ceiling (dedup_sweep's
4-chain statement needs ~85 GB of temp at the 100× docs_zipf tier) still
grades exactly. The parts' row union equals the full statement by
construction; the compare is row-order-insensitive either way.
"""
import json
import math
import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def connect(sf_dir: str):
    """One bounded DuckDB connection with the sf tables registered."""
    con = duckdb.connect()
    # Bound DuckDB's memory and give it a spill directory (r14 finding:
    # the default limit is 80% of RAM measured at startup, and on a
    # busy host the KERNEL oom-kills the process before DuckDB starts
    # spilling — link_prediction's 500M-key hash aggregate at the
    # hot-hub 100x tier died at 76 GB RSS. 48 GB + a temp dir turns
    # that into ordinary out-of-core aggregation.)
    os.makedirs(".tmp/check_oracle_spill", exist_ok=True)
    # Cap at min(48GB, 70% of physical RAM): on a <60 GB host an
    # unconditional 48GB would RAISE the limit above DuckDB's default
    # (80% of RAM) and re-introduce the kernel-OOM risk this setting
    # fixed. CHECK_ORACLE_MEM overrides for odd hosts. Floor of 1 GB
    # (r15 ADVICE): on a <1.5 GB host the 70% cap would truncate to
    # '0GB' and DuckDB would fail immediately even for tiny oracles.
    mem = os.environ.get("CHECK_ORACLE_MEM")
    if not mem:
        ram_gb = (os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
                  / (1 << 30))
        mem = f"{max(1, min(48, int(ram_gb * 0.7)))}GB"
    con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET temp_directory='.tmp/check_oracle_spill'")
    # Bound the spill itself (r15: two compares filled the disk to 98%+
    # before an external watchdog killed them — dedup_sweep's 100×
    # oracle wants >85 GB of temp). Cap at 60% of the free space on the
    # spill volume (or CHECK_ORACLE_TEMP): a capacity-bound oracle then
    # fails with DuckDB's clean out-of-temp error instead of starving
    # the host. Same 1 GB floor as the memory cap.
    tmp = os.environ.get("CHECK_ORACLE_TEMP")
    if not tmp:
        st = os.statvfs(".tmp/check_oracle_spill")
        tmp = f"{max(1, int(st.f_bavail * st.f_frsize * 0.6 / (1 << 30)))}GB"
    con.execute(f"SET max_temp_directory_size='{tmp}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main(sf_dir: str, out_dir: str, only=None, use_parts=False) -> int:
    con = connect(sf_dir)
    with open(f"{out_dir}/oracle_sql.json") as fh:
        oracles = json.load(fh)
    parts = {}
    if use_parts:
        try:
            with open(f"{out_dir}/oracle_parts.json") as fh:
                parts = json.load(fh)
        except FileNotFoundError:
            print("FAIL: --parts requested but oracle_parts.json missing "
                  f"in {out_dir} (re-run Verify)")
            return 1
    if only:
        # A misspelled filter name must not read as a passing compare
        # (zero comparisons, exit 0) — at the one-query-at-a-time 100x
        # tier that typo would silently skip the query it meant to grade.
        unknown = sorted(set(only) - set(oracles))
        if unknown:
            print(f"FAIL: requested queries not in oracle_sql.json: "
                  + ", ".join(unknown))
            return 1
        oracles = {k: v for k, v in oracles.items() if k in only}
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')"
            ).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            if use_parts and name in parts:
                # one part per FRESH connection, run sequentially: each
                # gets the full memory/spill budget (never concurrent —
                # parts share the spill dir like any two compares)
                import pandas as pd
                frames = []
                for i, psql in enumerate(parts[name]):
                    pcon = connect(sf_dir)
                    try:
                        frames.append(pcon.execute(psql).fetchdf())
                    finally:
                        pcon.close()
                    print(f"  .. {name} part {i + 1}/{len(parts[name])}: "
                          f"{len(frames[-1])} rows")
                want = pd.concat(frames, ignore_index=True)
            else:
                want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        # A dtype mismatch (e.g. DuckDB sum(BIGINT) -> HUGEINT -> float64 vs
        # Spark's int64) hash-mismatches at the driver even when every value
        # compares equal, so treat it as a failure here too.
        dtype_bad = [
            c for c in got.columns
            if got[c].dtype.kind != want[c].dtype.kind
        ]
        if dtype_bad:
            print(f"FAIL {name}: dtype mismatch on "
                  + ", ".join(f"{c} (spark {got[c].dtype} vs oracle {want[c].dtype})"
                              for c in dtype_bad))
            failures += 1
            continue
        got = got.sort_values(by=list(got.columns), ignore_index=True)
        want = want.sort_values(by=list(want.columns), ignore_index=True)
        bad = 0
        worst = 0.0
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                for x, y in zip(a, b):
                    if (isinstance(x, float) and math.isnan(x)) and (
                            isinstance(y, float) and math.isnan(y)):
                        continue
                    if x is None and y is None:
                        continue
                    if x is None or y is None or x != y or (
                            x == 0.0 and y == 0.0
                            and math.copysign(1.0, x) != math.copysign(1.0, y)):
                        d = abs((x or 0) - (y or 0))
                        worst = max(worst, d)
                        bad += 1
            else:
                neq = (a != b) & ~(a.isna() & b.isna())
                if neq.any():
                    bad += int(neq.sum())
        if bad:
            print(f"FAIL {name}: {bad} mismatched values (worst float delta {worst:.3e}) of {len(got)} rows")
            failures += 1
        else:
            tag = " (parts)" if use_parts and name in parts else ""
            print(f"OK   {name}: {len(got)} rows, {len(got.columns)} cols exact{tag}")
    return failures


if __name__ == "__main__":
    argv = sys.argv[1:]
    use_parts = "--parts" in argv
    argv = [a for a in argv if a != "--parts"]
    sys.exit(1 if main(argv[0], argv[1], set(argv[2:]) or None,
                       use_parts=use_parts) else 0)
