#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"` has produced
per-query parquet dirs + oracle_sql.json, run

    python3 scripts/verify_local.py <sfDir> <outDir>

For each query: run the oracle SQL in DuckDB against views over the
sfDir parquet tables, load the Spark parquet, sort columns by name,
sort rows, and compare values exactly. Reports per-query PASS/FAIL with
a diff sample. Queries without an oracle get a rows-only check.
"""
import sys, json, math, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def tz_aware_cols(df: pd.DataFrame):
    return [c for c in df.columns
            if isinstance(df[c].dtype, pd.DatetimeTZDtype)]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cmp_frames(a: pd.DataFrame, b: pd.DataFrame):
    """a=spark, b=duckdb. Returns (ok, msg)."""
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns differ: spark={sorted(a.columns)} duckdb={sorted(b.columns)}"
    # a tz-aware Spark output vs DuckDB's naive timestamps is a real
    # mismatch (the driver compares raw values) — do not normalize it away
    ta, tb = tz_aware_cols(a), tz_aware_cols(b)
    if ta or tb:
        return False, f"tz-aware timestamp columns: spark={ta} duckdb={tb}"
    if len(a) != len(b):
        return False, f"row count differs: spark={len(a)} duckdb={len(b)}"
    a, b = norm(a), norm(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        # vectorized fast path: identical null masks + byte-identical
        # values short-circuit the per-cell loop (which costs minutes
        # on 10^5-row frames); the loop below runs only to locate and
        # report the first mismatch
        try:
            import numpy as np
            an, bn = pd.isna(av), pd.isna(bv)
            if an.equals(bn):
                if av.dtype.kind == "f" and bv.dtype.kind == "f":
                    af, bf = av.fillna(0.0), bv.fillna(0.0)
                    if af.to_numpy(dtype="f8").tobytes() ==                        bf.to_numpy(dtype="f8").tobytes():
                        continue
                elif av[~an].reset_index(drop=True).equals(
                        bv[~bn].reset_index(drop=True)):
                    continue
        except Exception:
            pass  # fall through to the exact per-cell comparison
        for i in range(len(av)):
            x, y = av.iloc[i], bv.iloc[i]
            xn = x is None or (isinstance(x, float) and math.isnan(x)) or pd.isna(x)
            yn = y is None or (isinstance(y, float) and math.isnan(y)) or pd.isna(y)
            if xn and yn:
                continue
            if xn != yn:
                return False, f"col {c} row {i}: spark={x!r} duckdb={y!r}"
            if isinstance(x, float) or isinstance(y, float):
                # bit-exact, not ==: a -0.0 vs 0.0 pair passes float
                # equality but fails a byte-level hash compare
                import struct
                if struct.pack("d", float(x)) != struct.pack("d", float(y)):
                    return False, f"col {c} row {i}: spark={x!r} duckdb={y!r} (float bits mismatch)"
            elif x != y:
                return False, f"col {c} row {i}: spark={x!r} duckdb={y!r}"
    return True, "ok"


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # directory-of-part-files layout (sf1)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # VERIFY_SCALED=1 (or --scaled argv): overlay the SCALED oracles
    # (oracle_sql_scaled.json, written by Verify under
    # SPARK_GRAFT_SCALED_ORACLES=1) and register the Spark-dumped
    # signature tables under .aux/ as views. Used for the sf1 sweep:
    # the scalar hash chains replay over an md5 sample against the
    # aux dumps, the relational tails replay in full — every query
    # stays hash-compared (r10's VERIFY_SKIP rows-only downgrade is
    # retired for these).
    scaled_path = f"{out_dir}/oracle_sql_scaled.json"
    if (os.environ.get("VERIFY_SCALED") or "--scaled" in sys.argv) \
            and os.path.exists(scaled_path):
        scaled = json.load(open(scaled_path))
        oracle.update(scaled)
        for aux in sorted(glob.glob(f"{out_dir}/.aux/*/")):
            name = aux.rstrip("/").split("/")[-1]
            con.execute(f"CREATE VIEW {name} AS SELECT * "
                        f"FROM read_parquet('{aux}*.parquet')")
        print(f"scaled oracles: {sorted(scaled)}", flush=True)
    # VERIFY_SKIP=name1,name2 downgrades those queries to the
    # rows-only check (pre-r11 sf1 mechanism; superseded by --scaled
    # for the signature-replay queries but kept for ad-hoc use)
    skip = set(os.environ.get("VERIFY_SKIP", "").split(","))
    oracle = {k: v for k, v in oracle.items() if k not in skip}
    results = {}
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        try:
            spark_df = pq.read_table(qdir).to_pandas()
        except Exception as e:
            results[name] = (False, f"spark parquet unreadable: {e}")
            continue
        if name not in oracle:
            # a silent 0-row result is a failure, not a pass — the
            # driver's smoke contract expects rows
            results[name] = (len(spark_df) > 0, f"rows-only: {len(spark_df)} rows")
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = (False, f"oracle SQL failed: {e}")
            continue
        # one pathological frame (e.g. unorderable nested cells) must
        # fail ITS row, not abort the whole gate with a traceback
        try:
            results[name] = cmp_frames(spark_df, duck_df)
        except Exception as e:
            results[name] = (False, f"compare crashed: {e}")
        if os.environ.get("VERIFY_PROGRESS"):
            ok, msg = results[name]
            print(f"{'PASS' if ok else 'FAIL'}  {name}  {msg}", flush=True)
    npass = sum(1 for ok, _ in results.values() if ok)
    for name in sorted(results):
        ok, msg = results[name]
        print(f"{'PASS' if ok else 'FAIL'}  {name}  {msg}")
    print(f"\n{npass}/{len(results)} pass")
    expected = set(oracle)
    names_file = f"{out_dir}/query_names.json"
    if os.path.exists(names_file):
        expected |= set(json.load(open(names_file)))
    missing = sorted(k for k in expected if not os.path.isdir(f"{out_dir}/{k}"))
    if missing:
        print("queries with no spark output:", missing)
    return 0 if npass == len(results) and not missing else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
