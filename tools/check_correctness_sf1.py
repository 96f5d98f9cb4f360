#!/usr/bin/env python3
"""sf1 VALUE-level oracle gate (VERDICT r10 "Next round" #3).

The r10 sf1 run was an execution stress: the four overflow bugs it
caught announced themselves by CRASHING. A silent value drift at scale
(fp accumulation order, a 32-bit intermediate, a shifted quantile cut)
would have passed it. This script closes that gap: it runs the driver's
exact DuckDB hash-compare, but against the ScaleGen sf1 tables, with a
per-entry oracle timeout (some oracle replays — recursive-CTE graph
kernels, tokenizer training — are built for 60k-row verification, not
6M; a timeout is recorded as `oracle_timeout`, not a failure).

Usage:
  GRAFT_MAIN=graft.ScaleGen tools/run_verify.sh /root/testdata/sf0.1 /tmp/testdata/sf1 10
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 tools/run_verify.sh /tmp/testdata/sf1 /tmp/verify_sf1 [names...]
  python3 tools/check_correctness_sf1.py /tmp/verify_sf1 /tmp/testdata/sf1 CORRECTNESS_SF1.json [timeout_sec]

Exit 1 iff any compared entry FAILS (timeouts and noOracle do not fail).
"""
import glob
import json
import multiprocessing as mp
import os
import sys

import pandas as pd
import pandas.util


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def run_oracle(sfdir, sql, q):
    """Subprocess target: run one oracle SQL in a fresh DuckDB."""
    try:
        import duckdb
        con = duckdb.connect()
        for p in glob.glob(os.path.join(sfdir, "*.parquet")):
            t = os.path.basename(p)[:-8]
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        df = con.execute(sql).df()
        q.put(("ok", df))
    except Exception as e:  # noqa: BLE001 - report any oracle error
        q.put(("err", str(e)[:500]))


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    record_path = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_SF1.json"
    timeout = int(sys.argv[4]) if len(sys.argv) > 4 else 300

    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results, fails = {}, 0
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for name in names:
        spark = pd.read_parquet(os.path.join(outdir, name))
        if name not in oracle:
            results[name] = {"status": "no_oracle", "spark_rows": len(spark)}
            print(f"{name:28s} noOracle rows={len(spark)}")
            continue
        q = mp.Queue()
        proc = mp.Process(target=run_oracle, args=(sfdir, oracle[name], q))
        proc.start()
        proc.join(timeout)
        if proc.is_alive():
            proc.terminate()
            proc.join()
            results[name] = {"status": "oracle_timeout",
                             "spark_rows": len(spark), "timeout_s": timeout}
            print(f"{name:28s} ORACLE-TIMEOUT ({timeout}s) "
                  f"rows={len(spark)}")
            continue
        kind, payload = q.get()
        if kind == "err":
            results[name] = {"status": "oracle_error", "err": payload,
                             "spark_rows": len(spark)}
            fails += 1
            print(f"{name:28s} ORACLE-ERROR {payload[:120]}")
            continue
        s, o = canon(spark), canon(payload)
        ok_rows = len(s) == len(o)
        ok_schema = list(s.columns) == list(o.columns)
        ok_vals = False
        if ok_rows and ok_schema:
            try:
                pd.testing.assert_frame_equal(s, o, check_dtype=False,
                                              check_exact=True)
                ok_vals = True
            except AssertionError:
                ok_vals = False
        hs = pandas.util.hash_pandas_object(s.astype(str)).sum() \
            if ok_rows else -1
        ho = pandas.util.hash_pandas_object(o.astype(str)).sum() \
            if ok_rows else -2
        ok = ok_rows and ok_schema and ok_vals and hs == ho
        results[name] = {
            "status": "pass" if ok else "FAIL",
            "rows_match": ok_rows, "schema_match": ok_schema,
            "hash_match": bool(hs == ho) if ok_rows else False,
            "spark_rows": len(s), "oracle_rows": len(o),
        }
        if not ok:
            fails += 1
            print(f"{name:28s} FAIL rows={len(s)}/{len(o)} "
                  f"schema={ok_schema} vals={ok_vals}")
            if ok_rows and ok_schema:
                try:
                    cmp = s.compare(o)
                    if len(cmp):
                        print(cmp.head(5))
                except Exception as e:  # noqa: BLE001
                    print("  compare error:", e)
        else:
            print(f"{name:28s} OK   rows={len(s)}")
    summary = {
        "sf_dir": sfdir, "entries": len(results),
        "pass": sum(1 for r in results.values() if r["status"] == "pass"),
        "fail": fails,
        "oracle_timeout": sum(1 for r in results.values()
                              if r["status"] == "oracle_timeout"),
        "no_oracle": sum(1 for r in results.values()
                         if r["status"] == "no_oracle"),
        "results": results,
    }
    with open(record_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"\nSF1 ORACLE GATE: {summary['pass']} pass, {fails} fail, "
          f"{summary['oracle_timeout']} timeout, "
          f"{summary['no_oracle']} no-oracle -> {record_path}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
