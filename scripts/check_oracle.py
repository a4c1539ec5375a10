#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify, then run
each oracle SQL in DuckDB over the same parquet tables and compare.

Usage: python3 scripts/check_oracle.py [sfdir] [outdir] [--skip-verify]
           [--report=PATH] [names...]

--report=PATH writes a driver-shaped per-entry JSON map (the
CORRECTNESS_r*.json schema: rows_match / schema_match / hash_match /
spark_rows / oracle_rows / err, rows-only entries as err="no_oracle") so
every round carries a committed local replica of the gate even if the
driver-side artifact is lost (round-15 post-mortem: CORRECTNESS_r15.json
shipped as literal {}).
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
FLAGS = set(a for a in sys.argv[3:] if a.startswith("--"))
ONLY = [a for a in sys.argv[3:] if not a.startswith("--")]
REPORT = next((a.split("=", 1)[1] for a in FLAGS if a.startswith("--report=")),
              None)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_verify():
    names = (" " + " ".join(ONLY)) if ONLY else ""
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SFDIR} {OUTDIR}{names}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)
    if r.returncode != 0:
        print("VERIFY FAILED"); sys.exit(1)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def cmp_cell(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            return a == b or math.isclose(float(a), float(b), rel_tol=0, abs_tol=0)
        except (TypeError, ValueError):
            return False
    return a == b


def entry(rows_match=None, schema_match=None, hash_match=None,
          spark_rows=None, oracle_rows=None, err=None):
    return {"rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err}


def main():
    if "--skip-verify" not in FLAGS:
        run_verify()
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM '{SFDIR}/{t}.parquet'")
    oracle = json.loads(Path(f"{OUTDIR}/oracle_sql.json").read_text())
    report = {}
    # rows-only entries (no oracle SQL): record their dumped row count,
    # like the driver does — the quality gate for these is recall_full.json
    dumped = sorted(p.name for p in Path(OUTDIR).iterdir()
                    if p.is_dir() and p.name.startswith("q"))
    # a reused OUTDIR can hold stale q* dirs from a previous run whose
    # entries were renamed/removed — those would land in the report as
    # no_oracle rows with misleading counts; keep only names the LAST
    # verify run actually dumped (verify_summary.json's ok list)
    summary_path = Path(OUTDIR) / "verify_summary.json"
    if summary_path.exists():
        current = set(json.loads(summary_path.read_text())
                      .get("verify_ok_names", []))
        if current:
            stale = [n for n in dumped if n not in current]
            if stale:
                print(f"note: ignoring {len(stale)} stale dump dir(s): "
                      + " ".join(stale[:8]) + (" ..." if len(stale) > 8 else ""))
            dumped = [n for n in dumped if n in current]
    for name in dumped:
        if name in oracle or (ONLY and name not in ONLY):
            continue
        try:
            n = len(pd.read_parquet(Path(OUTDIR) / name))
            report[name] = entry(spark_rows=n, err="no_oracle")
        except Exception as e:
            report[name] = entry(err=f"no_oracle: {e}")
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if ONLY and name not in ONLY:
            continue
        pq = Path(OUTDIR) / name
        if not pq.exists():
            print(f"FAIL {name}: no spark output"); n_bad += 1
            report[name] = entry(err="no spark output")
            continue
        try:
            got = canon(pd.read_parquet(pq))
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1
            report[name] = entry(err=str(e)[:200])
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} duckdb={list(want.columns)}")
            n_bad += 1
            report[name] = entry(rows_match=len(got) == len(want),
                                 schema_match=False, hash_match=False,
                                 spark_rows=len(got), oracle_rows=len(want))
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} duckdb={len(want)}")
            n_bad += 1
            report[name] = entry(rows_match=False, schema_match=True,
                                 hash_match=False, spark_rows=len(got),
                                 oracle_rows=len(want))
            continue
        bad = None
        for c in got.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                if not cmp_cell(a, b):
                    bad = (c, i, a, b); break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} spark={a!r} duckdb={b!r}")
            n_bad += 1
            report[name] = entry(rows_match=True, schema_match=True,
                                 hash_match=False, spark_rows=len(got),
                                 oracle_rows=len(want))
        else:
            # The driver's hash encodes the value TYPE (e.g. DuckDB HUGEINT
            # from sum(CASE...) != Spark BIGINT even when values agree), so
            # dtype divergence is a FAILURE here too — the fix is almost
            # always a CAST in the oracle SQL, not an engine change.
            dtw = [(c, str(got[c].dtype), str(want[c].dtype))
                   for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
            if dtw:
                print(f"FAIL {name}: DTYPE-DIVERGENCE {dtw}")
                n_bad += 1
                report[name] = entry(rows_match=True, schema_match=False,
                                     hash_match=False, spark_rows=len(got),
                                     oracle_rows=len(want))
            else:
                print(f"ok   {name} ({len(got)} rows)")
                n_ok += 1
                report[name] = entry(rows_match=True, schema_match=True,
                                     hash_match=True, spark_rows=len(got),
                                     oracle_rows=len(want))
    if REPORT:
        Path(REPORT).write_text(
            json.dumps(dict(sorted(report.items())), indent=2) + "\n")
        print(f"report -> {REPORT} ({len(report)} entries)")
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
