#!/usr/bin/env python3
"""Local differential harness mimicking the driver's correctness gate.

Usage: python3 scripts/check.py [sfdir] [outdir] [--json artifact.json]

--json writes the per-query verdicts as a committed artifact
(CHECKRUN_r{N}.json) so an empty driver-side CORRECTNESS file is
provably a harness glitch rather than a failed gate.

Reads the Verify output (per-query parquet + oracle_sql.json), runs each
oracle in DuckDB against the same testdata parquet tables, canonicalizes
both results (columns sorted by name, rows sorted by all columns), and
compares cell-by-cell. Exact match required — floats compared by repr
after float64 normalization, timestamps by microsecond value.
"""
import argparse
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow.dataset as pads

_ap = argparse.ArgumentParser(description=__doc__)
_ap.add_argument("sfdir", nargs="?", default="/root/testdata/sf0.01")
_ap.add_argument("outdir", nargs="?", default="/tmp/verify_out")
_ap.add_argument("--json", dest="json_out", default=None,
                 help="write per-query verdicts as a JSON artifact")
_ap.add_argument("--times", action="store_true",
                 help="print per-oracle DuckDB wall-clock")
_NS = _ap.parse_args()
JSON_OUT = _NS.json_out
SFDIR = _NS.sfdir
OUTDIR = Path(_NS.outdir)
TIMES = _NS.times

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    # Driver-strictness: int vs float is a dtype mismatch even when values
    # are numerically equal (the driver hashes dtype-tagged values, so
    # 3448 != 3448.0). bool is an int subclass in Python — exempt it.
    a_int = isinstance(a, int) and not isinstance(a, bool)
    b_int = isinstance(b, int) and not isinstance(b, bool)
    if (a_int and isinstance(b, float)) or (b_int and isinstance(a, float)):
        return False
    if isinstance(a, float) and isinstance(b, float):
        return repr(a) == repr(b) or (math.isnan(a) and math.isnan(b))
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
    return a == b


def compare(name: str, mine: pd.DataFrame, oracle: pd.DataFrame) -> str:
    if sorted(mine.columns) != sorted(oracle.columns):
        return f"SCHEMA mine={sorted(mine.columns)} oracle={sorted(oracle.columns)}"
    if len(mine) != len(oracle):
        return f"ROWS mine={len(mine)} oracle={len(oracle)}"
    m, o = canon(mine), canon(oracle)
    for c in m.columns:
        mv, ov = m[c].tolist(), o[c].tolist()
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(mv, ov)) if not cell_eq(a, b)]
        if bad:
            i, a, b = bad[0]
            return f"VALUES col={c} ndiff={len(bad)} first@{i}: mine={a!r} oracle={b!r}"
    return "OK"


def main() -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SFDIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle_sql = json.loads((OUTDIR / "oracle_sql.json").read_text())

    results, failed = {}, 0
    names = sorted(p.name for p in OUTDIR.iterdir() if p.is_dir())
    for name in names:
        try:
            mine = pads.dataset(OUTDIR / name).to_table().to_pandas()
        except Exception as e:
            results[name] = f"READ-ERROR {e}"
            failed += 1
            continue
        if name not in oracle_sql:
            results[name] = f"NO-ORACLE rows={len(mine)}" + (" (EMPTY!)" if len(mine) == 0 else "")
            continue
        try:
            import time
            _t0 = time.monotonic()
            oracle = con.execute(oracle_sql[name]).fetchdf()
            if TIMES:
                print(f"[oracle-time] {name} {time.monotonic() - _t0:.2f}s", flush=True)
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            failed += 1
            continue
        verdict = compare(name, mine, oracle)
        results[name] = verdict
        if verdict != "OK":
            failed += 1
    missing = sorted(set(oracle_sql) - set(names))
    for name in missing:
        results[name] = "MISSING-OUTPUT"
        failed += 1

    width = max(len(n) for n in results) if results else 0
    for name in sorted(results):
        print(f"{name:<{width}}  {results[name]}")
    print(f"\n{len(results) - failed}/{len(results)} OK")
    if JSON_OUT:
        import datetime

        Path(JSON_OUT).write_text(json.dumps({
            "sfdir": SFDIR,
            "run_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
            "ok": len(results) - failed,
            "total": len(results),
            "queries": results,
        }, indent=1, sort_keys=True))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
