#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB oracle compare.

Usage: check_oracle.py <verify_out_dir> <sf_dir> [--tolerant]

For each query dir under verify_out_dir: read Spark's parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (tables =
<sf_dir>/<name>.parquet registered as views), sort columns by name and
rows by value, and compare cell-by-cell.

Default is STRICT: floats must be bit-identical, matching the driver's
exact hash gate (round 2 shipped two hash-red queries because the old
rel_tol=1e-8 default masked last-ulp association differences).
--tolerant restores the old rel_tol=1e-8 compare for triage only —
never trust a tolerant PASS as gate-green.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

STRICT = True


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round for SORTING only; equality uses rel-tolerance (eq_cell)
        return float(f"{v:.6g}")
    if hasattr(v, "isoformat"):  # datetime/date; strip tz info textually
        s = v.isoformat()
        return s.replace("+00:00", "")
    if isinstance(v, bool):
        return bool(v)
    return v


def eq_cell(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if STRICT:
            if math.isnan(a) or math.isnan(b):
                return math.isnan(a) and math.isnan(b)
            # bit-exact, including signed zero (-0.0 != +0.0 under the
            # driver's byte-level hash, but Python's == conflates them)
            import struct
            return struct.pack("<d", a) == struct.pack("<d", b)
        return math.isclose(a, b, rel_tol=1e-8, abs_tol=1e-10)
    return norm(a) == norm(b)


def eq_row(ra, rb):
    return len(ra) == len(rb) and all(eq_cell(a, b) for a, b in zip(ra, rb))


def main():
    global STRICT
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    if "--tolerant" in sys.argv[3:]:
        STRICT = False
        print("NOTE: tolerant float compare (rel_tol=1e-8) — triage only,"
              " the driver gate is exact")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
            gcols = sorted(got.column_names)
            wcols = sorted(want.column_names)
            if gcols != wcols:
                print(f"FAIL {name}: columns spark={gcols} oracle={wcols}")
                n_fail += 1
                continue
            def key(r):
                return tuple((x is None, str(norm(x))) for x in r)
            grows = sorted(
                [tuple(row[c] for c in gcols) for row in got.to_pylist()], key=key)
            wrows = sorted(
                [tuple(row[c] for c in wcols) for row in want.to_pylist()], key=key)
            if len(grows) != len(wrows):
                print(f"FAIL {name}: rows spark={len(grows)} oracle={len(wrows)}")
                n_fail += 1
                continue
            bad = None
            for i, (g, w) in enumerate(zip(grows, wrows)):
                if not eq_row(g, w):
                    bad = (i, g, w)
                    break
            if bad:
                print(f"FAIL {name}: first diff at sorted row {bad[0]}:\n  spark : {bad[1]}\n  oracle: {bad[2]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(grows)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
