#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB differential compare.

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir>

Loads each table as a DuckDB view over the sf parquet, runs every SQL in
oracle_sql.json, loads the Spark result parquet, sorts columns by name,
and compares cell values (doubles to 1e-9 after the queries' own 4dp
rounding). DTYPE-STRICT: the driver hashes *typed* cells, so an oracle
column that comes back float64 (e.g. DuckDB sum(BIGINT) -> HUGEINT ->
double) against a Spark int64 column is a FAIL here even when the values
are numerically identical — that exact gap shipped 10 green-local /
red-driver queries in round 5. Dev-only tool — not part of the shipped
library.
"""
import sys, json, glob, math, os
import duckdb
import pandas as pd


def dtype_class(dt):
    """Collapse a pandas dtype into the class the driver's typed hash
    distinguishes: int / float / bool / datetime / other."""
    k = dt.kind  # biufcmMOSUV
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "other"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"{v:.6f}"
    if isinstance(v, (pd.Timestamp,)):
        return str(v)
    return str(v)


def main():
    # args: <sfDir> <verifyOutDir> [onlyCsv] [--json out.json]
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sfdir, outdir = argv[0], argv[1]
    report = {}

    def record(name, ok, spark_rows=None, oracle_rows=None, err=None):
        report[name] = {
            "rows_match": None if err == "no_oracle" else ok,
            "schema_match": None if err == "no_oracle" else ok,
            "hash_match": None if err == "no_oracle" else ok,
            "spark_rows": spark_rows, "oracle_rows": oracle_rows,
            "err": err}
    con = duckdb.connect()
    for t in TABLES:
        # Driver testdata is one file per table; ScaleUp output (the
        # sf1 rehearsal) is a directory of part files — glob those.
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    only = set(argv[2].split(",")) if len(argv) > 2 else None
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record(name, False, err=f"oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            record(name, False, oracle_rows=len(exp),
                   err="no spark result parquet")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        ec, gc = sorted(exp.columns), sorted(got.columns)
        if ec != gc:
            print(f"FAIL {name}: columns spark={gc} oracle={ec}")
            record(name, False, len(got), len(exp), "column mismatch")
            n_fail += 1
            continue
        exp, got = exp[ec].reset_index(drop=True), got[ec].reset_index(drop=True)
        dt_bad = [(c, str(exp[c].dtype), str(got[c].dtype)) for c in ec
                  if dtype_class(exp[c].dtype) != dtype_class(got[c].dtype)]
        if dt_bad:
            c, e, g = dt_bad[0]
            print(f"FAIL {name}: dtype col {c}: oracle={e} spark={g} "
                  f"(driver hashes typed cells — CAST the oracle aggregate)")
            record(name, False, len(got), len(exp),
                   f"dtype mismatch col {c}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            record(name, False, len(got), len(exp), "row count mismatch")
            n_fail += 1
            continue
        bad = None
        for ci, c in enumerate(ec):
            for ri in range(len(exp)):
                a, b = exp.iat[ri, ci], got.iat[ri, ci]
                if isinstance(a, float) or isinstance(b, float):
                    af, bf = a, b
                    a_nan = af is None or (isinstance(af, float) and math.isnan(af))
                    b_nan = bf is None or (isinstance(bf, float) and math.isnan(bf))
                    if a_nan and b_nan:
                        continue
                    if a_nan != b_nan or abs(float(af) - float(bf)) > 1e-9:
                        bad = (ri, c, a, b)
                        break
                elif norm_cell(a) != norm_cell(b):
                    bad = (ri, c, a, b)
                    break
            if bad:
                break
        if bad:
            ri, c, a, b = bad
            print(f"FAIL {name}: row {ri} col {c}: oracle={a!r} spark={b!r}")
            record(name, False, len(got), len(exp),
                   f"cell mismatch row {ri} col {c}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            record(name, True, len(exp), len(exp))
            n_pass += 1
    if json_out:
        # Queries Verify dumped but the oracle map doesn't cover (the
        # declared-no-oracle sketches) — recorded like the driver does.
        for d in sorted(glob.glob(f"{outdir}/q_*")):
            name = os.path.basename(d)
            if name not in report and (only is None or name in only):
                files = glob.glob(f"{d}/*.parquet")
                rows = sum(len(pd.read_parquet(f)) for f in files) \
                    if files else None
                record(name, None, rows, None, "no_oracle")
        with open(json_out, "w") as f:
            json.dump(dict(sorted(report.items())), f, indent=2)
        print(f"wrote {json_out} ({len(report)} queries)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
