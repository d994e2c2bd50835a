#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB differential compare.

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir> [onlyCsv]
           [--json out.json] [--jobs N]

Loads each table as a DuckDB view over the sf parquet, runs every SQL in
oracle_sql.json, loads the Spark result parquet, sorts columns by name,
and compares cell values (doubles to 1e-9 after the queries' own 4dp
rounding). DTYPE-STRICT: the driver hashes *typed* cells, so an oracle
column that comes back float64 (e.g. DuckDB sum(BIGINT) -> HUGEINT ->
double) against a Spark int64 column is a FAIL here even when the values
are numerically identical — that exact gap shipped 10 green-local /
red-driver queries in round 5.

Columns compare VECTORIZED (the per-cell loop took minutes on sf1's
1.5M-row results); the scalar walk only runs to locate the first
mismatch once a column has failed. `--jobs N` fans the queries out over
N worker processes, each with its own DuckDB connection (the sf1
replay's heavy recursive CTEs are single-query bottlenecks otherwise).
`--json` writes the per-query report in the driver's CORRECTNESS
format. Dev-only tool — not part of the shipped library.
"""
import sys, json, glob, math, os
import multiprocessing as mp

import duckdb
import numpy as np
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


_CON = None
_SFDIR = None
_OUTDIR = None
_RTOL = 0.0  # relative float tolerance, see --rtol


def _init(sfdir, outdir, rtol=0.0):
    global _CON, _SFDIR, _OUTDIR, _RTOL
    _SFDIR, _OUTDIR, _RTOL = sfdir, outdir, rtol
    _CON = duckdb.connect()
    # cap per-worker threads — with --jobs N the default (all cores per
    # connection) would oversubscribe the box N-fold on the heavy CTEs
    _CON.sql("SET threads TO 4")
    for t in TABLES:
        # Driver testdata is one file per table; ScaleUp output (the
        # sf1/sf3 rehearsals) is a directory of part files — glob those.
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        _CON.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def _col_ok(a, b):
    if a.dtype.kind == "f" or b.dtype.kind == "f":
        af = a.astype(float).to_numpy()
        bf = b.astype(float).to_numpy()
        both_nan = np.isnan(af) & np.isnan(bf)
        with np.errstate(invalid="ignore"):
            tol = 1e-9 + _RTOL * np.maximum(np.abs(af), np.abs(bf))
            close = np.abs(af - bf) <= tol
        return bool(np.all(both_nan | close))
    an = a.map(norm_cell).to_numpy()
    bn = b.map(norm_cell).to_numpy()
    return bool(np.all(an == bn))


def _check(item):
    """(name, sql) → (name, ok, spark_rows, oracle_rows, err, msg)."""
    name, sql = item
    try:
        exp = _CON.sql(sql).df()
    except Exception as e:
        return (name, False, None, None, f"oracle SQL error: {e}",
                f"FAIL {name}: oracle SQL error: {e}")
    files = glob.glob(f"{_OUTDIR}/{name}/*.parquet")
    if not files:
        return (name, False, None, len(exp), "no spark result parquet",
                f"FAIL {name}: no spark result parquet")
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    ec, gc = sorted(exp.columns), sorted(got.columns)
    if ec != gc:
        return (name, False, len(got), len(exp), "column mismatch",
                f"FAIL {name}: columns spark={gc} oracle={ec}")
    exp = exp[ec].reset_index(drop=True)
    got = got[ec].reset_index(drop=True)
    dt_bad = [(c, str(exp[c].dtype), str(got[c].dtype)) for c in ec
              if dtype_class(exp[c].dtype) != dtype_class(got[c].dtype)]
    if dt_bad:
        c, e, g = dt_bad[0]
        return (name, False, len(got), len(exp), f"dtype mismatch col {c}",
                f"FAIL {name}: dtype col {c}: oracle={e} spark={g} "
                f"(driver hashes typed cells — CAST the oracle aggregate)")
    if len(exp) != len(got):
        return (name, False, len(got), len(exp), "row count mismatch",
                f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
    for ci, c in enumerate(ec):
        if _col_ok(exp[c], got[c]):
            continue
        # locate the first mismatching cell for the error message
        for ri in range(len(exp)):
            a, b = exp.iat[ri, ci], got.iat[ri, ci]
            if isinstance(a, float) or isinstance(b, float):
                a_nan = a is None or (isinstance(a, float) and math.isnan(a))
                b_nan = b is None or (isinstance(b, float) and math.isnan(b))
                if a_nan and b_nan:
                    continue
                if a_nan != b_nan or abs(float(a) - float(b)) > \
                        1e-9 + _RTOL * max(abs(float(a)), abs(float(b))):
                    break
            elif norm_cell(a) != norm_cell(b):
                break
        else:
            ri, a, b = -1, "<vector/scalar disagree>", ""
        return (name, False, len(got), len(exp),
                f"cell mismatch row {ri} col {c}",
                f"FAIL {name}: row {ri} col {c}: oracle={a!r} spark={b!r}")
    return (name, True, len(exp), len(exp), None,
            f"PASS {name} ({len(exp)} rows)")


def main():
    argv = list(sys.argv[1:])
    json_out = None
    jobs = 1
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    if "--jobs" in argv:
        i = argv.index("--jobs")
        jobs = int(argv[i + 1])
        del argv[i:i + 2]
    rtol = 0.0
    if "--rtol" in argv:
        # Relative float tolerance for large-sf replays: double sums in
        # the e10 range legitimately differ by last-ulp summation order
        # (rtol ~3e-15). Default 0 keeps driver-parity strictness.
        i = argv.index("--rtol")
        rtol = float(argv[i + 1])
        del argv[i:i + 2]
    sfdir, outdir = argv[0], argv[1]
    only = set(argv[2].split(",")) if len(argv) > 2 else None

    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    items = [(n, s) for n, s in sorted(oracle.items())
             if only is None or n in only]

    report = {}

    def record(name, ok, spark_rows=None, oracle_rows=None, err=None):
        report[name] = {
            "rows_match": None if err == "no_oracle" else ok,
            "schema_match": None if err == "no_oracle" else ok,
            "hash_match": None if err == "no_oracle" else ok,
            "spark_rows": spark_rows, "oracle_rows": oracle_rows,
            "err": err}

    n_pass = n_fail = 0
    if jobs > 1:
        with mp.Pool(jobs, initializer=_init,
                     initargs=(sfdir, outdir, rtol)) as pool:
            results = pool.imap_unordered(_check, items)
            for name, ok, sr, orr, err, msg in results:
                print(msg, flush=True)
                record(name, ok, sr, orr, err)
                n_pass += 1 if ok else 0
                n_fail += 0 if ok else 1
    else:
        _init(sfdir, outdir, rtol)
        for item in items:
            name, ok, sr, orr, err, msg = _check(item)
            print(msg, flush=True)
            record(name, ok, sr, orr, err)
            n_pass += 1 if ok else 0
            n_fail += 0 if ok else 1

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
