#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage:
  python3 tools/verify_local.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet dirs (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB with views over
the sfDir parquet tables, and compares: columns sorted by name, rows
sorted by all columns, float tolerance 1e-6 relative.
"""
import json, math, sys
import duckdb
import pandas as pd

STRICT = "--strict" in sys.argv  # exact float equality, like the driver's hash gate

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # make lists/arrays hashable+comparable
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              (hasattr(v, "__len__") and not isinstance(v, (str, bytes)) and hasattr(v, "tolist"))
                              else v)
            df[c] = df[c].map(lambda v: tuple(v.tolist()) if hasattr(v, "tolist") else v)
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    except Exception:
        df = df.iloc[df.astype(str).apply(tuple, axis=1).argsort()]
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        if STRICT:
            return af == bf
        return math.isclose(af, bf, rel_tol=1e-6, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return a == b or str(a) == str(b)


def type_class(duck_type: str) -> str:
    t = duck_type.upper()
    if t in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE") or t.startswith("DECIMAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    return "other"


def arrow_class(t) -> str:
    import pyarrow.types as pt
    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t) or pt.is_decimal(t):
        return "float"
    if pt.is_boolean(t):
        return "bool"
    return "other"


def spark_types(out_path: str) -> dict:
    """True column types of the Spark output, from the parquet schema —
    pandas would silently widen a nullable int64 to float64."""
    import glob as g
    import pyarrow.parquet as pq
    files = sorted(g.glob(f"{out_path}/*.parquet")) or \
        sorted(g.glob(f"{out_path}/**/*.parquet", recursive=True))
    if not files:
        return {}
    sch = pq.read_schema(files[0])
    return {n: arrow_class(sch.field(n).type) for n in sch.names}


def check_types(spark_cls: dict, oracle_types: dict):
    """Replicate the driver's typed-value hashing: an oracle column whose
    DuckDB type widens past what Spark emits (HUGEINT from sum(BIGINT),
    int-vs-float kind drift) hash-mismatches even when every value is
    numerically equal. Fail on those here so the class can't ship."""
    for c, oc in oracle_types.items():
        gcls = spark_cls.get(c)
        ocls = type_class(oc)
        # HUGEINT fails the driver's typed hash no matter what the Spark
        # side emits — flag it even when the Spark parquet schema could
        # not be read (gcls None must not silently skip this check)
        if ocls == "hugeint":
            return (f"oracle type HUGEINT col={c}: DuckDB widened an "
                    f"aggregate to int128 — add CAST(... AS BIGINT) in the "
                    f"oracle SQL (spark side is {gcls})")
        if gcls is None:
            continue
        if {ocls, gcls} == {"int", "float"}:
            return (f"typed mismatch col={c}: oracle {oc} vs spark "
                    f"{gcls} — driver hashes typed values")
    return None


def compare(name, got: pd.DataFrame, want: pd.DataFrame, oracle_types=None,
            spark_cls=None):
    if oracle_types:
        terr = check_types(spark_cls or {}, oracle_types)
        if terr:
            return terr
    got, want = canon(got), canon(want)
    if list(got.columns) != list(want.columns):
        return f"schema mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    if len(got) != len(want):
        return f"row count mismatch: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        gv, wv = got[c].tolist(), want[c].tolist()
        for i, (x, y) in enumerate(zip(gv, wv)):
            x = None if (isinstance(x, float) and math.isnan(x)) else x
            y = None if (isinstance(y, float) and math.isnan(y)) else y
            if x is not None and hasattr(x, "item") and not isinstance(x, tuple):
                x = x.item()
            if y is not None and hasattr(y, "item") and not isinstance(y, tuple):
                y = y.item()
            if (x is None) != (y is None) or not (x is None or values_equal(x, y)):
                return f"value mismatch col={c} row={i}: spark={x!r} oracle={y!r}"
    return None


def main():
    sf_dir, out_dir = [a for a in sys.argv[1:] if not a.startswith("--")][:2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, fail, skipped = [], [], []
    import glob, os
    produced = [os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)]
    for name in sorted(produced):
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            skipped.append((name, len(got)))
            continue
        try:
            rel = con.sql(oracle[name])
            oracle_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
            want = rel.fetchdf()
        except Exception as e:
            fail.append((name, f"oracle sql error: {e}"))
            continue
        err = compare(name, got, want, oracle_types,
                      spark_types(f"{out_dir}/{name}"))
        if err:
            fail.append((name, err))
        else:
            ok.append(name)
    print(f"OK       ({len(ok)}): {' '.join(ok)}")
    for name, n in skipped:
        print(f"ROWSONLY  {name}: {n} rows")
    for name, err in fail:
        print(f"FAIL      {name}: {err}")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
