#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query
output parquet in OUTDIR, run the matching oracle_sql.json entry in
DuckDB over the same sf tables and compare — TYPE-sensitive (canonical
arrow types per column must match) and value-exact after sorting
columns by name and rows by content. Usage:

    python3 tools/validate.py <sfDir> <outDir>

Type sensitivity (round-10 postmortem): the driver's hasher is
type-sensitive, but this gate used to compare Python values only —
and Python's Decimal(123) == 123, so when DuckDB promoted
sum(BIGINT) -> HUGEINT inside the q_kmeans centroid CTE and the
oracle came back decimal128(38,0) against Spark's int64, every value
compared equal locally while the driver hash-failed. Local green must
mean driver green, so both sides are now reduced to canonical arrow
type strings and compared BEFORE values.
"""
import json, math, sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon_type(t):
    """Canonical type string: exact where drift is a real failure
    (decimal vs int, int32 vs int64, float vs double), normalized only
    where physical encodings legitimately differ between a Spark
    parquet file and a DuckDB arrow result (string vs large_string,
    timestamp unit/tz — a tz shift would already fail the value gate)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_integer(t):
        return ("u" if not pa.types.is_signed_integer(t) else "") + f"int{t.bit_width}"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{canon_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(repr(round(v, 12))) if False else v
    return v

def norm_rows(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [names[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    results = {}
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        try:
            tbl = pq.read_table(str(qdir))
        except Exception as e:
            results[name] = f"SPARK_OUTPUT_UNREADABLE: {e}"
            continue
        spark_names = list(tbl.column_names)
        spark_rows = [tuple(row[c] for c in spark_names) for row in tbl.to_pylist()]
        spark_types = {f.name: canon_type(f.type) for f in tbl.schema}
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(spark_rows)}" + (" EMPTY!" if not spark_rows else "")
            continue
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
            duck_names = list(duck_tbl.column_names)
            duck_rows = [tuple(row[c] for c in duck_names)
                         for row in duck_tbl.to_pylist()]
            duck_types = {f.name: canon_type(f.type) for f in duck_tbl.schema}
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        sn, srows = norm_rows(spark_names, spark_rows)
        dn, drows = norm_rows(duck_names, duck_rows)
        if sn != dn:
            results[name] = f"COLUMN_MISMATCH spark={sn} duck={dn}"
            continue
        drift = [f"{c}: spark={spark_types[c]} duck={duck_types[c]}"
                 for c in sn if spark_types[c] != duck_types[c]]
        if drift:
            results[name] = "TYPE_MISMATCH " + "; ".join(drift)
            continue
        if len(srows) != len(drows):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(srows)} duck={len(drows)}"
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            if not rows_equal(a, b):
                bad = (i, a, b)
                break
        if bad:
            results[name] = f"VALUE_MISMATCH at sorted-row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}"
            continue
        tag = f"OK rows={len(srows)}" + (" EMPTY!" if not srows else "")
        # DECIMAL_RISK (round-14 postmortem, the second break of this
        # gate's local-green-must-mean-driver-green promise): decimal128
        # is the one arrow type the driver's hasher canonicalized
        # differently from DuckDB while every value compared equal here
        # AND canonical types matched (q_join_size, r14's only hash
        # failure). So a decimal anywhere in an output schema is flagged
        # even when the query passes, and decimal values are additionally
        # compared under their string rendering — the second
        # canonicalization a foreign hasher might use.
        # RULE (settled by the r15 representation bisect, probe retired
        # r16): no query may EXPORT a decimal column. Decimal math stays
        # internal; render as VARCHAR at the boundary (or BIGINT when
        # provably < 2^63) — both proved hash-stable where DECIMAL(38,0)
        # was not. Any DECIMAL_RISK tag below is therefore a bug to fix,
        # not a tolerance to note.
        dec_cols = [c for c in sn if "decimal" in spark_types[c]]
        if dec_cols:
            idx = [i for i, c in enumerate(sn) if "decimal" in spark_types[c]]
            drift2 = any(
                a[i] is not None and b[i] is not None and str(a[i]) != str(b[i])
                for a, b in zip(srows, drows) for i in idx)
            tag += f" DECIMAL_RISK cols={dec_cols}"
            if drift2:
                tag += " RENDER_DRIFT!"
        results[name] = tag
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_rows_only = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
    n_dec = sum(1 for v in results.values() if "DECIMAL_RISK" in v)
    for k in sorted(results):
        print(f"{k:28s} {results[k]}")
    print(f"\n{n_ok} OK / {n_rows_only} rows-only / {len(results)} total")
    if n_dec:
        print(f"WARNING: {n_dec} quer{'y' if n_dec == 1 else 'ies'} export "
              "decimal columns — the driver hasher canonicalizes decimal128 "
              "differently (r14 q_join_size); prefer BIGINT or VARCHAR "
              "renderings on oracle-facing outputs")
    return 0 if n_ok + n_rows_only == len(results) else 1

def rows_equal(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x is None or y is None:
            if x is not y:
                return False
            continue
        if isinstance(x, float) or isinstance(y, float):
            if x == y:
                continue
            if isinstance(x, str) or isinstance(y, str):
                return False
            # exact-compare policy with a tiny escape hatch for printing
            if math.isnan(float(x)) and math.isnan(float(y)):
                continue
            return False
        else:
            if hasattr(x, "timestamp") and hasattr(y, "timestamp"):
                if x != y:
                    return False
                continue
            if x != y:
                return False
    return True

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
