"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at the given sf dir, compare
row count, column names, and order-insensitive values.

Usage: python tools/dev_compare.py [--cpus N] [sf_dir] [query ...]

``--cpus N`` is the PARALLELISM ORDER-SHAKER (part of the per-round gate
since r7): it pins local[N] + spark.sql.shuffle.partitions=N, changing
partition count and therefore float-accumulation order. Run the sweep
once at an odd N (e.g. 7) in addition to the default 32 — round 6's
ad-hoc 7-way sweep caught heaps_law summing raw doubles whose ~0 slope
flipped sign ("0" vs "-0" hash mismatch) only under a different
partition order. A query that is green at 32 but red at 7 has an
order-unstable float fold: DECIMAL-pin its sums (see SNIPPETS.md).
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def type_drift_problems(spark_types, duck_types):
    """Flag engine-side column-type drift that the driver's value-hash
    distinguishes but canon() cannot: DuckDB HUGEINT/DECIMAL (int128 /
    fixed-point, no Spark twin) and float32 vs Spark double. Evidence:
    r2+r3 shipped 7 hash-only driver FAILs from uncast SUM() -> HUGEINT
    while this gate said green (VERDICT r3 item 3). Int *width* drift
    (INTEGER/TINYINT vs bigint) is provably tolerated by the driver hash
    (entity_linkage, dedup_simhash, time_travel all hash-green r3), so
    only the lossy classes fail here.

    spark_types/duck_types: {col: type_string} with engine-native names.
    """
    problems = []
    for col, dt in sorted(duck_types.items()):
        d = dt.upper()
        st = spark_types.get(col, "")
        if "HUGEINT" in d:
            problems.append(
                f"type drift {col}: duck {dt} vs spark {st} — cast the oracle to BIGINT")
        elif "DECIMAL" in d and "decimal" not in st:
            problems.append(
                f"type drift {col}: duck {dt} vs spark {st} — cast the oracle to DOUBLE/BIGINT")
        elif "FLOAT" in d and "double" in st:
            problems.append(
                f"type drift {col}: duck {dt} vs spark {st} — cast the oracle to DOUBLE")
    return problems


def rows_to_set(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in order))
    return sorted(out)


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from valentinus_spark.session import get_spark

    argv = list(sys.argv[1:])
    if "--cpus" in argv:
        i = argv.index("--cpus")
        cpus = argv[i + 1]
        del argv[i : i + 2]
        # must land before get_spark() builds the session
        import os

        os.environ["SPARK_GRAFT_CPUS"] = str(int(cpus))
        print(f"order-shaker: local[{cpus}], shuffle.partitions={cpus}")
    if "--no-aqe" in argv:
        argv.remove("--no-aqe")
        # plan-space shake: static planner only (see session.get_spark)
        import os

        os.environ["SPARK_GRAFT_AQE"] = "0"
        print("plan-shaker: spark.sql.adaptive.* disabled")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    spark = get_spark("dev-compare")
    spark.sparkContext.setLogLevel("WARN")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{dt:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = {c: str(t) for c, t in zip(rel.columns, rel.types)}
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = type_drift_problems(stypes, dtypes)
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            sset = rows_to_set([list(r) for r in srows], scols)
            dset = rows_to_set([list(r) for r in drows], dcols)
            if sset != dset:
                diff_a = [r for r in sset if r not in set(dset)][:3]
                diff_b = [r for r in dset if r not in set(sset)][:3]
                problems.append(f"values differ; spark-only={diff_a} duck-only={diff_b}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows [{dt:.1f}s]")
    print()
    if failures:
        print("FAILURES:", ", ".join(failures))
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
