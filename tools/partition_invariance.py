#!/usr/bin/env python3
"""Cross-partitioning determinism check.

The DuckDB oracle gate (tools/compare.py) proves Spark == SQL semantics
for ONE execution. This tool proves a different axis: the Spark result
is bit-identical under different parallelism — i.e. no query leaks
partition count / merge order into its output (the class of bug the
repo's total-order rules exist to prevent: q22's windowed ties, MG
estimate emission, etc.).

Usage:
  sbt -batch 'runMain graft.Verify <sfDir> /tmp/vp_a'   # SPARK_GRAFT_CPUS=4
  sbt -batch 'runMain graft.Verify <sfDir> /tmp/vp_b'   # SPARK_GRAFT_CPUS=7
  python3 tools/partition_invariance.py /tmp/vp_a /tmp/vp_b

Exit 0 iff every query's (row count, order-insensitive row-hash sum)
matches between the two dumps.
"""
import sys, os, glob
import duckdb

def signature(con, path):
    cols = [r[0] for r in
            con.execute(f"DESCRIBE SELECT * FROM '{path}/*.parquet'").fetchall()]
    collist = ", ".join(f'"{c}"' for c in sorted(cols))
    return con.execute(
        f"SELECT count(*), sum(hash(concat_ws('|', {collist})))::VARCHAR "
        f"FROM '{path}/*.parquet'").fetchone()

def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    bad = []
    names = sorted(os.path.basename(p) for p in glob.glob(f"{a_dir}/*")
                   if os.path.basename(p) != "oracle_sql.json")
    for name in names:
        b_path = f"{b_dir}/{name}"
        if not os.path.isdir(b_path):
            bad.append(name); print(f"MISS {name}"); continue
        sa, sb = signature(con, f"{a_dir}/{name}"), signature(con, b_path)
        if sa == sb:
            print(f"SAME {name} ({sa[0]} rows)")
        else:
            bad.append(name); print(f"DIFF {name} {sa} vs {sb}")
    print(f"== {len(names) - len(bad)}/{len(names)} partition-invariant ==")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
