"""Capture .explain('formatted') for named queries into
plans/r10/<query>_<tag>.txt. Operators that localCheckpoint eagerly show
plans starting at the checkpoint scans; for those the OPTIMIZATION_r10.md
entry points at the sub-plan or A/B script that carries the evidence.

Usage: python tools/capture_plans_r10.py <tag> <outdir> <sf_dir> <q1> [q2 ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from valentinus_spark.session import get_spark


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1]
    outdir = sys.argv[2]
    sf_dir = sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan-capture-r10")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan_of(df))
        print(f"captured {name}", file=sys.stderr)


if __name__ == "__main__":
    main()
