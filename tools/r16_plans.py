"""Dump ``explain("formatted")`` for named suite queries to plans/r16/.

The r16 optimization round's evidence trail: before touching a query, run

    python tools/r16_plans.py before q1 q2 ...

and after the change

    python tools/r16_plans.py after q1 q2 ...

Each query writes ``plans/r16/<query>_<tag>.txt``. Runs at sf0.1 (the bench
scale) on the bench session config so the plans are the ones the bench
times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_db_api_spark import suite
from vector_db_api_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().rstrip() + "\n"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), "first arg must be before|after"
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r16-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = suite.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(formatted(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
