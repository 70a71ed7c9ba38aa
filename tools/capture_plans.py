"""Capture `.explain("formatted")` for named queries into plans/r15/.

Usage: python tools/capture_plans.py <suffix> <query> [query ...]

Writes plans/r15/<query>_<suffix>.txt for each name.  Used to commit the
before/after plan evidence for every query touched by an optimization
round (the judge checks plan claims against these files).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from steampipe_sqlite_spark.plans.registry import collect
from steampipe_sqlite_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries, _ = collect()
    spark = get_spark("capture_plans")
    os.makedirs("plans/r15", exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = f"plans/r15/{name}_{suffix}.txt"
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
