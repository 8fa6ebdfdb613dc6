"""Dump `.explain("formatted")` physical plans for named gate rows
into plans/r15/<query>_<suffix>.txt — the judge-facing before/after
plan evidence for the optimization round.

Usage: python tools/dump_r15_plans.py <suffix> <query> [query ...]
       (suffix is `before` or `after`; sf dir fixed at sf0.001 —
       plan SHAPE does not depend on data volume)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as entry
    from meteaudata_spark.ext import warm
    from meteaudata_spark.session import get_spark

    spark = get_spark("dump_r15_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    os.makedirs("plans/r15", exist_ok=True)
    # Prewarm the session-memoized cores so each dumped plan is the
    # plan the bench's marginal (post-warm) timing actually executes.
    warm.warm_pair_relations(spark, SF_DIR)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"plans/r15/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
