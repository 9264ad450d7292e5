"""One-off: dump x_hard_negatives' executed plan for before/after evidence.

Usage: python scripts/_hnplan.py <tree_root> <outfile>
"""

import sys

sys.path.insert(0, sys.argv[1])

from leftshove_spark import queries as Q  # noqa: E402
from leftshove_spark.ext import cache  # noqa: E402
from leftshove_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="hnplan")
df = Q.QUERIES["x_hard_negatives"](spark, "/root/testdata/sf0.1")
buf = []
buf.append(df._jdf.queryExecution().executedPlan().toString())
open(sys.argv[2], "w").write("\n".join(buf))
cache.release_pins()
print("written", sys.argv[2])
