"""One-off: warm min-of-N wall timing for a list of gate queries.

Usage: python scripts/_abtime.py <reps> <query> [query...]
Prints one line per query: name min median [all reps].
"""

import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from leftshove_spark import queries as Q  # noqa: E402
from leftshove_spark.ext import cache  # noqa: E402
from leftshove_spark.session import get_spark  # noqa: E402

reps = int(sys.argv[1])
names = sys.argv[2:]
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="abtime")
for name in names:  # warmup each once
    Q.QUERIES[name](spark, sf).collect()
    cache.release_pins()

res = {n: [] for n in names}
for _ in range(reps):
    for name in names:
        t0 = time.perf_counter()
        Q.QUERIES[name](spark, sf).collect()
        res[name].append(time.perf_counter() - t0)
        cache.release_pins()

print(f"TREE={HERE}")
for name in names:
    xs = res[name]
    print(
        f"  {name:<28s} min {min(xs):6.2f}  med {statistics.median(xs):6.2f}  "
        + " ".join(f"{x:.2f}" for x in xs)
    )
