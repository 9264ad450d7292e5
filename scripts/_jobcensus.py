"""One-off (session evidence): run one gate query and dump every Spark
job it launched — description, stage task counts, duration — from the
status store, so structural waste is visible independent of host noise.

Usage: python scripts/_jobcensus.py <query> [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from leftshove_spark import queries as Q  # noqa: E402
from leftshove_spark.ext import cache  # noqa: E402
from leftshove_spark.session import get_spark  # noqa: E402

name = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

spark = get_spark(app_name="jobcensus")
# warmup: run once so JIT/caches settle, release pins, then census run
Q.QUERIES[name](spark, sf).collect()
cache.release_pins()

tracker = spark.sparkContext.statusTracker()
before = set(tracker.getJobIdsForGroup(None) or [])
spark.sparkContext.setJobDescription(f"census:{name}")
t0 = time.perf_counter()
rows = Q.QUERIES[name](spark, sf).collect()
wall = time.perf_counter() - t0
cache.release_pins()

jstore = spark.sparkContext._jsc.sc().statusStore()
jobs = jstore.jobsList(None)
n = jobs.size()
total_tasks = 0
print(f"== {name}: wall {wall:.2f}s, {len(rows)} rows ==")
recs = []
for i in range(n):
    j = jobs.apply(i)
    jid = j.jobId()
    if jid in before:
        continue
    dur = (j.completionTime().get().getTime() - j.submissionTime().get().getTime()) / 1000.0 if j.completionTime().isDefined() else -1
    recs.append((jid, dur, j.numTasks(), j.numCompletedStages(), str(j.description().get() if j.description().isDefined() else "")[:80]))
    total_tasks += j.numTasks()
for jid, dur, nt, ns, desc in sorted(recs):
    print(f"  job {jid:>4} {dur:7.2f}s tasks={nt:<5} stages={ns:<3} {desc}")
print(f"  TOTAL {len(recs)} jobs, {total_tasks} tasks")
