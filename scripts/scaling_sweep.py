"""SCALING.md sweep: time a set of query ids at one SF dir under the BENCH
protocol (fresh JVM per invocation, warm-discarded + best-of-2 per id, noop
sink) and print one JSON line {qid: sec}.

Run once per SF dir — a FRESH process per sweep is part of the protocol
(round 7 measured long-session sweeps inflating tails 1.6x via heap
pressure):

    python scripts/scaling_sweep.py /root/testdata/sf0.1  q1 q2 ...
    python scripts/scaling_sweep.py testdata_sf1 q1 q2 ...
    python scripts/scaling_sweep.py testdata_sf3 q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from mini_project_big_data_analysis_spark.queries import all_queries  # noqa: E402
from mini_project_big_data_analysis_spark.session import get_spark  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    if "--stream-budget" in argv:
        # Same env plumbing as check_queries: a tier sweep over the stream
        # ids must be able to raise the 300 s availableNow budget without
        # exporting env by hand (VERDICT r11).
        i = argv.index("--stream-budget")
        budget = float(argv[i + 1])
        del argv[i : i + 2]
        os.environ["SPARK_GRAFT_STREAM_BUDGET_S"] = str(budget)
        from mini_project_big_data_analysis_spark.streaming import pipeline

        pipeline.STREAM_BUDGET_S = budget
    sf_dir = argv[0]
    ids = argv[1:]
    spark = get_spark(app_name="mpbda-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    def run_once(qid: str) -> float:
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        registry[qid].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    run_once(ids[0])  # JVM warm-up, discarded
    out = {}
    for qid in ids:
        run_once(qid)  # per-id warm (codegen/worker spin-up), discarded
        out[qid] = round(min(run_once(qid) for _ in range(2)), 3)
        print(f"# {sf_dir} {qid}: {out[qid]}", file=sys.stderr)
        spark.catalog.clearCache()
    print(json.dumps({"sf_dir": sf_dir, "timings": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
