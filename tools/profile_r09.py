"""Per-stage profiling of the four e2e bench lines (r9 optimization).

Runs each e2e pipeline once in a session with the Spark event log
enabled, then aggregates per-job wall time by job description (the
pipelines label their stages with ``setJobDescription`` — guide §1.5),
so the expensive SEGMENT of each line is measured, not guessed.

    python tools/profile_r09.py [houses|corpus|media|paired ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENT_DIR = "/tmp/spark-events-r09"


def run(which: list[str]) -> None:
    os.makedirs(EVENT_DIR, exist_ok=True)
    from geoestate_etl_spark.session import get_spark

    spark = get_spark(
        "profile-r09",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVENT_DIR,
        },
    )
    import bench

    # warm JVM + python workers like the bench does
    bench.force(
        spark.read.parquet(os.path.join(bench.SF_DIR, "region.parquet"))
    )
    app_id = spark.sparkContext.applicationId
    wall = {}
    for name in which:
        t0 = time.perf_counter()
        if name == "houses":
            med, detail = bench.bench_houses_pipeline(spark, reps=1)
            print("houses detail:", json.dumps(detail["reps"]))
        elif name == "corpus":
            print("corpus:", bench.bench_corpus_pipeline(spark))
        elif name == "media":
            print("media:", bench.bench_media_pipeline(spark))
        elif name == "paired":
            print("paired:", bench.bench_paired_pipeline(spark))
        wall[name] = round(time.perf_counter() - t0, 3)
    spark.stop()
    print("wall:", json.dumps(wall))
    summarize(os.path.join(EVENT_DIR, app_id))


def _iter_event_lines(log_path: str):
    """Yield event-log JSON lines; handles the rolling v2 directory
    layout (``eventlog_v2_<app>/events_*``) and zstd compression."""
    paths = [log_path]
    if os.path.isdir(log_path):
        paths = sorted(
            os.path.join(log_path, f)
            for f in os.listdir(log_path)
            if f.startswith("events_")
        )
    for p in paths:
        if p.endswith(".zstd"):
            import pyarrow as pa

            with pa.CompressedInputStream(pa.OSFile(p), "zstd") as f:
                data = f.read().decode()
            yield from data.splitlines()
        else:
            with open(p) as fh:
                yield from fh


def summarize(log_path: str) -> None:
    """Aggregate job wall time per job description from the event log."""
    starts = {}
    agg = {}  # description -> [n_jobs, total_secs]
    order = []
    if not os.path.exists(log_path):
        alt = os.path.join(
            os.path.dirname(log_path),
            "eventlog_v2_" + os.path.basename(log_path),
        )
        if os.path.exists(alt):
            log_path = alt
    if True:
        for line in _iter_event_lines(log_path):
            ev = json.loads(line)
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description"
                ) or "(unlabelled)"
                starts[ev["Job ID"]] = (desc, ev["Submission Time"])
            elif et == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in starts:
                    desc, t0 = starts.pop(jid)
                    dt = (ev["Completion Time"] - t0) / 1000.0
                    if desc not in agg:
                        agg[desc] = [0, 0.0]
                        order.append(desc)
                    agg[desc][0] += 1
                    agg[desc][1] += dt
    print(f"\n=== per-description job time ({log_path}) ===")
    for desc in sorted(order, key=lambda d: -agg[d][1]):
        n, t = agg[desc]
        print(f"{t:9.3f}s  {n:4d} jobs  {desc}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("/")]
    if args and os.path.exists(args[0]):
        summarize(args[0])
    else:
        run(args or ["houses", "corpus", "media", "paired"])
