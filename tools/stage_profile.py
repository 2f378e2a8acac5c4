"""Per-stage time breakdown for headline queries (guide §1: measure
first).  Runs each query warm (one sf0.001 pass + one untimed sf run),
then times one run with the Spark UI enabled and dumps per-job/stage
wall-clock + task metrics from the UI REST API, labeled by query.

Usage: python tools/stage_profile.py [query ...]   (default: HEADLINE)
Output: /tmp/stage_profile.json + human summary on stdout.
"""
from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from guidewire_spark.plans.session import get_spark
from guidewire_spark.registry import all_queries
from bench import HEADLINE

names = sys.argv[1:] or HEADLINE
sf_dir = __import__("os").environ.get("PROFILE_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(
    app_name="stage-profile", extra_conf={"spark.ui.enabled": "true"}
)
sc = spark.sparkContext
specs = all_queries()
from guidewire_spark.operators.twophase import clear_two_phase_pins

ui = "http://localhost:4040/api/v1"
app_id = sc.applicationId


def _ms(iso: str) -> int:
    from datetime import datetime

    return int(
        datetime.strptime(iso.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .timestamp()
        * 1000
    )


def rest(path: str):
    with urllib.request.urlopen(f"{ui}/applications/{app_id}{path}") as r:
        return json.load(r)


spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
warm_dir = "/root/testdata/sf0.001"
for name in names:
    try:
        specs[name].fn(spark, warm_dir).count()
        clear_two_phase_pins()
        specs[name].fn(spark, sf_dir).count()  # steady-state warm
    except Exception as exc:
        print(f"# warmup {name} failed: {exc}", file=sys.stderr)

out = {}
for name in names:
    clear_two_phase_pins()
    jobs_before = {j["jobId"] for j in rest("/jobs")}
    sc.setJobDescription(f"profile:{name}")
    t0 = time.perf_counter()
    specs[name].fn(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    sc.setJobDescription(None)
    jobs = [j for j in rest("/jobs") if j["jobId"] not in jobs_before]
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    stages = []
    for sid in stage_ids:
        try:
            for att in rest(f"/stages/{sid}"):
                if att["status"] == "SKIPPED":
                    stages.append({"stageId": sid, "skipped": True})
                    continue
                stages.append(
                    {
                        "stageId": sid,
                        "name": att["name"].split("\n")[0][:80],
                        "tasks": att["numCompleteTasks"],
                        "wall_ms": (
                            _ms(att.get("completionTime"))
                            - _ms(att.get("firstTaskLaunchedTime"))
                            if att.get("completionTime")
                            and att.get("firstTaskLaunchedTime")
                            else None
                        ),
                        "executorRunTime_ms": att["executorRunTime"],
                        "executorCpuTime_ms": att["executorCpuTime"] // 1_000_000,
                        "shuffle_read_mb": round(
                            att["shuffleReadBytes"] / 1e6, 2
                        ),
                        "shuffle_write_mb": round(
                            att["shuffleWriteBytes"] / 1e6, 2
                        ),
                        "input_mb": round(att["inputBytes"] / 1e6, 2),
                    }
                )
        except Exception:
            pass
    out[name] = {
        "wall_s": round(wall, 3),
        "n_jobs": len(jobs),
        "n_stages": len(stage_ids),
        "stages": stages,
    }
    real = [s for s in stages if not s.get("skipped")]
    print(
        f"{name}: {wall:.3f}s  jobs={len(jobs)} stages={len(stage_ids)}"
        f" (run {len(real)}, skipped {len(stages) - len(real)})"
    )
    for s in real:
        print(
            f"    [{s['stageId']:>4}] wall={s['wall_ms']}ms "
            f"run={s['executorRunTime_ms']}ms cpu={s['executorCpuTime_ms']}ms "
            f"tasks={s['tasks']} in={s['input_mb']}MB "
            f"sr={s['shuffle_read_mb']}MB sw={s['shuffle_write_mb']}MB  {s['name']}"
        )


Path("/tmp/stage_profile.json").write_text(json.dumps(out, indent=1))
print("wrote /tmp/stage_profile.json")
spark.stop()
