"""Attribute per-job wall time vs summed task time from a Spark event log.

Usage: python tools/evlog_analyze.py <eventlog-file-or-dir> [cores]

For each job: wall = completion - submission; task_sec = sum of task run
times; ideal = task_sec / cores. wall - ideal approximates the job's
non-scaling share (driver planning, broadcast builds, scheduling gaps,
serial tails). Jobs are listed chronologically with their first stage
name so they can be mapped to round phases; gaps BETWEEN jobs (driver
think time: Catalyst planning of the next action, Py4J, python driver
code) are aggregated separately.
"""

from __future__ import annotations

import json
import os
import sys


def load_events(path: str):
    if os.path.isdir(path):
        files = [os.path.join(path, f) for f in os.listdir(path) if not f.startswith(".")]
        path = max(files, key=os.path.getmtime)
    with open(path) as f:
        for line in f:
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                continue


def main():
    path = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    jobs: dict[int, dict] = {}
    stage_task_ms: dict[int, float] = {}
    stage_tasks: dict[int, int] = {}
    stage_name: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    app_start = app_end = None
    for ev in load_events(path):
        e = ev.get("Event")
        if e == "SparkListenerApplicationStart":
            app_start = ev["Timestamp"]
        elif e == "SparkListenerApplicationEnd":
            app_end = ev["Timestamp"]
        elif e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "id": jid,
                "start": ev["Submission Time"],
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description",
                    (ev.get("Properties") or {}).get("callSite.short", ""),
                ),
            }
            for s in ev.get("Stage Infos", []):
                stage_name[s["Stage ID"]] = s.get("Stage Name", "")
                stage_job[s["Stage ID"]] = jid
        elif e == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            info = ev.get("Task Info", {})
            dur = info.get("Finish Time", 0) - info.get("Launch Time", 0)
            stage_task_ms[sid] = stage_task_ms.get(sid, 0.0) + dur
            stage_tasks[sid] = stage_tasks.get(sid, 0) + 1

    ordered = sorted(jobs.values(), key=lambda j: j["start"])
    total_wall = total_ideal = 0.0
    prev_end = app_start
    gap_total = 0.0
    print(f"{'job':>4} {'gap_s':>6} {'wall_s':>7} {'task_s':>8} {'ideal_s':>8} {'fixed_s':>8}  first-stage")
    for j in ordered:
        if "end" not in j:
            continue
        task_ms = sum(stage_task_ms.get(s, 0.0) for s in j["stages"])
        ntasks = sum(stage_tasks.get(s, 0) for s in j["stages"])
        wall = (j["end"] - j["start"]) / 1000.0
        ideal = task_ms / 1000.0 / cores
        gap = max(0.0, (j["start"] - prev_end) / 1000.0) if prev_end else 0.0
        # concurrent jobs: a job starting before the previous ended has gap 0
        prev_end = max(prev_end or j["end"], j["end"])
        gap_total += gap
        total_wall += wall
        total_ideal += ideal
        names = [stage_name.get(s, "") for s in j["stages"]]
        first = names[-1][:70] if names else ""
        print(
            f"{j['id']:>4} {gap:>6.2f} {wall:>7.2f} {task_ms/1000:>8.1f} {ideal:>8.2f} "
            f"{max(0.0, wall - ideal):>8.2f}  {first} [{ntasks}t] {j['desc'][:40]}"
        )
    app_wall = ((app_end or prev_end) - app_start) / 1000.0 if app_start else 0.0
    print(
        f"\napp wall {app_wall:.1f}s | sum job wall {total_wall:.1f}s | "
        f"sum ideal {total_ideal:.1f}s | sum inter-job gap {gap_total:.1f}s | "
        f"sum fixed-in-job {max(0.0, total_wall - total_ideal):.1f}s"
    )
    by_desc: dict[str, list[float]] = {}
    for j in ordered:
        if "end" not in j:
            continue
        task_ms = sum(stage_task_ms.get(s, 0.0) for s in j["stages"])
        wall = (j["end"] - j["start"]) / 1000.0
        d = by_desc.setdefault(j["desc"] or "(untagged)", [0.0, 0.0, 0])
        d[0] += wall
        d[1] += max(0.0, wall - task_ms / 1000.0 / cores)
        d[2] += 1
    print(f"\n{'description':<28} {'jobs':>4} {'wall_s':>8} {'fixed_s':>8}")
    for desc, (w, fx, n) in sorted(by_desc.items(), key=lambda kv: -kv[1][1]):
        print(f"{desc[:28]:<28} {n:>4} {w:>8.1f} {fx:>8.1f}")


if __name__ == "__main__":
    main()
