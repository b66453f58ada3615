"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8 from
N to 4N executors). No real cluster in the sandbox, so the same job runs
on identical input at several parallelism shapes, one subprocess each
(two SparkSessions in one JVM contaminate each other's timing — measured
2.4x slowdown on the second session):

- local[8] / local[32]      — one shared JVM, 8 vs 32 threads (round 1/2)
- local-cluster[1,8,M] / local-cluster[4,8,M] — MULTI-JVM executors: the
  direct sandbox analogue of N vs 4N executors (each executor is its own
  JVM with its own heap, GC and python workers), and the experiment that
  isolates the shared-JVM-inflation theory from BENCH/BASELINE.md: if
  4x8-core executor JVMs beat one 32-thread JVM on the same work, the
  single-JVM efficiency ceiling is memory-bus/GC contention, not plan
  serialization.

Reports throughput per leg, efficiency T(4N)/(4*T(N)) for both the
shared-JVM and the multi-JVM pair, and asserts crawl-order + URL-seen
equality across ALL legs (determinism contract).  Appends the
measurement to BENCH/BASELINE.md.

Round 5: north-rule legs are WEATHER-GATED (--gate, default on for full
runs): the bare-kernel saturation probe runs first and the legs only
count as scaling evidence when the kernel itself still gains from 8 to
32 workers in the same window (ratio >= --gate-threshold, default 1.2);
a saturated window is recorded as a dated rejected-window note instead —
measuring the plan through a contended memory bus reports the box, not
the plan.  --attempts N re-rolls the probe (sleeping between rolls)
until a window qualifies or attempts run out.  Every BENCH/BASELINE.md
append carries the probe result.

Usage: python scripts/scaling_bench.py [n_urls] [--quick] [--no-gate]
           [--gate-threshold=1.2] [--attempts=1] [--attempt-sleep=60]
       python scripts/scaling_bench.py --run <master> <n_urls> <out_json>
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # saturation_probe

# sized for the wide-row decode stage: an 8-core executor holds ~8
# concurrent 50 KB/row columnar batches + shuffle buffers; 6 GB heaps
# died with worker-shutdown OOMs at the 480k-URL input.
EXEC_MEM_MB = 16384

LEGS = [
    ("local8", "local[8]"),
    ("local32", "local[32]"),
    ("cluster1x8", f"local-cluster[1,8,{EXEC_MEM_MB}]"),
    ("cluster4x8", f"local-cluster[4,8,{EXEC_MEM_MB}]"),
]


def run_one(master: str, n_urls: int, out_json: str) -> None:
    from crawler_core_spark.plans.bench_job import run_crawl_job
    from crawler_core_spark.session import get_spark
    from crawler_core_spark.storage import TableStore

    # local-cluster executors are SEPARATE JVMs: their python workers must
    # be able to import crawler_core_spark (module-level pandas UDFs
    # pickle by reference) — ship the repo root on the executor PYTHONPATH
    # (the sandbox stand-in for spark-submit --py-files).
    os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    conf = {"spark.executorEnv.PYTHONPATH": REPO}
    if master.startswith("local-cluster"):
        # the bracket's third field is only the WORKER's advertised
        # capacity; the executor heap is spark.executor.memory (default
        # 1g — which OOM'd the 480k decode stage with exit code 52).
        # Size the heap to the declared capacity.
        cap_mb = int(master.rstrip("]").split(",")[-1])
        conf["spark.executor.memory"] = f"{cap_mb}m"
    spark = get_spark(app_name=f"scaling-{master}", master=master, extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    r = run_crawl_job(spark, n_urls, keep_store=True)
    store = TableStore(spark, r["store_root"])
    rows = store.read("results").select("seq", "crawl_pos", "url_canon").collect()
    r["order"] = sorted(
        [r_["seq"], r_["crawl_pos"]] for r_ in rows if r_["crawl_pos"] is not None
    )
    r["seen"] = sorted({r_["url_canon"] for r_ in rows if r_["crawl_pos"] is not None})
    with open(out_json, "w") as f:
        json.dump(r, f)
    spark.stop()


def _flag(name: str, default):
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return type(default)(a.split("=", 1)[1])
    return default


def _append_baseline(title: str, payload: dict) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write(f"\n### {title}\n\n```json\n")
        f.write(json.dumps(payload, indent=2))
        f.write("\n```\n")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        run_one(sys.argv[2], int(sys.argv[3]), sys.argv[4])
        return

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_urls = int(args[0]) if args else 120_000
    legs = LEGS[:2] if "--quick" in sys.argv else LEGS

    probe = None
    if "--no-gate" not in sys.argv:
        import time as _time

        from saturation_probe import probe_ratio

        threshold = _flag("gate-threshold", 1.2)
        attempts = _flag("attempts", 1)
        sleep_s = _flag("attempt-sleep", 60.0)
        rejected = []
        for i in range(attempts):
            if i:
                _time.sleep(sleep_s)
            probe = probe_ratio()
            print(json.dumps({"probe": probe}))
            if probe["kernel_ratio"] >= threshold:
                break
            rejected.append(probe)
        else:
            # no qualifying window: keep the attempt on the books (the
            # VERDICT's explicit ask), never silently drop it
            _append_baseline(
                "scaling window REJECTED by weather gate",
                {
                    "n_urls": n_urls,
                    "gate_threshold": threshold,
                    "probes": rejected,
                    "note": (
                        "bare decode kernel did not scale 8->32 in any "
                        "probed window; north-rule legs not run (a "
                        "saturated memory bus measures the box, not the "
                        "plan)"
                    ),
                },
            )
            print(json.dumps({"gated": True, "probes": rejected}))
            sys.exit(3)

    results = {}
    for label, master in legs:
        out = f"/tmp/scaling_{label}.json"
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", master,
             str(n_urls), out],
            check=True, cwd=REPO,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        with open(out) as f:
            results[label] = json.load(f)
        shutil.rmtree(results[label].pop("store_root"), ignore_errors=True)

    base = legs[0][0]
    same_order = all(
        results[lb]["order"] == results[base]["order"] for lb, _ in legs[1:]
    )
    same_seen = all(
        results[lb]["seen"] == results[base]["seen"] for lb, _ in legs[1:]
    )
    for lb, _ in legs:
        results[lb].pop("order"), results[lb].pop("seen")

    tput = {lb: results[lb]["urls_per_sec"] for lb, _ in legs}
    out = {
        "n_urls": n_urls,
        "throughput_urls_per_sec": {k: round(v, 1) for k, v in tput.items()},
        "crawl_order_equal": same_order,
        "url_seen_equal": same_seen,
    }
    if "local32" in tput:
        out["eff_shared_jvm_8_to_32"] = round(tput["local32"] / (4 * tput["local8"]), 3)
    if "cluster4x8" in tput and "cluster1x8" in tput:
        out["eff_executors_1_to_4"] = round(
            tput["cluster4x8"] / (4 * tput["cluster1x8"]), 3
        )
        out["multi_jvm_vs_shared_jvm_32c"] = round(
            tput["cluster4x8"] / tput["local32"], 2
        ) if "local32" in tput else None
    if probe is not None:
        # the legs take minutes; a window that PASSED the gate at probe
        # time can close before the later legs run (measured: a 1.489x
        # probe followed by an inverted 32-thread leg).  Probe again
        # AFTER the legs and only attribute the roll when the window
        # held across the whole measurement — otherwise the entry is
        # recorded but marked not-attributable.  probe_ratio and
        # threshold are the gate block's own bindings — window_held MUST
        # be judged against the same threshold the gate used.
        probe_after = probe_ratio()
        out["weather_probe"] = probe
        out["weather_probe_after"] = probe_after
        out["window_held"] = bool(
            min(probe["kernel_ratio"], probe_after["kernel_ratio"]) >= threshold
        )
    print(json.dumps(out))

    _append_baseline("scaling legs (round 5 weather-gated harness)", out)


if __name__ == "__main__":
    main()
