#!/usr/bin/env python
"""Pick the fastest VALIDATED bench configuration from a measurement
log and persist it for future bench.py runs.

The recovery/measurement orchestrator (see BASELINE.md) runs bench.py
under many env configurations; each run in its log looks like

    === [TAG] RADIANCE_WS=1 ... python bench.py <date>
    ...
    {"metric": "traversal_mrays_per_sec_1Mtri_1080p", "value": 12.3, ...}
    rc=0

Only configurations that actually compiled AND ran on the chip appear
with a JSON value, so persisting the argmax can never make the driver
bench first-compile an unvalidated kernel (remote Mosaic compile hangs
wedge the device queue for hours -- the failure mode this guards).

Writes KEY=VAL lines to .bench_cache/bench_env; bench.py applies them
with os.environ.setdefault, so explicit env always wins.

Usage: python tools/pick_bench_env.py <log> [<log> ...] [--dry]
(multiple logs are merged; missing files are skipped)
"""
import json
import os
import re
import sys

HEAD = re.compile(r"^=== \[(\w+)\] (.*?)python bench\.py\s*$|"
                  r"^=== \[(\w+)\] (.*?)python bench\.py (\w{3} .*)$")
METRIC = "traversal_mrays_per_sec_1Mtri_1080p"


def parse(log_path):
    runs = []
    cur_env = None
    with open(log_path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith("=== ["):
                cur_env = None
                m = re.match(r"^=== \[\w+\] (.*)$", line)
                if m and "python bench.py" in m.group(1) \
                        and "--" not in m.group(1):
                    body = m.group(1).split("python bench.py")[0]
                    toks = [t for t in body.split()
                            if "=" in t and t != "env"]
                    cur_env = dict(t.split("=", 1) for t in toks)
            elif cur_env is not None \
                    and line.startswith("# bench_env applied:"):
                # the run ALSO ran under these setdefaulted vars (the
                # previously-picked best config); they are part of the
                # measured configuration.  Explicit env still wins.
                for t in line.split(":", 1)[1].split():
                    if "=" in t:
                        k, v = t.split("=", 1)
                        cur_env.setdefault(k, v)
            elif cur_env is not None and line.startswith("{"):
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rec.get("metric") == METRIC and "error" not in rec:
                    # only pure RADIANCE_* configs are safe to replay
                    # from inside bench.py: PALLAS_AXON_REMOTE_COMPILE
                    # may be consumed at interpreter start
                    # (sitecustomize), and silently losing it would
                    # send a treelet compile to the remote Mosaic --
                    # the hang this tool exists to avoid
                    # RADIANCE_BENCH_SCENE changes the WORKLOAD, not
                    # the kernel config -- persisting it would flip
                    # the headline bench to a different scene
                    # PALLAS_AXON_REMOTE_COMPILE=0 is replayable since
                    # bench.py re-execs itself to apply it (see
                    # apply_bench_env); any other non-RADIANCE key is
                    # not.
                    if all(k.startswith("RADIANCE_")
                           or (k, v) == ("PALLAS_AXON_REMOTE_COMPILE",
                                         "0")
                           for k, v in cur_env.items()) \
                            and "RADIANCE_BENCH_SCENE" not in cur_env:
                        runs.append((float(rec["value"]),
                                     dict(cur_env)))
    return runs


def main():
    logs = [a for a in sys.argv[1:] if not a.startswith("--")] \
        or ["/tmp/tpu_chain.log"]
    runs = []
    for log in logs:
        if not os.path.exists(log):
            print(f"# skipping missing log {log}")
            continue
        runs.extend(parse(log))
    if not runs:
        print("no successful bench runs found; nothing written")
        return 1
    runs.sort(key=lambda r: -r[0])
    best, env = runs[0]
    print(f"best: {best} Mrays/s with {env or '(default env)'}")
    for v, e in runs[1:]:
        print(f"      {v} Mrays/s with {e or '(default env)'}")
    if "--dry" in sys.argv:
        return 0
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.join(repo, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    out = os.path.join(cache, "bench_env")
    with open(out, "w") as f:
        f.write(f"# picked from {' '.join(logs)}: {best} Mrays/s\n")
        for k, v in sorted(env.items()):
            f.write(f"{k}={v}\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
