#!/usr/bin/env python
"""Summarize a chip measurement-chain log into a markdown table.

Reads the `=== [TAG] env... cmd date / {json} / rc=N` structure that
tools/chip_chain_r*.sh writes (same shape pick_bench_env.py parses) and
prints one markdown row per step: tag, the explicit env knobs, every
JSON metric line the step printed, and the step's rc.  Used to draft
the BASELINE.md round tables from .bench_cache/chain_r4.log without
hand-transcription errors.

Usage: python tools/chain_summary.py .bench_cache/chain_r4.log [...]
"""
import json
import re
import sys

STEP = re.compile(r"^=== \[(\w+)\] (.*?)(?:python|bash) (.*)$")


def parse(path):
    steps = []
    cur = None
    with open(path) as f:
        for raw in f:
            line = raw.rstrip("\n")
            m = STEP.match(line)
            if m:
                cur = {"tag": m.group(1),
                       "env": [t for t in m.group(2).split()
                               if "=" in t],
                       "cmd": " ".join(m.group(3).split()[:2]),
                       "json": [], "rc": None}
                steps.append(cur)
                continue
            if cur is None:
                continue
            if line.startswith("rc="):
                cur["rc"] = int(line[3:])
                cur = None
            elif line.startswith("{"):
                try:
                    cur["json"].append(json.loads(line))
                except ValueError:
                    pass
    return steps


def fmt(steps):
    print("| step | env | metric | value | unit | rc |")
    print("|---|---|---|---|---|---|")
    for s in steps:
        env = " ".join(s["env"]) or "-"
        rc = "?" if s["rc"] is None else s["rc"]
        if not s["json"]:
            print(f"| {s['tag']} | {env} | - | - | - | {rc} |")
        for rec in s["json"]:
            metric = rec.get("metric", rec.get("config", "?"))
            val = rec.get("value", rec.get("agree", ""))
            unit = rec.get("unit", "")
            print(f"| {s['tag']} | {env} | {metric} | {val} | {unit} "
                  f"| {rc} |")


if __name__ == "__main__":
    allsteps = []
    for p in sys.argv[1:]:
        try:
            allsteps += parse(p)
        except OSError:
            pass
    fmt(allsteps)
