"""tools/pick_bench_env.py: only chip-validated pure-RADIANCE_* bench
configs are ever persisted (guards the driver bench against
first-compiling unvalidated kernels; see BASELINE.md on compile-hang
wedges)."""

import json
import os
import subprocess
import sys

LOG = """=== chain start Tue
=== [A1] python bench.py Tue Aug 18 05:00:00 UTC 2026
{"metric": "traversal_mrays_per_sec_1Mtri_1080p", "value": 7.9, "unit": "Mrays/s"}
rc=0
=== [A2] RADIANCE_WS=1 python bench.py Tue
{"metric": "traversal_mrays_per_sec_1Mtri_1080p", "value": 10.4, "unit": "Mrays/s"}
=== [A5] env RADIANCE_WS=1 RADIANCE_WSG=16 python bench.py Tue
{"metric": "traversal_mrays_per_sec_1Mtri_1080p", "value": 11.2, "unit": "Mrays/s"}
=== [B1] PALLAS_AXON_REMOTE_COMPILE=0 RADIANCE_TREELET=1 python bench.py Tue
{"metric": "traversal_mrays_per_sec_1Mtri_1080p", "value": 15.0, "unit": "Mrays/s"}
=== [D1] python bench.py --engine Tue
{"metric": "engine_mrays_per_sec_1Mtri_1080p", "value": 3.0, "unit": "Mrays/s"}
=== [X1] RADIANCE_WS=1 python bench.py Tue
{"metric": "traversal_mrays_per_sec_1Mtri_1080p", "value": 99.0, "error": "accelerator unresponsive"}
=== [I1] RADIANCE_BENCH_SCENE=interior RADIANCE_WS=1 python bench.py Tue
{"metric": "traversal_mrays_per_sec_1Mtri_1080p", "value": 55.0, "unit": "Mrays/s"}
"""


def _repo():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_picker_selects_best_pure_radiance_config(tmp_path):
    sys.path.insert(0, os.path.join(_repo(), "tools"))
    import pick_bench_env

    log = tmp_path / "chain.log"
    log.write_text(LOG)
    runs = pick_bench_env.parse(str(log))
    vals = sorted(v for v, _ in runs)
    # 3.0 (--engine), 99.0 (error), and 55.0 (different workload:
    # RADIANCE_BENCH_SCENE) excluded; 15.0 kept -- the local-compile
    # hatch PALLAS_AXON_REMOTE_COMPILE=0 is replayable because
    # bench.py re-execs itself to apply it (apply_bench_env)
    assert vals == [7.9, 10.4, 11.2, 15.0]
    best, env = max(runs, key=lambda r: r[0])
    assert best == 15.0
    assert env == {"PALLAS_AXON_REMOTE_COMPILE": "0",
                   "RADIANCE_TREELET": "1"}


def test_bench_applies_env_with_setdefault(tmp_path, monkeypatch):
    cache = os.path.join(_repo(), ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, "bench_env")
    existed = os.path.exists(path)
    backup = open(path).read() if existed else None
    try:
        with open(path, "w") as f:
            f.write("# test\nRADIANCE_WS=1\nRADIANCE_WSG=16\n")
        r = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r)\n"
             "import os\n"
             "os.environ['RADIANCE_WSG'] = '8'\n"
             "import bench\n"
             "bench.apply_bench_env()\n"
             "print(os.environ['RADIANCE_WS'], os.environ['RADIANCE_WSG'])"
             % _repo()],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-500:]
        # file value applied; explicit env untouched
        assert r.stdout.strip().split("\n")[-1] == "1 8"
    finally:
        if existed:
            with open(path, "w") as f:
                f.write(backup)
        else:
            os.remove(path)
