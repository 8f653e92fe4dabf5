"""Checkpoint-resume check: SIGKILL the job mid-run, resume, same tiles.

The north rule requires the job to resume from its checkpoint manifest
after failure.  This script:

  1. runs a clean resumable build (fresh process) -> reference tiles
  2. starts the same build on a FRESH output dir in a subprocess and
     SIGKILLs the whole process group as soon as the manifest shows
     the first finished partitions (driver + raylet die mid-job)
  3. reruns the build on the killed output dir: the manifest must show
     >=1 partition skipped (work survived the kill) and the final
     tile set must be byte-identical (per-tile MVT md5) to the clean
     reference

Run:   python scripts/resume_kill_check.py            (orchestrator)
       python scripts/resume_kill_check.py --leg OUT  (one build leg)
Invoked as a subprocess by tests/test_multinode.py.
"""
from __future__ import annotations

import glob
import hashlib
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = 2000


def leg(out: str) -> None:
    """One resumable build in this process's own Ray session."""
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from tilemaker_ray.pipelines.resumable import run_resumable
    from tilemaker_ray.sources.pages import pages_path
    stats = run_resumable(pages_path(N_ROWS), out)
    print("LEG_STATS " + json.dumps(stats), flush=True)
    ray.shutdown()


def _tile_hashes(out: str) -> dict:
    import pandas as pd
    rows = {}
    for f in glob.glob(os.path.join(out, "tiles", "*.parquet")):
        df = pd.read_parquet(f)
        for z, x, y, m in zip(df["zoom"], df["tile_x"], df["tile_y"],
                              df["mvt"]):
            rows[(int(z), int(x), int(y))] = hashlib.md5(bytes(m)).hexdigest()
    return rows


def _spawn(out: str) -> subprocess.Popen:
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--leg", out],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env, cwd=REPO, start_new_session=True)


def main() -> int:
    import shutil
    clean_out = "/tmp/resume_kill_clean"
    kill_out = "/tmp/resume_kill_victim"
    for d in (clean_out, kill_out):
        shutil.rmtree(d, ignore_errors=True)

    # 1. clean reference
    p = _spawn(clean_out)
    p.wait(timeout=300)
    if p.returncode != 0:
        print("FAIL: clean leg exited", p.returncode)
        return 1
    clean = _tile_hashes(clean_out)

    # 2. kill mid-run: wait for the first manifest rows, then SIGKILL
    #    the whole process group (driver + its raylet)
    p = _spawn(kill_out)
    mdir = os.path.join(kill_out, "_manifest")
    deadline = time.time() + 240
    killed = False
    while time.time() < deadline and p.poll() is None:
        done = sum(1 for f in glob.glob(os.path.join(mdir, "*.jsonl"))
                   for _ in open(f))
        if done >= 5:
            os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            killed = True
            break
        time.sleep(0.05)
    p.wait(timeout=60)
    if not killed:
        print("FAIL: run finished before any kill opportunity "
              "(exit", p.returncode, ") — raise N_ROWS")
        return 1

    # 3. resume on the killed dir
    p = _spawn(kill_out)
    out_lines = p.communicate(timeout=300)[0]
    if p.returncode != 0:
        print("FAIL: resume leg exited", p.returncode)
        return 1
    stats = json.loads(
        [ln for ln in out_lines.splitlines()
         if ln.startswith("LEG_STATS ")][-1][len("LEG_STATS "):])
    if stats["partitions_done_before"] < 1:
        print("FAIL: resume found no surviving partitions", stats)
        return 1
    resumed = _tile_hashes(kill_out)
    if set(clean) != set(resumed):
        print(f"FAIL: tile-set mismatch "
              f"({len(set(clean) ^ set(resumed))} keys differ)")
        return 1
    diff = [k for k in clean if clean[k] != resumed[k]]
    if diff:
        print(f"FAIL: byte mismatch on {len(diff)} tiles")
        return 1
    print(f"RESUME OK tiles={len(clean)} "
          f"survived={stats['partitions_done_before']} "
          f"of {stats['partitions_total']} partitions")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--leg":
        leg(sys.argv[2])
        sys.exit(0)
    sys.exit(main())
