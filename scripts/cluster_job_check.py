"""`ray job submit` execution-shape check.

The north rule runs the engine via `ray job submit` against a live
multi-node cluster. The job server can't run here (dashboard is
disabled in the sandbox), but its essential contract CAN: the CLI
process is started with RAY_ADDRESS pointing at an ALREADY-RUNNING
cluster and must connect to it (ray.init(address="auto")) instead of
booting a private local instance — exactly what a submitted job driver
does.

This script boots a 2-node cluster (head driver-only + one 4-CPU
worker), then runs `python -m tilemaker_ray <pages> <out.mbtiles>` as
a subprocess with RAY_ADDRESS=<cluster address>, and verifies the CLI
(a) reported connecting to the existing cluster and (b) produced a
readable mbtiles. ray.init(address="auto") raises when no cluster is
reachable at RAY_ADDRESS, so success proves the connection happened.
"""
from __future__ import annotations

import os
import sqlite3
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import ray
    from ray.cluster_utils import Cluster

    from tilemaker_ray.sources.pages import pages_path

    pages = pages_path(2000)
    out = "/tmp/cluster_job_check.mbtiles"
    if os.path.exists(out):
        os.remove(out)

    cluster = Cluster(
        initialize_head=True,
        head_node_args={"num_cpus": 0, "include_dashboard": False,
                        "object_store_memory": 1 << 30})
    cluster.add_node(num_cpus=4, object_store_memory=1 << 30)
    try:
        env = dict(os.environ)
        env["RAY_ADDRESS"] = cluster.address
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        p = subprocess.run(
            [sys.executable, "-m", "tilemaker_ray", pages, out],
            capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
        if p.returncode != 0:
            print("FAIL: CLI exited", p.returncode)
            print(p.stdout[-1500:], p.stderr[-1500:])
            return 1
        if "Connecting to existing Ray cluster" not in p.stdout:
            print("FAIL: CLI did not take the existing-cluster path")
            print(p.stdout[-1500:])
            return 1
        con = sqlite3.connect(out)
        n = con.execute("SELECT count(*) FROM tiles").fetchone()[0]
        con.close()
        if n <= 0:
            print("FAIL: empty mbtiles")
            return 1
        print(f"JOB OK tiles={n}")
        return 0
    finally:
        cluster.shutdown()


if __name__ == "__main__":
    sys.exit(main())
