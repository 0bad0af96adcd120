"""Two-process CPU smoke of the multi-host helpers (VERDICT round-1 weak #9).

Launches two real python processes with ``jax.distributed.initialize`` over a
localhost coordinator and validates:

* ``mesh.process_allgather`` returns every process's contribution,
* ``mesh.local_batch_slice`` tiles the global batch disjointly,
* ``tools/statistics.gather_rows`` reassembles per-process rows on host 0
  (reference ``dist.gather_object``, ``compression_trainer.py:844-878``).
"""

import json
import os
import subprocess
import sys

import pytest

_WORKER = r"""
import json, os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2
sys.path.insert(0, "REPO_DIR")
sys.path.insert(0, "TOOLS_DIR")
from mlic_tpu.parallel.mesh import local_batch_slice, process_allgather
from statistics import gather_rows

g = np.asarray(process_allgather(np.full((2,), pid, np.float32)))
sl = local_batch_slice(8)
files = [f"img{i}.png" for i in range(5)]  # odd count: shard lengths 3 and 2
rows = [{"bpp": float(pid * 10 + i), "psnr": 30.0 + pid, "ms_ssim": 0.9}
        for i in range(len(files[pid::2]))]
full = gather_rows(rows, files, pid, 2, process_allgather)
if pid == 0:
    json.dump({"gathered": g.tolist(), "slice": [sl.start, sl.stop],
               "rows": full}, open(out, "w"))
"""


def test_two_process_allgather(tmp_path):
    port = 29765 + (os.getpid() % 512)
    worker = tmp_path / "worker.py"
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker.write_text(_WORKER.replace("TOOLS_DIR",
                                      os.path.join(repo_dir, "tools"))
                      .replace("REPO_DIR", repo_dir))
    out = tmp_path / "out.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(port), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=str(tmp_path)) for i in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-2000:]

    res = json.load(open(out))
    # allgather stacked both processes' arrays in process order
    assert res["gathered"] == [[0.0, 0.0], [1.0, 1.0]]
    assert res["slice"] == [0, 4]
    # gather_rows: 5 files round-robin over 2 procs -> 3 + 2 rows, names
    # reconstructed in process order
    names = [r["name"] for r in res["rows"]]
    assert names == ["img0.png", "img2.png", "img4.png", "img1.png", "img3.png"]
    bpps = [r["bpp"] for r in res["rows"]]
    assert bpps == [0.0, 1.0, 2.0, 10.0, 11.0]
