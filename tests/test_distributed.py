"""Two-process DCN smoke test (VERDICT r1 #7 / SURVEY §2.6 item 2): real
jax.distributed.initialize over localhost, cross-host all_gather_host,
disjoint per-host sampling, and the multi-host shard_batch path."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
sys.path.insert(0, sys.argv[3])  # repo root
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

rank, port = int(sys.argv[1]), sys.argv[2]
from pl_yolo_tpu.parallel.distributed import (all_gather_host, initialize,
                                              shard_info)

pid, pcount = initialize(f"localhost:{port}", num_processes=2,
                         process_id=rank)
assert (pid, pcount) == (rank, 2), (pid, pcount)
assert jax.device_count() == 8 and jax.local_device_count() == 4

# 1) cross-host gather of per-host python payloads (eval aggregation path)
dets = [{"image_id": rank * 10 + i, "score": float(i)} for i in range(2 + rank)]
gathered = all_gather_host(dets)
assert len(gathered) == 2
assert [d["image_id"] for d in gathered[0]] == [0, 1]
assert [d["image_id"] for d in gathered[1]] == [10, 11, 12]

# 2) per-host samplers cover the dataset disjointly
from pl_yolo_tpu.data.loader import InfiniteSampler
sid, nsh = shard_info()
mine = []
it = iter(InfiniteSampler(10, shard_id=sid, num_shards=nsh, seed=1))
for _ in range(5):  # one epoch worth per shard
    mine.append(next(it))
both = all_gather_host(mine)
union = sorted(both[0] + both[1])
assert union == list(range(10)), union
assert not (set(both[0]) & set(both[1]))

# 3) multi-host shard_batch: local [4,...] shard -> global [8,...] batch
from pl_yolo_tpu.parallel.mesh import make_mesh, shard_batch
import jax.numpy as jnp
mesh = make_mesh()  # 8 global devices on 'data'
local = np.full((4, 3), rank, np.float32)
g = shard_batch(mesh, {"x": local})["x"]
assert g.shape == (8, 3), g.shape
total = float(jax.jit(jnp.sum, out_shardings=None)(g))
assert total == 12.0, total  # rank0 rows sum 0, rank1 rows sum 12

print(f"WORKER-OK rank={rank}")
"""


def test_two_process_dcn(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen([sys.executable, str(script), str(rank), str(port),
                          REPO],
                         cwd=REPO, env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for rank in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"WORKER-OK rank={rank}" in out
