"""Stress-repro for the node-sharded SparseAdaLanczosNet NaN flake.

The failure (VERDICT r2 weak #1) appears only deep inside full-suite
processes (~40% of runs), never when the test runs alone — consistent
with an uninitialized/reused-buffer read whose content depends on heap
history. This script emulates that state cheaply: it dirties the heap
with NaN-laden allocations of many sizes (plus torch traffic, like the
parity tests), then evaluates the exact sharded loss the test computes,
many times, reporting any non-finite hit and whether a same-executable
retry differs (execution race) or persists (deterministic poison).

    env -u PYTHONPATH -u JAX_PLATFORMS python scripts/repro_ada_nan.py [iters]
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # before jax import: block other PJRT plugins
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
if os.environ.get("REPRO_COLLECTIVES"):  # e.g. gloo — A/B the communicator
    jax.config.update(
        "jax_cpu_collectives_implementation", os.environ["REPRO_COLLECTIVES"]
    )

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from lanczosnet_tpu.data.citation import synthetic_citation_edges  # noqa: E402
from lanczosnet_tpu.models.sparse_nodes import SparseAdaLanczosNet  # noqa: E402
from lanczosnet_tpu.ops.sparse import sparse_sym_operator  # noqa: E402
from lanczosnet_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    node_shard_sparse_op,
    shard_node_array,
)
from lanczosnet_tpu.train.sparse_citation_runner import sharded_sparse_apply  # noqa: E402


def dirty_heap(rng: np.random.Generator) -> None:
    """Churn allocator arenas with NaN-filled blocks of many sizes."""
    junk = []
    for _ in range(64):
        n = int(rng.integers(1 << 10, 1 << 18))
        a = np.empty(n, np.float32)
        a.fill(np.nan)
        junk.append(a)
    # device-side churn too: allocate/free NaN device buffers
    for _ in range(16):
        n = int(rng.integers(1 << 10, 1 << 16))
        jnp.full((n,), jnp.nan).block_until_ready()
    try:
        import torch

        for _ in range(8):
            t = torch.full((int(rng.integers(1 << 10, 1 << 16)),), float("nan"))
            (t * 2).sum()
    except Exception:
        pass
    del junk


def main(iters: int = 300) -> int:
    mesh = make_mesh(8)
    g = synthetic_citation_edges(60, num_class=3, feat_dim=8, avg_degree=4.0, seed=0)
    n = g["features"].shape[0]
    op = sparse_sym_operator(g["edges"], n)
    sop, n_pad = node_shard_sparse_op(op, mesh)
    ref_op = sparse_sym_operator(g["edges"], n_pad).replace(n_true=n)
    pad = n_pad - n
    x = jnp.concatenate([jnp.asarray(g["features"]), jnp.zeros((pad, 8), jnp.float32)])
    xs = shard_node_array(g["features"], mesh, n_pad)
    ys = shard_node_array(g["labels"].astype(np.int32), mesh, n_pad)
    ms = shard_node_array(np.ones((n,), np.float32), mesh, n_pad)

    model = SparseAdaLanczosNet(
        hidden_dim=(16,), num_class=3, num_eig_vec=8,
        short_diffusion_dist=(1, 2), long_diffusion_dist=(3,), dropout=0.0,
    )
    params = model.init(jax.random.PRNGKey(0), x, ref_op)["params"]

    def loss_sharded(p):
        logits = sharded_sparse_apply(mesh, model, p, xs, sop)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, ys)
        return jnp.sum(ce * ms) / jnp.sum(ms)

    vg = jax.jit(jax.value_and_grad(loss_sharded))
    l0, _ = vg(params)
    print(f"baseline sharded loss {float(l0):.6f}", flush=True)

    # Independent unsharded reference: the hazard's worst mode is a
    # silently WRONG finite loss (mixed rendezvous buffers), which a
    # finiteness check alone cannot catch.
    def loss_ref(p):
        logits = model.apply({"params": p}, x, ref_op)[:n]
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.asarray(g["labels"].astype(np.int32))
        )
        return jnp.mean(ce)

    ref = float(jax.jit(loss_ref)(params))
    print(f"unsharded reference loss {ref:.6f}", flush=True)
    if not (np.isfinite(ref) and abs(float(l0) - ref) <= 2e-5 * abs(ref)):
        print(f"BASELINE MISMATCH: sharded={float(l0)} unsharded={ref}")
        return 1

    rng = np.random.default_rng(0)
    hits = 0
    for it in range(iters):
        dirty_heap(rng)
        l, grads = vg(params)
        lf = float(l)
        gfin = all(bool(jnp.all(jnp.isfinite(v))) for v in jax.tree.leaves(grads))
        wrong = abs(lf - ref) > 2e-5 * abs(ref)
        if not (np.isfinite(lf) and gfin) or wrong:
            hits += 1
            l2, _ = vg(params)
            print(
                f"HIT iter={it}: loss={lf} (ref {ref}) grads_finite={gfin} "
                f"retry_same_executable={float(l2)}",
                flush=True,
            )
        if (it + 1) % 50 == 0:
            print(f"{it + 1}/{iters} iterations, hits={hits}", flush=True)
    print(f"RESULT: {iters} iterations, {hits} non-finite/wrong-loss hits")
    return 1 if hits else 0


if __name__ == "__main__":
    raise SystemExit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 300))
