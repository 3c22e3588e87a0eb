"""NaN-hunt the node-sharded SparseAdaLanczosNet forward+grads.

VERDICT r2 weak #1 hardening evidence: sweep param initializations
across PRNG impls (threefry AND rbg — the impl the r2 config leak
switched mid-suite) and seeds, through the exact loss the equivalence
test computes, and count non-finite losses/grads. Run on the 8-device
CPU mesh:

    env -u PYTHONPATH -u JAX_PLATFORMS python scripts/fuzz_sharded_ada.py [n_seeds]
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
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


def main(n_seeds: int = 40) -> int:
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

    def loss_sharded(p):
        logits = sharded_sparse_apply(mesh, model, p, xs, sop)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, ys)
        return jnp.sum(ce * ms) / jnp.sum(ms)

    vg = jax.jit(jax.value_and_grad(loss_sharded))

    bad = 0
    for impl in ("threefry2x32", "rbg"):
        jax.config.update("jax_default_prng_impl", impl)
        for seed in range(n_seeds):
            params = model.init(jax.random.PRNGKey(seed), x, ref_op)["params"]
            l, grads = vg(params)
            l = float(l)
            gfin = all(
                bool(jnp.all(jnp.isfinite(v)))
                for v in jax.tree.leaves(grads)
            )
            ok = np.isfinite(l) and gfin
            if not ok:
                bad += 1
                print(f"NON-FINITE impl={impl} seed={seed} loss={l} grads_finite={gfin}")
        print(f"impl={impl}: {n_seeds} seeds done, cumulative bad={bad}", flush=True)
    print(f"RESULT: {2 * n_seeds} draws, {bad} non-finite")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 40))
