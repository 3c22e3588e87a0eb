"""Device mesh + sharding rules — the framework's one distributed component.

The reference's only parallelism is single-process multi-GPU
`torch.nn.DataParallel` with a custom scatter (`utils/data_parallel.py`,
SURVEY.md §2.6): replicate the model, split the batch, gather losses.
The TPU-native equivalent needs no replication machinery at all:

- a 1-D ``Mesh`` over all local devices with a ``"data"`` axis,
- batches sharded ``P("data", …)`` along graphs,
- params/opt-state replicated (``P()``),
- `jax.jit` then compiles the train step to SPMD; XLA inserts the
  gradient all-reduce over ICI. There is no hand-written collective
  and no scatter/gather code to maintain.

The same code path runs on 1 real TPU chip, a forced-8-device CPU mesh
(tests, `__graft_entry__.dryrun_multichip`), or a v4-8 slice; multi-host
extends it with `jax.distributed.initialize()` + `jax.make_mesh` over
all processes' devices (node-axis sharding for giant graphs is the
documented extension point, SURVEY.md §5 long-context).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lanczosnet_tpu.parallel.multihost import global_put

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh2d(
    tp: int, n_devices: Optional[int] = None, devices=None
) -> Mesh:
    """2-D ``(data, model)`` mesh: tensor parallelism × data parallelism.

    ``tp`` devices along ``"model"`` hold feature shards of every weight
    matrix (`tp_state_sharding`); the remaining factor is the ``"data"``
    batch axis. On a TPU slice lay ``tp`` along the fastest ICI
    dimension — the per-layer collectives GSPMD inserts (all-gathers of
    feature-sharded activations, reduce-scatters of their cotangents)
    ride neighbor links, while the once-per-step gradient all-reduce
    crosses the ``data`` axis.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(devices) % tp:
        raise ValueError(f"tp={tp} must divide device count {len(devices)}")
    dp = len(devices) // tp
    return Mesh(
        np.asarray(devices).reshape(dp, tp), (DATA_AXIS, MODEL_AXIS)
    )


def tp_state_sharding(tree, mesh: Mesh):
    """Megatron-style column-parallel shardings for a params/opt-state
    pytree, by shape rule (SURVEY.md §2.6 has no reference equivalent —
    the upstream's only parallelism is replicate-everything
    DataParallel; this is the TPU-native model-parallel axis).

    Every weight matrix ``[…, in, out]`` is sharded ``P(…, "model")``
    on its output-feature axis, 1-D vectors (biases) follow on their
    only axis, scalars and indivisible shapes replicate. Params and
    Adam's ``mu``/``nu`` share leaf shapes, so ONE rule shards the
    whole `TrainState` — per-device parameter + optimizer memory is
    ``1/tp``. No hand-written collectives: `jax.jit` propagates these
    shardings through the model (diffusion/spectral ops contract over
    the node axis, so feature-sharded activations pass through them
    untouched) and inserts the all-gather / reduce-scatter pairs at
    layer boundaries over ICI.
    """
    tp = mesh.shape[MODEL_AXIS]

    def rule(x):
        shape = getattr(x, "shape", ())
        if len(shape) >= 2 and shape[-1] % tp == 0 and shape[-1] >= tp:
            return NamedSharding(
                mesh, P(*(None,) * (len(shape) - 1), MODEL_AXIS)
            )
        if len(shape) == 1 and shape[0] % tp == 0 and shape[0] >= tp:
            return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (graph/batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a (host or device) GraphBatch batch-sharded on the mesh.

    Every leaf's leading axis is the graph axis, so one spec covers the
    whole pytree. Batch size must divide the mesh size.
    """
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: global_put(x, s), batch)


def shard_sparse_op(op, mesh: Mesh, axis: str = DATA_AXIS):
    """Edge-shard a COO operator (`ops/sparse.py:SparseOp`) over the mesh.

    The >HBM full-graph path (SURVEY.md §5 long-context analog (b),
    VERDICT round-1 #5): the edge arrays are padded with zero-weight
    edges to a mesh-size multiple and placed ``P(axis)``, and the op is
    tagged with the axis name so every segment reduction inside
    `ops/sparse.py` finishes with the matching psum/pmax. Consume it
    inside a `shard_map` over the same mesh (node arrays replicated) —
    `train/sparse_citation_runner.py:sharded_sparse_apply`.
    """
    import jax.numpy as jnp

    from lanczosnet_tpu.ops.sparse import SparseOp

    ndev = mesh.shape[axis]
    e = op.row.shape[0]
    pad = (-e) % ndev
    row, col, val = op.row, op.col, op.val
    if pad:
        # pad rows with the LAST segment id (not 0): the trailing pad
        # edges then keep the final shard non-decreasing, so the base
        # op's rows_sorted promise survives sharding (each shard is a
        # contiguous slice of the sorted edge list). val=0 keeps them
        # dead either way.
        row = jnp.concatenate(
            [row, jnp.full((pad,), op.n - 1, row.dtype)]
        )
        col = jnp.concatenate([col, jnp.zeros((pad,), col.dtype)])
        val = jnp.concatenate([val, jnp.zeros((pad,), val.dtype)])
    sh = NamedSharding(mesh, P(axis))
    # per-shard col-sort permutation (shard-LOCAL indices): edge_gather's
    # backward scatter runs inside shard_map on each device's slice, so
    # each contiguous slice gets its own argsort
    e_loc = int(col.shape[0]) // ndev
    cp = np.argsort(
        np.asarray(col).reshape(ndev, e_loc), axis=1, kind="stable"
    ).astype(np.int32)
    return SparseOp(
        row=global_put(row, sh),
        col=global_put(col, sh),
        val=global_put(val, sh),
        n=op.n,
        axis=axis,
        rows_sorted=op.rows_sorted,
        col_perm=global_put(jnp.asarray(cp.reshape(-1)), sh),
    )


def node_shard_sparse_op(op, mesh: Mesh, axis: str = DATA_AXIS):
    """Node-shard a COO operator: contiguous row blocks per device.

    The memory-scaling counterpart of :func:`shard_sparse_op` (which
    shards *edges* but replicates every ``[N, F]`` node array): nodes
    are split into ``ndev`` contiguous blocks and each device receives
    exactly the edges whose DESTINATION row falls in its block
    (destination bucketing), with ``row`` renumbered block-local and
    ``col`` kept global. Consequences inside `shard_map`:

    - every ``segment_sum``/``segment_max`` over rows is complete with
      NO collective — a device owns all incoming edges of its rows;
    - the one collective per propagation is the source gather
      (`ops/sparse.py:gather_nodes`, an ``all_gather`` whose transpose
      is a reduce-scatter), so persistent node state — activations,
      saved-for-backward layer inputs, per-node optimizer state — is
      ``N/ndev`` per device and only the gather's output is transient
      at full ``N``;
    - per-device edge counts are padded to the max bucket with
      zero-``val`` (dead) edges, keeping shapes static and identical
      across devices.

    Works on any pre-normalized operator (sym, row-stochastic, learned
    views). Returns ``(sharded_op, n_pad)`` where ``n_pad`` (a multiple
    of the mesh size) is what node arrays must be padded to —
    :func:`shard_node_array`.
    """
    import jax.numpy as jnp

    from lanczosnet_tpu.ops.sparse import SparseOp

    ndev = mesh.shape[axis]
    row = np.asarray(op.row)
    col = np.asarray(op.col)
    val = np.asarray(op.val)
    n_pad = -(-op.n // ndev) * ndev
    n_loc = n_pad // ndev
    dev = row // n_loc
    counts = np.bincount(dev, minlength=ndev)
    e_max = max(int(counts.max()), 1)
    # pad rows use the last local row id so that a rows_sorted input op
    # stays non-decreasing per device (boolean-mask bucketing preserves
    # relative order; the block-local renumber subtracts a constant)
    r = np.full((ndev, e_max), n_loc - 1, np.int32)
    c = np.zeros((ndev, e_max), np.int32)
    v = np.zeros((ndev, e_max), np.float32)
    for d in range(ndev):
        sel = dev == d
        k = int(sel.sum())
        r[d, :k] = row[sel] - d * n_loc
        c[d, :k] = col[sel]
        v[d, :k] = val[sel]
    sh = NamedSharding(mesh, P(axis))
    # device-local col-sort permutations for edge_gather's sorted
    # backward scatter (cols are global ids; indices are slice-local)
    cp = np.argsort(c, axis=1, kind="stable").astype(np.int32)
    sharded = SparseOp(
        row=global_put(jnp.asarray(r.reshape(-1)), sh),
        col=global_put(jnp.asarray(c.reshape(-1)), sh),
        val=global_put(jnp.asarray(v.reshape(-1)), sh),
        col_perm=global_put(jnp.asarray(cp.reshape(-1)), sh),
        n=n_loc,
        gather_axis=axis,
        # the input op's node count is the true one; padding to n_pad
        # is this function's doing — record it so the sharded Lanczos
        # start vector stays device-count-invariant
        n_true=op.n_true if op.n_true is not None else op.n,
        rows_sorted=op.rows_sorted,
    )
    return sharded, n_pad


def ring_shard_sparse_op(op, mesh: Mesh, axis: str = DATA_AXIS):
    """Node-shard a COO operator in RING form: destination bucketing
    (as :func:`node_shard_sparse_op`) plus per-SOURCE-block bucketing.

    Each device's edges are split into D slices by which node block the
    source lives in, every slice padded to the global max so shapes are
    static and identical across devices. `ops/sparse.py:ring_spmv` then
    rotates the D source blocks around the ring with ``ppermute`` — one
    block-sized transfer per step, overlapped with that step's local
    gather+segment-sum — instead of one full-N ``all_gather``:
    transient memory drops from N·F to 2·(N/D)·F and the transfer rides
    ICI neighbor links. Returns ``(RingOp sharded over the mesh,
    n_pad)``.
    """
    import jax.numpy as jnp

    from lanczosnet_tpu.ops.sparse import RingOp

    ndev = mesh.shape[axis]
    row = np.asarray(op.row)
    col = np.asarray(op.col)
    val = np.asarray(op.val)
    n_pad = -(-op.n // ndev) * ndev
    n_loc = n_pad // ndev
    dst = row // n_loc
    src = col // n_loc
    counts = np.zeros((ndev, ndev), np.int64)
    for d in range(ndev):
        for s in range(ndev):
            counts[d, s] = int(((dst == d) & (src == s)).sum())
    e_max = max(int(counts.max()), 1)
    # as in node_shard_sparse_op: pad rows keep each (dst, src) slice
    # non-decreasing so RingOp.rows_sorted holds per slice
    r = np.full((ndev, ndev, e_max), n_loc - 1, np.int32)
    c = np.zeros((ndev, ndev, e_max), np.int32)
    v = np.zeros((ndev, ndev, e_max), np.float32)
    for d in range(ndev):
        for s in range(ndev):
            sel = (dst == d) & (src == s)
            k = int(sel.sum())
            r[d, s, :k] = row[sel] - d * n_loc
            c[d, s, :k] = col[sel] - s * n_loc
            v[d, s, :k] = val[sel]
    sh = NamedSharding(mesh, P(axis))
    sharded = RingOp(
        row=global_put(jnp.asarray(r.reshape(ndev * ndev, e_max)), sh),
        col=global_put(jnp.asarray(c.reshape(ndev * ndev, e_max)), sh),
        val=global_put(jnp.asarray(v.reshape(ndev * ndev, e_max)), sh),
        n=n_loc,
        axis=axis,
        n_true=op.n_true if op.n_true is not None else op.n,
        rows_sorted=op.rows_sorted,
    )
    return sharded, n_pad


def shard_node_array(x, mesh: Mesh, n_pad: int, axis: str = DATA_AXIS):
    """Pad a node-major array's axis 0 to ``n_pad`` (zeros) and shard it
    into the contiguous blocks `node_shard_sparse_op` assumes."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    pad = n_pad - x.shape[0]
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )
    return global_put(x, NamedSharding(mesh, P(axis)))


def shard_full_graph(batch, mesh: Mesh, n_pad: int):
    """Node-axis sharding for a B=1 full-graph batch (citation configs).

    This is the SURVEY.md §5 "long-context" analog for graphs: instead
    of sharding over graphs, the single graph's *node* axis is sharded —
    operator rows across devices, node arrays alongside; XLA inserts the
    all-gather/reduce for the ``S·X`` and ``Vᵀ·X`` contractions over
    ICI. ``n_pad`` (the padded node count, which identifies the node
    axis on every leaf) must divide the mesh size —
    `data.citation.pack_citation(pad_to=mesh.size)` guarantees it.
    """

    def spec(x):
        if x.ndim == 4 and x.shape[2] == n_pad:  # ops [1,E,N,N]: shard rows
            return P(None, None, DATA_AXIS, None)
        if x.ndim >= 2 and x.shape[1] == n_pad:  # [1, N, ...] node-major
            return P(None, DATA_AXIS, *([None] * (x.ndim - 2)))
        return P()

    return jax.tree.map(
        lambda x: global_put(x, NamedSharding(mesh, spec(x))), batch
    )
