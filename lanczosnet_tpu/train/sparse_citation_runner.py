"""Sparse full-graph citation runner (ROADMAP.md #2).

Same experiment protocol as `CitationRunner` (Planetoid splits,
full-batch steps, early stopping on val accuracy, best-snapshot test)
but the graph operator lives as COO edges (`ops/sparse.py`), so memory
scales with edges, not N² — the path for graphs far beyond Pubmed.

Select with ``runner: SparseCitationRunner``; all nine model-family
names map to the sparse members of `models/sparse_nodes.py` (DCNN gets
a row-stochastic operator, GPNN a spectral partition of the edge list,
AdaLanczosNet the in-forward learned-kernel Lanczos).

Set ``train.num_devices > 1`` to edge-shard the operator over a mesh
(`parallel/mesh.py:shard_sparse_op`): the whole forward runs inside a
`shard_map` — each device holds E/ndev edges, node arrays and params
are replicated, and every segment reduction finishes with a psum/pmax
over ICI. Per-device edge memory is what bounds graph size, so this is
the ">one chip's HBM" path (VERDICT round-1 #5). Gradients flow
through the shard_map (tested device-count-invariant in
tests/test_sparse_sharded.py).
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from lanczosnet_tpu.data.citation import (
    import_planetoid,
    synthetic_citation_edges,
    synthetic_citation_graph,
)
from lanczosnet_tpu.data.partition import sparse_spectral_partition
from lanczosnet_tpu.models.base import compute_dtype
from lanczosnet_tpu.models.sparse_nodes import (
    SparseAdaLanczosNet,
    SparseChebyNet,
    SparseDCNN,
    SparseGAT,
    SparseGCN,
    SparseGPNN,
    SparseGraphSAGE,
    SparseLanczosNet,
    SparseMPNN,
)
from lanczosnet_tpu.ops.sparse import (
    RingOp,
    sparse_lanczos_ritz,
    sparse_row_stochastic_operator,
    sparse_sym_operator,
)
from lanczosnet_tpu.parallel import multihost
from lanczosnet_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    node_shard_sparse_op,
    replicate_sharding,
    ring_shard_sparse_op,
    shard_node_array,
    shard_sparse_op,
)
from lanczosnet_tpu.train.checkpoint import Checkpointer
from lanczosnet_tpu.train.optim import build_optimizer
from lanczosnet_tpu.train.step import TrainState
from lanczosnet_tpu.utils.cache import enable_compilation_cache, set_prng_impl
from lanczosnet_tpu.utils.logger import MetricsLogger, get_logger
from lanczosnet_tpu.utils.profiling import program_cost


def _pad_rows(x, n_pad):
    """Zero-pad axis 0 to ``n_pad`` (the unsharded twin of
    `parallel.mesh.shard_node_array`)."""
    pad = n_pad - x.shape[0]
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )
    return x


def sharded_sparse_apply(mesh, model, params, x, op, extras=None,
                         extra_specs=None, deterministic=True, rng=None):
    """Run ``model.apply`` inside a shard_map with a sharded COO op.

    Two modes, selected by the op's own axis tags:

    - edge-sharded (``op.axis``): params/x/extras replicated (extras =
      any trailing positional model inputs, e.g. LanczosNet's Ritz pair
      or GPNN's partition ids), op.row/col/val sharded P(data); outputs
      are replicated because every segment reduction inside
      ops/sparse.py psums over the edge axis.
    - node-sharded (``op.gather_axis``): x, the logits, and any
      node-major extras ride P(data) blocks (pass ``extra_specs``);
      inside, the only collectives are the source all_gathers and the
      Lanczos/spectral psums.

    Differentiable from outside — shard_map transposes psums and
    all_gathers (into reduce-scatters) and sums replicated-input
    cotangents.
    """
    ring = isinstance(op, RingOp)
    node_mode = ring or op.gather_axis is not None
    # spec tree via replace: static fields (n/axis/n_true/rows_sorted)
    # are part of the treedef and must match the op's exactly
    op_specs = op.shard_specs(DATA_AXIS)
    node_spec = P(DATA_AXIS) if node_mode else P()
    extras = tuple(extras) if extras is not None else ()
    if extra_specs is None:
        extra_specs = tuple(P() for _ in extras)
    rng_args = (rng,) if rng is not None else ()
    rng_specs = (P(),) if rng is not None else ()

    def body(params, lop, x, *rest):
        extra_vals = rest[: len(extras)]
        rngs = None
        if rng is not None:
            key = rest[len(extras)]
            if node_mode:
                # each node block must draw an independent dropout mask
                key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
            rngs = {"dropout": key}
        return model.apply(
            {"params": params}, x, lop, *extra_vals,
            deterministic=deterministic, rngs=rngs,
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), op_specs, node_spec) + tuple(extra_specs) + rng_specs,
        out_specs=node_spec,
    )(params, op, x, *extras, *rng_args)


class SparseCitationRunner:
    def __init__(self, config):
        self.config = config
        self.log = get_logger()
        enable_compilation_cache()
        set_prng_impl(config.train.get("prng_impl", "rbg"))
        self.run_dir = Path(config.save_dir)
        self.metrics = MetricsLogger(
            self.run_dir / "metrics.jsonl",
            tensorboard_dir=(
                self.run_dir / "tb"
                if config.train.get("tensorboard")
                else None
            ),
        )
        self.ckpt = Checkpointer(self.run_dir)

        # model.dtype: bfloat16 halves the E·F gather/scatter traffic
        # that bounds the sparse step; params and the spectral core
        # stay f32 (models/sparse_nodes.py dtype contract). Parsed
        # before the dataset so features can be STORED in the compute
        # dtype: the model's first op is `x.astype(dtype)` anyway, so
        # keeping an f32 copy on device only holds dead bytes — at 10M
        # nodes the f32 [10M, 32] feature matrix is 640 MB of the
        # runtime-OOM margin (r4).
        self.compute_dtype = compute_dtype(config.model.get("dtype"))

        dcfg = config.dataset
        source = dcfg.get("source", "synthetic")
        if source == "planetoid":
            graph = import_planetoid(dcfg["data_dir"], dcfg["name"])
        elif source == "synthetic_edges":
            # O(E) generator for beyond-Pubmed scale (no dense adj ever)
            graph = synthetic_citation_edges(
                int(dcfg.get("num_nodes", 100_000)),
                num_class=int(dcfg.get("num_class", 10)),
                feat_dim=int(dcfg.get("feat_dim", 256)),
                avg_degree=float(dcfg.get("avg_degree", 5.0)),
                seed=int(dcfg.get("seed", 7)),
            )
        else:
            graph = synthetic_citation_graph(
                dcfg.get("name", "cora"),
                seed=int(dcfg.get("seed", 7)),
                scale=float(dcfg.get("scale", 1.0)),
            )
        n = graph["features"].shape[0]
        edges = (
            graph["edges"]
            if "edges" in graph
            else np.argwhere(np.triu(graph["adj"], 1) > 0)
        )
        # DCNN diffuses over the transition matrix (dense path's
        # `operator_kind: row`); everything else is sym-normalized.
        if config.model["name"] == "DCNN":
            self.op = sparse_row_stochastic_operator(edges, n)
        else:
            self.op = sparse_sym_operator(edges, n)
        nnz = int(self.op.row.shape[0])  # before sharding reshapes it
        self.x = jnp.asarray(graph["features"], dtype=self.compute_dtype)
        self.labels = jnp.asarray(graph["labels"].astype(np.int32))
        self.splits = {
            s: jnp.asarray(graph[f"{s}_mask"].astype(np.float32))
            for s in ("train", "val", "test")
        }

        ndev = int(config.train.get("num_devices", 1))
        shard_kind = str(config.train.get("shard", "edges"))
        self.mesh = None
        self.node_sharded = False
        if config.model["name"] == "GPNN":
            # unsharded operator for the host-side spectral partition
            # (the only remaining consumer of a full unsharded copy;
            # overridden with the padded twin in the node-sharded
            # branch below)
            self.init_op = self.op
        if ndev > 1 and shard_kind in ("nodes", "nodes_ring"):
            # Node-sharded: activations/optimizer node-state are N/ndev
            # per device — the memory-scaling mode. "nodes_ring"
            # additionally pipelines the source blocks around the ring
            # (ppermute) instead of all_gathering them: transient
            # memory 2·(N/ndev)·F instead of N·F, transfer overlapped
            # with compute. All nine families ride the ring: spmv ones
            # directly, GAT via the online-softmax ring, AdaLanczosNet
            # via per-(dst,src)-slice kernel evaluation, GPNN via
            # rotated partition masks (ops/sparse.py).
            self.mesh = make_mesh(ndev)
            self.node_sharded = True
            if shard_kind == "nodes_ring":
                self.op, n_pad = ring_shard_sparse_op(self.op, self.mesh)
            else:
                self.op, n_pad = node_shard_sparse_op(self.op, self.mesh)
            self.n_pad = n_pad
            # GPNN's spectral partition runs host-side on the padded
            # UNSHARDED graph so ids line up with the padded node
            # arrays (pad nodes are isolated; they change nothing).
            # Only GPNN pays for this unsharded copy — flax init no
            # longer needs one (it runs on a tiny feature-dim twin,
            # `_init_args`), so at 10M nodes the full [E]-sized
            # operator stays off device 0 for the other families.
            if config.model["name"] == "GPNN":
                self.init_op = sparse_sym_operator(edges, n_pad)
            self.x = shard_node_array(
                _pad_rows(self.x, n_pad), self.mesh, n_pad
            )
            self.labels = shard_node_array(self.labels, self.mesh, n_pad)
            self.splits = {
                k: shard_node_array(v, self.mesh, n_pad)
                for k, v in self.splits.items()
            }
        elif ndev > 1:
            self.mesh = make_mesh(ndev)
            self.op = shard_sparse_op(self.op, self.mesh)
            rsh = replicate_sharding(self.mesh)
            from lanczosnet_tpu.parallel.multihost import global_put

            self.x = global_put(self.x, rsh)
            self.labels = global_put(self.labels, rsh)
            self.splits = {
                k: global_put(v, rsh) for k, v in self.splits.items()
            }

        mcfg = dict(config.model)
        name = mcfg["name"]
        hidden = tuple(mcfg.get("hidden_dim", (64,)))
        c = int(graph["num_class"])
        drop = float(mcfg.get("dropout", 0.5))
        self.extras = None
        self.extra_specs = None
        if name == "LanczosNet":
            k = int(mcfg.get("num_eig_vec", 20))
            if self.mesh is None:
                self.extras = sparse_lanczos_ritz(self.op, k)
            else:
                # the Ritz precompute itself runs sharded: the Lanczos
                # matvec callback is the sharded spmv (edge mode), or
                # the node-block recursion with psum'd inner products
                # (node mode, ritz_vec comes out node-sharded)
                op_specs = self.op.shard_specs(DATA_AXIS)
                vec_spec = P(DATA_AXIS) if self.node_sharded else P()
                self.extras = jax.jit(jax.shard_map(
                    lambda lop: sparse_lanczos_ritz(lop, k),
                    mesh=self.mesh,
                    in_specs=(op_specs,),
                    out_specs=(P(), vec_spec),
                ))(self.op)
                self.extra_specs = (P(), vec_spec)
            self.model = SparseLanczosNet(
                hidden_dim=hidden,
                num_class=c,
                short_diffusion_dist=tuple(
                    mcfg.get("short_diffusion_dist", (1, 2))
                ),
                long_diffusion_dist=tuple(
                    mcfg.get("long_diffusion_dist", (5, 10))
                ),
                filter_hidden_dim=int(mcfg.get("filter_hidden_dim", 16)),
                dropout=drop,
            )
        elif name == "AdaLanczosNet":
            self.model = SparseAdaLanczosNet(
                hidden_dim=hidden,
                num_class=c,
                kernel_dim=int(mcfg.get("kernel_dim", 16)),
                short_diffusion_dist=tuple(
                    mcfg.get("short_diffusion_dist", (1, 2))
                ),
                long_diffusion_dist=tuple(
                    mcfg.get("long_diffusion_dist", (5, 10))
                ),
                num_eig_vec=int(mcfg.get("num_eig_vec", 20)),
                filter_hidden_dim=int(mcfg.get("filter_hidden_dim", 16)),
                dropout=drop,
            )
        elif name == "GCN":
            self.model = SparseGCN(hidden_dim=hidden, num_class=c, dropout=drop)
        elif name == "ChebyNet":
            self.model = SparseChebyNet(
                hidden_dim=hidden, num_class=c,
                poly_order=int(mcfg.get("poly_order", 3)),
                dropout=drop,
            )
        elif name == "GAT":
            self.model = SparseGAT(
                hidden_dim=hidden, num_class=c,
                num_head=int(mcfg.get("num_head", 4)),
                dropout=drop,
            )
        elif name == "DCNN":
            self.model = SparseDCNN(
                hidden_dim=hidden, num_class=c,
                max_hop=int(mcfg.get("max_hop", 3)),
                dropout=drop,
            )
        elif name == "GraphSAGE":
            self.model = SparseGraphSAGE(
                hidden_dim=hidden, num_class=c, dropout=drop
            )
        elif name == "MPNN":
            self.model = SparseMPNN(
                hidden_dim=hidden, num_class=c,
                num_prop=int(mcfg.get("num_prop", 3)),
                dropout=drop,
            )
        elif name == "GPNN":
            # partition ids from the UNSHARDED operator (host-side,
            # one-off — same role as data/partition.py at pack time)
            part = sparse_spectral_partition(
                self.init_op,
                int(mcfg.get("num_partition", 2)),
                seed=int(config.seed),
            )
            if self.node_sharded:
                self.extras = (
                    shard_node_array(
                        jnp.asarray(part, jnp.int32), self.mesh, self.n_pad
                    ),
                )
                self.extra_specs = (P(DATA_AXIS),)
            else:
                self.extras = (jnp.asarray(part, jnp.int32),)
            self.model = SparseGPNN(
                hidden_dim=hidden, num_class=c,
                num_prop=int(mcfg.get("num_prop", 2)),
                num_intra_prop=int(mcfg.get("num_intra_prop", 1)),
                num_cut_prop=int(mcfg.get("num_cut_prop", 1)),
                dropout=drop,
            )
        else:
            raise KeyError(
                "SparseCitationRunner supports all nine model families "
                f"(GCN | ChebyNet | GAT | DCNN | GraphSAGE | MPNN | GPNN "
                f"| LanczosNet | AdaLanczosNet), got {name!r}"
            )
        if self.compute_dtype is not jnp.float32:
            self.model = self.model.clone(dtype=self.compute_dtype)
        if str(config.train.get("remat", "")).lower() == "layers":
            # per-layer checkpointing is a MODEL structure knob
            # (nn.remat around each layer method), unlike full/dots
            # which wrap the whole forward in build_programs
            if not hasattr(self.model, "remat_layers"):
                raise ValueError(
                    f"train.remat: layers — {name} has no per-layer "
                    "remat support (use 'full' or 'dots')"
                )
            self.model = self.model.clone(remat_layers=True)
        if (
            self.mesh is not None
            and self.extras is not None
            and self.extra_specs is None
        ):
            rsh = replicate_sharding(self.mesh)
            from lanczosnet_tpu.parallel.multihost import global_put

            self.extras = tuple(
                global_put(e, rsh) for e in self.extras
            )
        self.log.info(
            "sparse citation runner: model=%s dataset=%s nodes=%d edges=%d "
            "classes=%d devices=%d",
            name, dcfg.get("name", "cora"), n, nnz, c, ndev,
        )

    def _apply(self, params, x, op, extras, deterministic, rngs=None):
        """Forward pass; x/op/extras come in as ARGUMENTS, never captured
        from self — jitted callers must pass global arrays explicitly
        (closing over an array that spans non-addressable devices is an
        error on a multi-host mesh)."""
        if self.mesh is not None:
            return sharded_sparse_apply(
                self.mesh, self.model, params, x, op,
                extras=extras, extra_specs=self.extra_specs,
                deterministic=deterministic,
                rng=None if rngs is None else rngs["dropout"],
            )
        args = (x, op)
        if extras is not None:
            args = args + tuple(extras)
        return self.model.apply(
            {"params": params}, *args, deterministic=deterministic, rngs=rngs
        )

    def _init_args(self):
        """Tiny same-feature-dim twin of the real (x, op, *extras) for
        flax init.

        Every parameter in the nine sparse families is drawn from rng
        with a shape that depends only on feature dims (hidden/filter/
        kernel/class widths), never on node or edge count — so init on
        a 32-node ring yields BIT-IDENTICAL params to init on the real
        graph (tests/test_sparse_tiny_init.py) while skipping the full
        forward pass flax init executes. At 10M nodes that forward was
        (a) minutes of single-device compute, (b) an unsharded [N, F]
        copy + full operator resident for the life of the run, and
        (c) — when mixed with the mesh-sharded Ritz extras — a GSPMD
        program whose resharding collectives abort on an
        oversubscribed CPU mesh (XLA:CPU's 40 s rendezvous kill; the
        r5 mem_probe crash). On a real slice it was also an init-time
        OOM hazard: device 0 had to hold what training shards 8 ways.
        """
        mcfg = self.config.model
        name = mcfg["name"]
        n_t = max(32, int(mcfg.get("num_eig_vec", 0)))
        ring = np.arange(n_t)
        edges_t = np.stack([ring, (ring + 1) % n_t], axis=1)
        kind = (
            sparse_row_stochastic_operator
            if name == "DCNN"
            else sparse_sym_operator
        )
        op_t = kind(edges_t, n_t)
        x_t = jnp.zeros((n_t, int(self.x.shape[-1])), self.compute_dtype)
        if name == "LanczosNet":
            k = int(mcfg.get("num_eig_vec", 20))
            # values are irrelevant to param draws; zeros skip even the
            # tiny Lanczos run
            return (x_t, op_t, jnp.zeros((k,), jnp.float32),
                    jnp.zeros((n_t, k), jnp.float32))
        if name == "GPNN":
            npart = int(mcfg.get("num_partition", 2))
            return (x_t, op_t,
                    jnp.arange(n_t, dtype=jnp.int32) % npart)
        return (x_t, op_t)

    def init_train_state(self, tx) -> TrainState:
        """Initial TrainState (flax init + optimizer init), replicated
        over the mesh when one exists. Init runs on the tiny
        `_init_args` twin — process-local by construction, so it is
        also multi-host safe (it never mixes global arrays with local
        ones)."""
        rng = jax.random.PRNGKey(int(self.config.seed))
        p_rng, d_rng, s_rng = jax.random.split(rng, 3)
        params = self.model.init(
            {"params": p_rng, "dropout": d_rng},
            *self._init_args(),
            deterministic=True,
        )["params"]
        if self.mesh is not None:
            from lanczosnet_tpu.parallel.multihost import global_put

            params = jax.tree.map(
                lambda a: global_put(a, replicate_sharding(self.mesh)),
                params,
            )
        return TrainState(
            params=params, opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32), rng=s_rng,
        )

    def build_programs(self, tx):
        """The three jitted device programs of the training loop:
        ``train_step`` (one epoch: fwd + bwd + update, state donated),
        ``scanned_steps(state, data, n)`` (n epochs in one `lax.scan`
        program — `train.valid_epoch`), and ``accuracy(params, data,
        mask)``. Factored out of :meth:`train` so tooling can AOT-
        inspect the exact programs (scripts/mem_probe.py reads their
        compiled buffer footprint without executing — how the 10M-node
        HBM budget was debugged)."""
        tcfg = self.config.train

        # `train.remat: full|dots` rematerializes the forward inside the
        # backward pass instead of saving intermediates — the knob that
        # breaks the wide-F activation memory wall (PARITY.md: at
        # F=512/1M nodes the saved [E, F] edge-gather activations alone
        # are ~10 GB → RESOURCE_EXHAUSTED on one v5e). "full" saves
        # nothing (backward re-runs the forward; peak ≈ forward
        # transients); "dots" keeps matmul outputs ([N, dim] — cheap)
        # and recomputes only the gather/scatter/elementwise chain.
        # Grad-identical to the unrematerialized step (the backward
        # replays the same HLO ops; tests/test_sparse_remat.py).
        def fwd_train(p, x, op, extras, dr):
            return self._apply(p, x, op, extras, False, rngs={"dropout": dr})

        remat = str(tcfg.get("remat", "")).lower()
        if remat in ("full", "true", "1"):
            fwd_train = jax.checkpoint(fwd_train)
        elif remat == "dots":
            fwd_train = jax.checkpoint(
                fwd_train,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        elif remat == "layers":
            pass  # handled at model construction (clone(remat_layers=True))
        elif remat not in ("", "false", "none", "0"):
            raise ValueError(
                f"train.remat must be 'full', 'dots' or 'layers', "
                f"got {remat!r}"
            )

        def step_body(state, data):
            x, op, extras, labels, splits = data
            rng, dr = jax.random.split(state.rng)

            def loss_fn(p):
                logits = fwd_train(p, x, op, extras, dr)
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), labels
                )
                m = splits["train"]
                return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(
                lambda a, u: a + u, state.params, updates
            )
            return TrainState(
                params=new_params, opt_state=opt_state,
                step=state.step + 1, rng=rng,
            ), loss

        train_step = partial(jax.jit, donate_argnums=(0,))(step_body)

        # Full-batch epochs are one device program each, so small-graph
        # runs pay per-epoch dispatch through the host↔TPU tunnel
        # (~33 ms on this box). Like the QM8 scanned-epoch trainer,
        # `train.valid_epoch: k` folds k epochs into ONE lax.scan
        # program between validations. Measured: neutral at Pubmed
        # scale (the 19.7k-node step is scatter-bound at ~90 ms, so
        # dispatch hides behind async execution) — the knob pays off
        # when step time ≪ dispatch, i.e. Cora/Citeseer-sized graphs.
        # On the CPU test mesh a sharded step_body's collectives must not
        # repeat inside a multi-trip loop (rendezvous-key reuse across
        # trips — ops/lanczos.py:_collective_safe_unroll), so the epoch
        # group fully unrolls there; TPU keeps the compact scan.
        unroll_all = (
            self.mesh is not None
            and self.mesh.size > 1
            and jax.default_backend() == "cpu"
        )

        @partial(jax.jit, donate_argnums=(0,), static_argnames=("n",))
        def scanned_steps(state, data, n):
            return jax.lax.scan(
                lambda c, _: step_body(c, data), state, None, length=n,
                unroll=n if unroll_all else 1,
            )

        @jax.jit
        def accuracy(params, data, mask):
            x, op, extras, labels, _ = data
            pred = jnp.argmax(
                self._apply(params, x, op, extras, True), axis=-1
            )
            return jnp.sum((pred == labels) * mask) / jnp.maximum(
                jnp.sum(mask), 1.0
            )

        return train_step, scanned_steps, accuracy

    def train(self) -> dict:
        tcfg = self.config.train
        tx, schedule = build_optimizer(tcfg, 1)
        state = self.init_train_state(tx)
        # everything a jitted step touches travels as ARGUMENTS — on a
        # multi-host mesh a jit may not close over global arrays
        data = (self.x, self.op, self.extras, self.labels, self.splits)
        train_step, scanned_steps, accuracy = self.build_programs(tx)
        group_size = max(1, int(tcfg.get("valid_epoch", 1)))

        max_epoch = int(tcfg.get("max_epoch", 200))
        patience = int(tcfg.get("patience", 50))
        display = int(tcfg.get("display_iter", 20))
        snapshot_every = max(1, int(tcfg.get("snapshot_epoch", 50)))
        best_val, best_epoch = -1.0, -1
        epoch = 0
        if tcfg.get("is_resume") and self.ckpt.exists("latest"):
            state = self.ckpt.restore("latest", state)
            meta = self.ckpt.meta("latest") or {}
            epoch = int(meta.get("epoch", -1)) + 1
            best_meta = self.ckpt.meta("best") or {}
            best_val = float(best_meta.get("val_acc", -1.0))
            best_epoch = int(best_meta.get("epoch", -1))
            self.log.info(
                "resumed from epoch %d (best val so far %.4f)",
                epoch, best_val,
            )
        elif tcfg.get("resume_model"):
            state = Checkpointer.restore_file(tcfg["resume_model"], state)
            self.log.info("warm-started from %s", tcfg["resume_model"])
        start_epoch = epoch
        t0 = time.perf_counter()
        while epoch < max_epoch:
            group = min(group_size, max_epoch - epoch)
            if group == 1:
                state, loss = train_step(state, data)
            else:
                state, losses = scanned_steps(state, data, n=group)
                loss = losses[-1]
            if epoch == start_epoch:
                # fetch the first loss BEFORE the first eval dispatch:
                # execution is async, so a step error would otherwise
                # surface at the val fetch and a train-step runtime OOM
                # is indistinguishable from an eval one (hit at 10M
                # nodes, r4)
                float(loss)
            if epoch == start_epoch and group == 1:
                # free once the executable exists (reuses the jit cache
                # entry); calling BEFORE the first step would pay the
                # whole compile a second time through the AOT path
                cost = program_cost(train_step, state, data)
                if cost:
                    self.log.info("sparse train-step program cost: %s", cost)
                    self.metrics.log(
                        "program_cost", program="train_step", **cost
                    )
            epoch += group
            val_acc = float(accuracy(state.params, data, self.splits["val"]))
            if epoch - group == start_epoch:
                cost = program_cost(
                    accuracy, state.params, data, self.splits["val"]
                )
                if cost:
                    self.log.info("eval program cost: %s", cost)
                    self.metrics.log("program_cost", program="eval", **cost)
            if (epoch - group) % display < group:
                self.log.info(
                    "epoch %d | train CE %.4f | val acc %.4f",
                    epoch - 1, float(loss), val_acc,
                )
                self.metrics.log(
                    "train", epoch=epoch - 1, loss=float(loss),
                    val_acc=val_acc,
                )
            if val_acc > best_val:
                best_val, best_epoch = val_acc, epoch - 1
                self.ckpt.save(
                    "best", state, {"epoch": epoch - 1, "val_acc": val_acc}
                )
            if epoch // snapshot_every != (epoch - group) // snapshot_every:
                self.ckpt.save("latest", state, {"epoch": epoch - 1})
            if epoch - 1 - best_epoch > patience:
                break
        wall = time.perf_counter() - t0
        # multi-host: the primary may still be writing "best" from the
        # final epoch while other processes reach this read
        multihost.barrier("restore_best")
        state = self.ckpt.restore("best", state)
        test_acc = float(accuracy(state.params, data, self.splits["test"]))
        self.log.info(
            "best val acc %.4f | test acc %.4f | %.1fs", best_val, test_acc, wall
        )
        self.metrics.log("test", acc=test_acc, best_val=best_val, wall_s=wall)
        return {"best_val_acc": best_val, "test_acc": test_acc}
