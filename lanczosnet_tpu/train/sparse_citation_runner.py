"""Sparse full-graph citation runner (ROADMAP.md #2).

Same experiment protocol as `CitationRunner` (Planetoid splits,
full-batch steps, early stopping on val accuracy, best-snapshot test)
but the graph operator lives as COO edges (`ops/sparse.py`), so memory
scales with edges, not N² — the path for graphs far beyond Pubmed.

Select with ``runner: SparseCitationRunner``; model names ``GCN`` /
``LanczosNet`` map to the sparse members.
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lanczosnet_tpu.data.citation import (
    import_planetoid,
    synthetic_citation_edges,
    synthetic_citation_graph,
)
from lanczosnet_tpu.models.sparse_nodes import SparseGCN, SparseLanczosNet
from lanczosnet_tpu.ops.sparse import sparse_lanczos_ritz, sparse_sym_operator
from lanczosnet_tpu.train.checkpoint import Checkpointer
from lanczosnet_tpu.train.optim import build_optimizer
from lanczosnet_tpu.train.step import TrainState
from lanczosnet_tpu.utils.cache import enable_compilation_cache, set_prng_impl
from lanczosnet_tpu.utils.logger import MetricsLogger, get_logger


class SparseCitationRunner:
    def __init__(self, config):
        self.config = config
        self.log = get_logger()
        enable_compilation_cache()
        set_prng_impl(config.train.get("prng_impl", "rbg"))
        self.run_dir = Path(config.save_dir)
        self.metrics = MetricsLogger(self.run_dir / "metrics.jsonl")
        self.ckpt = Checkpointer(self.run_dir)

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
        self.op = sparse_sym_operator(edges, n)
        self.x = jnp.asarray(graph["features"])
        self.labels = jnp.asarray(graph["labels"].astype(np.int32))
        self.splits = {
            s: jnp.asarray(graph[f"{s}_mask"].astype(np.float32))
            for s in ("train", "val", "test")
        }

        mcfg = dict(config.model)
        name = mcfg["name"]
        hidden = tuple(mcfg.get("hidden_dim", (64,)))
        c = int(graph["num_class"])
        self.ritz = None
        if name == "LanczosNet":
            k = int(mcfg.get("num_eig_vec", 20))
            self.ritz = sparse_lanczos_ritz(self.op, k)
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
                dropout=float(mcfg.get("dropout", 0.5)),
            )
        elif name == "GCN":
            self.model = SparseGCN(
                hidden_dim=hidden, num_class=c,
                dropout=float(mcfg.get("dropout", 0.5)),
            )
        else:
            raise KeyError(
                f"SparseCitationRunner supports GCN | LanczosNet, got {name!r}"
            )
        self.log.info(
            "sparse citation runner: model=%s dataset=%s nodes=%d edges=%d "
            "classes=%d",
            name, dcfg.get("name", "cora"), n, int(self.op.row.shape[0]), c,
        )

    def _apply(self, params, deterministic, rngs=None):
        args = (self.x, self.op)
        if self.ritz is not None:
            args = args + self.ritz
        return self.model.apply(
            {"params": params}, *args, deterministic=deterministic, rngs=rngs
        )

    def train(self) -> dict:
        tcfg = self.config.train
        tx, schedule = build_optimizer(tcfg, 1)
        rng = jax.random.PRNGKey(int(self.config.seed))
        p_rng, d_rng, s_rng = jax.random.split(rng, 3)
        params = self.model.init(
            {"params": p_rng, "dropout": d_rng},
            self.x, self.op,
            *(self.ritz if self.ritz is not None else ()),
            deterministic=True,
        )["params"]
        state = TrainState(
            params=params, opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32), rng=s_rng,
        )

        labels, splits = self.labels, self.splits

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state):
            rng, dr = jax.random.split(state.rng)

            def loss_fn(p):
                logits = self._apply(p, False, rngs={"dropout": dr})
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels
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

        @jax.jit
        def accuracy(params, mask):
            pred = jnp.argmax(self._apply(params, True), axis=-1)
            return jnp.sum((pred == labels) * mask) / jnp.maximum(
                jnp.sum(mask), 1.0
            )

        max_epoch = int(tcfg.get("max_epoch", 200))
        patience = int(tcfg.get("patience", 50))
        display = int(tcfg.get("display_iter", 20))
        best_val, best_epoch = -1.0, -1
        t0 = time.perf_counter()
        for epoch in range(max_epoch):
            state, loss = train_step(state)
            val_acc = float(accuracy(state.params, splits["val"]))
            if epoch % display == 0:
                self.log.info(
                    "epoch %d | train CE %.4f | val acc %.4f",
                    epoch, float(loss), val_acc,
                )
                self.metrics.log(
                    "train", epoch=epoch, loss=float(loss), val_acc=val_acc
                )
            if val_acc > best_val:
                best_val, best_epoch = val_acc, epoch
                self.ckpt.save("best", state, {"epoch": epoch, "val_acc": val_acc})
            if epoch - best_epoch > patience:
                break
        wall = time.perf_counter() - t0
        state = self.ckpt.restore("best", state)
        test_acc = float(accuracy(state.params, splits["test"]))
        self.log.info(
            "best val acc %.4f | test acc %.4f | %.1fs", best_val, test_acc, wall
        )
        self.metrics.log("test", acc=test_acc, best_val=best_val, wall_s=wall)
        return {"best_val_acc": best_val, "test_acc": test_acc}
