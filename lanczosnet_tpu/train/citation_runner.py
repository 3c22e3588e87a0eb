"""Full-graph citation experiment runner (Cora/Citeseer/Pubmed family).

The second runner next to QM8Runner: semi-supervised node
classification on ONE large graph, Planetoid protocol — full-batch
gradient steps on the training-node mask, early stopping on validation
accuracy, best-snapshot test evaluation. The graph lives device-
resident for the whole run; on a multi-device mesh its node axis is
sharded (`parallel.mesh.shard_full_graph`) so operator rows and node
states split across chips and XLA's collectives carry the contractions
(the node-axis scaling path promised in SURVEY.md §2.6/§5).
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

from lanczosnet_tpu.data.citation import (
    import_planetoid,
    pack_citation,
    synthetic_citation_graph,
)
from lanczosnet_tpu.models import build_model
from lanczosnet_tpu.parallel.mesh import make_mesh, replicate_sharding, shard_full_graph
from lanczosnet_tpu.parallel import multihost
from lanczosnet_tpu.train.checkpoint import Checkpointer
from lanczosnet_tpu.train.node_step import make_node_eval_step, make_node_train_step
from lanczosnet_tpu.utils.profiling import program_cost
from lanczosnet_tpu.train.optim import build_optimizer
from lanczosnet_tpu.train.step import init_state
from lanczosnet_tpu.utils.cache import enable_compilation_cache, set_prng_impl
from lanczosnet_tpu.utils.logger import MetricsLogger, get_logger


class CitationRunner:
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

        dcfg = config.dataset
        mcfg = dict(config.model)
        mcfg["task"] = "node"
        num_eig_vec = (
            int(mcfg.get("num_eig_vec", 20))
            if mcfg["name"] in ("LanczosNet",)
            else 0
        )

        if dcfg.get("source", "synthetic") == "planetoid":
            graph = import_planetoid(dcfg["data_dir"], dcfg["name"])
        else:
            graph = synthetic_citation_graph(
                dcfg.get("name", "cora"),
                seed=int(dcfg.get("seed", 7)),
                scale=float(dcfg.get("scale", 1.0)),
            )

        ndev = int(config.train.get("num_devices", 0)) or len(jax.devices())
        self.mesh = make_mesh(ndev)
        batch, splits = pack_citation(
            graph,
            pad_to=self.mesh.size,
            operator_kind=dcfg.get("operator_kind", "sym"),
            num_eig_vec=num_eig_vec,
            num_cluster=(
                int(mcfg.get("num_partition", 0))
                if mcfg["name"] == "GPNN"
                else 0
            ),
        )
        self.n_pad = batch.mask.shape[1]
        self.batch = shard_full_graph(batch, self.mesh, self.n_pad)
        rsh = replicate_sharding(self.mesh)
        nsh = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(None, "data")
        )
        self.splits = {k: jax.device_put(v, nsh) for k, v in splits.items()}
        self._rsh = rsh

        mcfg.setdefault("num_atom", 2)
        mcfg["num_task"] = int(graph["num_class"])
        self.model = build_model(mcfg)
        self.log.info(
            "citation runner: model=%s dataset=%s nodes=%d (pad %d) "
            "classes=%d devices=%d",
            mcfg["name"], dcfg.get("name", "cora"),
            int(np.asarray(batch.mask).sum()), self.n_pad,
            graph["num_class"], self.mesh.size,
        )

    def train(self) -> dict:
        tcfg = self.config.train
        tx, schedule = build_optimizer(tcfg, steps_per_epoch=1)
        train_step = make_node_train_step(self.model, tx)
        eval_step = make_node_eval_step(self.model)

        state = init_state(self.model, self.batch, tx, seed=int(self.config.seed))
        state = jax.tree.map(lambda x: jax.device_put(x, self._rsh), state)

        max_epoch = int(tcfg.get("max_epoch", 200))
        patience = int(tcfg.get("patience", 50))
        display = int(tcfg.get("display_iter", 20))
        snapshot_every = max(1, int(tcfg.get("snapshot_epoch", 50)))
        start_epoch = 0
        best_val, best_epoch = -1.0, -1
        if tcfg.get("is_resume") and self.ckpt.exists("latest"):
            state = self.ckpt.restore("latest", state)
            meta = self.ckpt.meta("latest") or {}
            start_epoch = int(meta.get("epoch", -1)) + 1
            best_meta = self.ckpt.meta("best") or {}
            best_val = float(best_meta.get("val_acc", -1.0))
            best_epoch = int(best_meta.get("epoch", -1))
            self.log.info(
                "resumed from epoch %d (best val so far %.4f)",
                start_epoch, best_val,
            )
        elif tcfg.get("resume_model"):
            state = Checkpointer.restore_file(tcfg["resume_model"], state)
            self.log.info("warm-started from %s", tcfg["resume_model"])
        t0 = time.perf_counter()
        for epoch in range(start_epoch, max_epoch):
            state, loss = train_step(state, self.batch, self.splits["train"])
            if epoch == start_epoch:
                # free once compiled (reuses the jit cache entry)
                cost = program_cost(
                    train_step, state, self.batch, self.splits["train"]
                )
                if cost:
                    self.log.info("node train-step program cost: %s", cost)
                    self.metrics.log(
                        "program_cost", program="train_step", **cost
                    )
            c, n, ce = eval_step(state.params, self.batch, self.splits["val"])
            val_acc = float(c) / max(float(n), 1.0)
            if epoch % display == 0:
                self.log.info(
                    "epoch %d | train CE %.4f | val acc %.4f | lr %.2e",
                    epoch, float(loss), val_acc, float(schedule(epoch)),
                )
                self.metrics.log(
                    "train", epoch=epoch, loss=float(loss), val_acc=val_acc
                )
            if val_acc > best_val:
                best_val, best_epoch = val_acc, epoch
                self.ckpt.save("best", state, {"epoch": epoch, "val_acc": val_acc})
            if (epoch + 1) % snapshot_every == 0:
                self.ckpt.save("latest", state, {"epoch": epoch})
            if epoch - best_epoch > patience:
                self.log.info("early stop at epoch %d", epoch)
                break
        wall = time.perf_counter() - t0

        multihost.barrier("restore_best")
        state = self.ckpt.restore("best", state)
        c, n, _ = eval_step(state.params, self.batch, self.splits["test"])
        test_acc = float(c) / max(float(n), 1.0)
        self.log.info(
            "best val acc %.4f (epoch %d) | test acc %.4f | %.1fs total",
            best_val, best_epoch, test_acc, wall,
        )
        self.metrics.log("test", acc=test_acc, best_val=best_val, wall_s=wall)
        return {"best_val_acc": best_val, "test_acc": test_acc}

    def test(self) -> dict:
        tcfg = self.config.get("test", {})
        tx, _ = build_optimizer(self.config.train, 1)
        eval_step = make_node_eval_step(self.model)
        state = init_state(self.model, self.batch, tx, seed=int(self.config.seed))
        path = tcfg.get("test_model")
        if path:
            state = Checkpointer.restore_file(path, state)
        elif self.ckpt.exists("best"):
            state = self.ckpt.restore("best", state)
        else:
            raise FileNotFoundError("no checkpoint: set test.test_model or train")
        c, n, _ = eval_step(state.params, self.batch, self.splits["test"])
        acc = float(c) / max(float(n), 1.0)
        self.log.info("test acc %.4f", acc)
        self.metrics.log("test", acc=acc)
        return {"test_acc": acc}
