"""Jitted train / eval steps.

The reference's per-batch hot loop (SURVEY.md §3.1) is five Python-level
stages: H2D copy → forward → backward → optimizer step → logging. Here
the middle three are ONE donated, jit-compiled XLA program: fwd + bwd +
optax update fuse, params/opt-state stay device-resident the entire
run, and under a data mesh XLA inserts the gradient all-reduce over
ICI automatically (there is no DataParallel equivalent to write).

Loss is ghost-aware masked MAE (reference: `nn.L1Loss` on standardized
labels): tail batches are padded with zero-mask ghost graphs by the
loader, weighted out here, so one static batch shape serves every step.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp

from lanczosnet_tpu.core.graph_batch import GraphBatch


@flax.struct.dataclass
class TrainState:
    """Device-resident training state (params ⊕ optimizer ⊕ step ⊕ rng)."""

    params: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array


def weighted_mae(
    pred: jnp.ndarray, label: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """MAE over (valid graphs × tasks); ghost graphs contribute 0."""
    err = jnp.abs(pred - label) * valid[:, None]
    denom = jnp.maximum(jnp.sum(valid) * label.shape[-1], 1.0)
    return jnp.sum(err) / denom


def init_state(
    model, batch: GraphBatch, tx, seed: int = 0
) -> TrainState:
    """Initialize params + optimizer state from one example batch."""
    rng = jax.random.PRNGKey(seed)
    p_rng, d_rng, s_rng = jax.random.split(rng, 3)
    params = model.init(
        {"params": p_rng, "dropout": d_rng}, batch, deterministic=True
    )["params"]
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=s_rng,
    )


def make_train_step(model, tx) -> Callable:
    """Donated jitted step: (state, batch, valid) → (state, loss)."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: GraphBatch, valid: jnp.ndarray):
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            pred = model.apply(
                {"params": params},
                batch,
                deterministic=False,
                rngs={"dropout": dropout_rng},
            )
            return weighted_mae(pred, batch.label, valid)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return (
            TrainState(
                params=params, opt_state=opt_state, step=state.step + 1, rng=rng
            ),
            loss,
        )

    return train_step


def make_eval_step(model) -> Callable:
    """Jitted eval: (params, batch, valid) → (per-task |err| sums [T], count).

    Sufficient statistics only — the caller aggregates across batches
    and divides once, so per-task MAE is exact regardless of ghost
    padding or batch count.
    """

    @jax.jit
    def eval_step(params, batch: GraphBatch, valid: jnp.ndarray):
        pred = model.apply({"params": params}, batch, deterministic=True)
        err = jnp.abs(pred - batch.label) * valid[:, None]
        return jnp.sum(err, axis=0), jnp.sum(valid)

    return eval_step
