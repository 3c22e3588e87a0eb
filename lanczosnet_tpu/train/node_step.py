"""Jitted steps for full-graph node classification (citation configs).

Same TrainState/donation design as train/step.py; the loss is softmax
cross-entropy over the supervised-node mask, metrics are exact masked
accuracy sufficient statistics.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.train.step import TrainState


def masked_ce_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, sup_mask: jnp.ndarray
) -> jnp.ndarray:
    """Mean CE over supervised nodes. logits [B,N,C], labels [B,N]."""
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return jnp.sum(ce * sup_mask) / jnp.maximum(jnp.sum(sup_mask), 1.0)


def make_node_train_step(model, tx, weight_decay_mask=None) -> Callable:
    """(state, batch, sup_mask) → (state, loss)."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: GraphBatch, sup_mask: jnp.ndarray):
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            logits = model.apply(
                {"params": params},
                batch,
                deterministic=False,
                rngs={"dropout": dropout_rng},
            )
            return masked_ce_loss(logits, batch.node_label, sup_mask)

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


def make_node_eval_step(model) -> Callable:
    """(params, batch, sup_mask) → (correct_count, count, mean_ce)."""

    @jax.jit
    def eval_step(params, batch: GraphBatch, sup_mask: jnp.ndarray):
        logits = model.apply({"params": params}, batch, deterministic=True)
        pred = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((pred == batch.node_label) * sup_mask)
        count = jnp.sum(sup_mask)
        ce = masked_ce_loss(logits, batch.node_label, sup_mask)
        return correct, count, ce

    return eval_step
