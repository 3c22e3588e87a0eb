"""Optimizer + LR-schedule factory from the YAML ``train:`` section.

Parity with reference `runner/qm8_runner.py` optimizer setup
(SURVEY.md §3.1): Adam or SGD+momentum with weight decay, and the
reference's `MultiStepLR(lr_decay_steps, gamma=lr_decay)` expressed as
`optax.piecewise_constant_schedule`. Epoch-denominated decay points are
converted to step counts by the caller (runner knows steps/epoch).
"""

from __future__ import annotations

from typing import Sequence

import optax


def build_optimizer(
    train_cfg: dict,
    steps_per_epoch: int = 1,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Build the optax transform + the schedule (returned for logging).

    Recognized keys (reference names): ``optimizer`` (Adam|SGD), ``lr``,
    ``momentum``, ``wd``, ``lr_decay``, ``lr_decay_epoch`` (list of
    epochs) or ``lr_decay_steps`` (list of steps), ``grad_clip``.
    """
    base_lr = float(train_cfg.get("lr", 1e-3))
    decay = float(train_cfg.get("lr_decay", 0.1))
    if "lr_decay_steps" in train_cfg:
        boundaries = [int(s) for s in train_cfg["lr_decay_steps"]]
    else:
        boundaries = [
            int(e) * steps_per_epoch for e in train_cfg.get("lr_decay_epoch", [])
        ]
    # Repeated milestones must compound (torch MultiStepLR semantics):
    # two epochs resolving to the same step boundary apply decay twice.
    scales: dict[int, float] = {}
    for b in boundaries:
        scales[b] = scales.get(b, 1.0) * decay
    schedule = optax.piecewise_constant_schedule(base_lr, scales)

    name = str(train_cfg.get("optimizer", "Adam")).lower()
    wd = float(train_cfg.get("wd", 0.0))
    chain: list[optax.GradientTransformation] = []
    if train_cfg.get("grad_clip"):
        chain.append(optax.clip_by_global_norm(float(train_cfg["grad_clip"])))
    # L2 is added to the gradient BEFORE the optimizer statistics —
    # torch's Adam/SGD(weight_decay=) coupled semantics, which the
    # reference uses — not decoupled AdamW.
    if wd:
        chain.append(optax.add_decayed_weights(wd))
    if name == "adam":
        chain.append(optax.scale_by_adam())
    elif name == "sgd":
        mom = float(train_cfg.get("momentum", 0.0))
        if mom:
            chain.append(optax.trace(decay=mom, nesterov=False))
    else:
        raise ValueError(f"unknown optimizer {name!r} (Adam|SGD)")
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain), schedule
