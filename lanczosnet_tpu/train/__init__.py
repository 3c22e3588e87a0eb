from lanczosnet_tpu.train.optim import build_optimizer  # noqa: F401
from lanczosnet_tpu.train.step import (  # noqa: F401
    TrainState,
    make_train_step,
    make_eval_step,
    init_state,
)
from lanczosnet_tpu.train.checkpoint import Checkpointer  # noqa: F401
from lanczosnet_tpu.train.runner import QM8Runner, RUNNER_REGISTRY, build_runner  # noqa: F401
