from hybrid_ode_tpu.train.online import adapt_subject, online_adaptation_eval
from hybrid_ode_tpu.train.loop import (
    TrainState,
    make_optimizer,
    make_train_step,
    make_eval_step,
    train_model,
)

__all__ = [
    "TrainState",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "train_model",
    "adapt_subject",
    "online_adaptation_eval",
]
