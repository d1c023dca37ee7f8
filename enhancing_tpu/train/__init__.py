from .optim import (
    ExponentialDecayScheduler,
    LambdaWarmUpCosineScheduler,
    LambdaWarmUpLinearScheduler,
    make_ae_optimizer,
    make_gpt_optimizer,
)
from .steps import (
    GANTrainState,
    TrainState,
    make_cond_transformer_train_step,
    make_vitvq_eval_step,
    make_vitvq_train_step,
)
from .trainer import Trainer

__all__ = [
    "Trainer", "GANTrainState", "TrainState",
    "make_vitvq_train_step", "make_vitvq_eval_step",
    "make_cond_transformer_train_step",
    "ExponentialDecayScheduler", "LambdaWarmUpCosineScheduler",
    "LambdaWarmUpLinearScheduler", "make_ae_optimizer", "make_gpt_optimizer",
]
