from gavit_tpu.training.losses import (  # noqa: F401
    dynamic_weighted_loss,
    init_criterion_params,
    get_loss_weights,
)
from gavit_tpu.training.schedule import warmup_cosine_schedule  # noqa: F401
from gavit_tpu.training.optimizer import make_optimizer  # noqa: F401
from gavit_tpu.training.trainer import Trainer, TrainState  # noqa: F401
