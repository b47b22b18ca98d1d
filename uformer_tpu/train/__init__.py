from uformer_tpu.train.losses import charbonnier_loss, tv_loss  # noqa: F401
from uformer_tpu.train.schedules import (  # noqa: F401
    step_lr_schedule,
    warmup_cosine_schedule,
)
from uformer_tpu.train.train_step import (  # noqa: F401
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
