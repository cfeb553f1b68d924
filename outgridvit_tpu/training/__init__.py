from outgridvit_tpu.training.optim import (  # noqa: F401
    make_optimizer,
    warmup_cosine_lr,
)
from outgridvit_tpu.training.losses import (  # noqa: F401
    cross_entropy_smoothed,
    soft_target_cross_entropy,
)
from outgridvit_tpu.training.metrics import accuracy_topk  # noqa: F401
from outgridvit_tpu.training.mixing import apply_mixup_cutmix  # noqa: F401
from outgridvit_tpu.training.train_state import TrainState  # noqa: F401
from outgridvit_tpu.training.steps import make_eval_step, make_train_step  # noqa: F401
from outgridvit_tpu.training.loop import train_model  # noqa: F401
