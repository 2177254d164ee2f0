"""Training: optimizer/schedule factories, EMA, train steps, checkpoints.

Rebuilds `experiments/training_utils.py` + the `main*.py` loop scaffolding:
AdamW with no-decay groups (`training_utils.py:42-53`), transformers-style
linear/cosine warmup schedules (`config/structured.py:236-263`), grad clip
50.0 (`structured.py:209`), EMA decay 0.999 every 20 steps
(`structured.py:194-198`, `main.py:254-256`), NaN-loss hard stop
(`main.py:231-234`), and checkpoint/resume (orbax replacing torch.save,
`main.py:259-274` / `training_utils.py:273-346`).
"""

from bdm_tpu.train.optimizers import (
    make_optimizer,
    make_lr_schedule,
    fusion_freeze_mask,
)
from bdm_tpu.train.state import TrainState, create_train_state
from bdm_tpu.train.step import make_train_step
from bdm_tpu.train.checkpoint import save_checkpoint, restore_checkpoint
from bdm_tpu.train.loop import train_loop
from bdm_tpu.train.metrics import MetricLogger

__all__ = [
    "make_optimizer",
    "make_lr_schedule",
    "fusion_freeze_mask",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "save_checkpoint",
    "restore_checkpoint",
    "train_loop",
    "MetricLogger",
]
