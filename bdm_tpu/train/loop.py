"""The training loop.

Rebuild of the `main.py:183-303` epoch loop: jitted DP train step, grad
clip/accumulation inside the optax chain, EMA, periodic checkpointing,
NaN-loss hard stop (`main.py:231-234`), and metric logging.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from bdm_tpu.parallel.mesh import shard_batch
from bdm_tpu.train.checkpoint import save_checkpoint
from bdm_tpu.train.metrics import MetricLogger
from bdm_tpu.train.state import TrainState
from bdm_tpu.train.step import make_train_step


class NaNLossError(RuntimeError):
    pass


def train_loop(state: TrainState, loss_fn: Callable, tx, data_iter: Iterable,
               max_steps: int, key: jax.Array, mesh=None,
               checkpoint_dir: Optional[str] = None,
               checkpoint_freq: int = 1000, print_freq: int = 100,
               log_step_freq: int = 20,
               logger: Optional[MetricLogger] = None,
               lr_schedule: Optional[Callable] = None,
               callbacks: Optional[list] = None,
               profile_dir: Optional[str] = None,
               profile_steps: tuple = (10, 20)) -> TrainState:
    """Run up to `max_steps` optimizer steps over an infinite batch iterator.

    `data_iter` yields host batches; they are sharded onto the mesh here
    (per-host loading + device sharding replaces DDP's per-process
    DataLoader sharding). With `profile_dir` set, a jax.profiler trace of
    steps [profile_steps) is written there (the reference only has
    wall-clock meters — `training_utils.py:210-254`).
    """
    step_fn = make_train_step(loss_fn, tx, mesh=mesh)
    logger = logger or MetricLogger()
    callbacks = callbacks or []
    profiling = False

    t_start = time.time()
    start_step = int(state.step)
    # Track the step count on host: `int(state.step)` per iteration is a
    # blocking device round-trip that serializes dispatch (on a tunneled
    # device it dominated the step wall-clock); syncing only at the log
    # cadence lets the host run ahead and pipeline up to `log_step_freq`
    # steps into the device queue.
    step = start_step
    from bdm_tpu.data.loader import model_batch
    for batch in data_iter:
        if step >= max_steps:
            break
        batch = model_batch(batch)
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
        step += 1

        if profile_dir is not None:
            if step == profile_steps[0] and not profiling:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            elif step >= profile_steps[1] and profiling:
                jax.profiler.stop_trace()
                profiling = False

        if step % log_step_freq == 0 or step == max_steps:
            loss = float(metrics["loss"])
            if not np.isfinite(loss):
                # hard stop like the reference (`main.py:231-234`)
                raise NaNLossError(f"Loss is {loss} at step {step}.")
            logger.update(loss=loss, grad_norm=float(metrics["grad_norm"]))
            if lr_schedule is not None:
                logger.update(lr=float(lr_schedule(step)))
            logger.log_jsonl(step)

        if step % print_freq == 0:
            rate = (step - start_step) / max(1e-9, time.time() - t_start)
            print(f"step {step}/{max_steps}  {logger}  ({rate:.2f} it/s)")

        if checkpoint_dir is not None and step % checkpoint_freq == 0:
            save_checkpoint(checkpoint_dir, state)

        for cb in callbacks:
            cb(step, state, metrics)

    if profiling:
        jax.profiler.stop_trace()
    if checkpoint_dir is not None:
        save_checkpoint(checkpoint_dir, state)
    return state
