"""The jitted data-parallel train step.

TPU-native DP (SURVEY.md section 2.7): batch sharded over the mesh's 'dp'
axis, params replicated; jit + shardings make XLA insert the gradient
all-reduce over ICI — the NCCL sync in `main.py:212` has no user-level
equivalent here.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from bdm_tpu.parallel.mesh import batch_sharding, replicate
from bdm_tpu.train.state import TrainState, ema_update


def make_train_step(loss_fn: Callable, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None) -> Callable:
    """Build `step(state, batch, key) -> (state, metrics)`.

    loss_fn(params, batch, key) -> scalar loss.
    metrics: {'loss', 'grad_norm'} (the reference logs both,
    `main.py:239-252`).
    """

    def step(state: TrainState, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, key)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        new_step = state.step + 1
        ema_params = state.ema_params
        if ema_params is not None:
            do_update = (new_step % state.ema_update_every) == 0
            ema_params = jax.tree_util.tree_map(
                lambda e, p: jnp.where(
                    do_update, state.ema_decay * e + (1 - state.ema_decay) * p,
                    e),
                ema_params, params)

        new_state = state.replace(params=params, opt_state=opt_state,
                                  step=new_step, ema_params=ema_params)
        return new_state, {"loss": loss, "grad_norm": grad_norm}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    rep = replicate(mesh)
    data = batch_sharding(mesh)
    # params/opt replicated; batch sharded on dp (a single sharding
    # broadcasts over the batch pytree); key replicated.
    return jax.jit(
        step,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
