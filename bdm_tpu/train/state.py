"""TrainState pytree + EMA.

Reference: `TrainState` (`training_utils.py:23-27`), torch_ema EMA with
decay 0.999 applied every `update_every`=20 steps (`main.py:80-89,254-256`,
`config/structured.py:194-198`).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32
    ema_params: Optional[Any] = None
    best_val: Optional[jnp.ndarray] = None

    # static config
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.999)
    ema_update_every: int = flax.struct.field(pytree_node=False, default=20)


def create_train_state(params, tx: optax.GradientTransformation,
                       use_ema: bool = False, ema_decay: float = 0.999,
                       ema_update_every: int = 20) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if use_ema
        else None,
        ema_decay=ema_decay,
        ema_update_every=ema_update_every,
    )


def ema_update(ema_params, params, decay: float):
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)
