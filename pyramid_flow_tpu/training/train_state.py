"""Train state: AdamW + clipping + anomaly skip + EMA, all sharded.

Re-expression of the reference training machinery:
* AdamW betas (0.9, 0.95), weight decay 1e-4, no decay for 1-D params/biases
  (`trainer_misc/utils.py:149-250`, `train/train_pyramid_flow.py:488-513`)
* grad-norm clip 1.0 + skip-update on anomalous loss >= 2.0
  (`trainer_misc/fsdp_trainer.py:106-117`) — the skip is a ``where`` over the
  update, so it stays inside the jitted step
* EMA of parameters (`train/train_pyramid_flow.py:451-486`); sharded like the
  params, updated every ``ema_interval`` steps
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["TrainConfig", "TrainState", "create_train_state"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.95
    max_grad_norm: float = 1.0
    anomaly_loss_threshold: float = 2.0
    ema_decay: float = 0.9999
    ema_interval: int = 1
    lr_schedule: Optional[Callable] = None  # step -> lr; None = constant


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    config: TrainConfig = struct.field(pytree_node=False)

    def apply_gradients(self, grads, loss):
        """Clip, anomaly-gate, update, and refresh EMA — fully jittable."""
        cfg = self.config
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)

        # anomalous-batch skip (reference fsdp_trainer:111-115)
        ok = jnp.isfinite(loss) & (loss < cfg.anomaly_loss_threshold)
        new_params = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_params, self.params)
        new_opt_state = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_opt_state, self.opt_state)

        step = self.step + 1
        d = cfg.ema_decay
        do_ema = (step % cfg.ema_interval) == 0
        new_ema = jax.tree.map(
            lambda e, p: jnp.where(
                do_ema, d * e + (1 - d) * p.astype(e.dtype), e),
            self.ema_params, new_params)
        return self.replace(
            step=step, params=new_params, opt_state=new_opt_state,
            ema_params=new_ema)


def _decay_mask(params):
    """No weight decay for 1-D params (biases, norms) — reference
    ``get_parameter_groups`` (`trainer_misc/utils.py:149-204`)."""
    return jax.tree.map(lambda p: p.ndim > 1, params)


def create_train_state(params, config: TrainConfig = TrainConfig()) -> TrainState:
    lr = config.lr_schedule if config.lr_schedule is not None else config.learning_rate
    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adamw(
            learning_rate=lr,
            b1=config.beta1,
            b2=config.beta2,
            weight_decay=config.weight_decay,
            mask=_decay_mask(params),
        ),
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        # jnp.array(copy=True): astype is a no-op for fp32 params, and an
        # aliased ema would make donated train steps donate a buffer twice
        ema_params=jax.tree.map(
            lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params),
        tx=tx,
        config=config,
    )
