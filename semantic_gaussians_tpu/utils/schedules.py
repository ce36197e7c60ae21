"""Learning-rate schedules.

Parity: get_expon_lr_func (/root/reference/utils/general_utils.py:32-63) — the
log-linear interpolation with optional delay used for the xyz learning rate.
Returned callables take a (possibly traced) int step and return a scalar, so
they slot into optax.scale_by_schedule / inject_hyperparams.
"""
from __future__ import annotations

import jax.numpy as jnp


def expon_lr_schedule(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        # lr_final == 0 would make log(0) * t = -inf * 0 = NaN at t == 0
        # (the very first step), poisoning the whole parameter group; decay
        # toward a tiny positive floor instead (indistinguishable at f32).
        lr_final_safe = max(lr_final, 1e-30)  # f32-normal (XLA flushes subnormals)
        log_lerp = jnp.exp(
            jnp.log(lr_init) * (1 - t) + jnp.log(lr_final_safe) * t
        )
        lr = delay_rate * log_lerp
        # Reference returns 0 when step < 0 or lr_init == 0 (disabled groups).
        disabled = (step < 0) | (lr_init == 0.0)
        return jnp.where(disabled, 0.0, lr)

    return schedule


def cosine_annealing_schedule(lr_init: float, total_steps: int, lr_min: float = 0.0):
    """torch.optim.lr_scheduler.CosineAnnealingLR equivalent
    (/root/reference/distill.py:73)."""

    def schedule(step):
        t = jnp.clip(jnp.asarray(step, jnp.float32) / total_steps, 0.0, 1.0)
        return lr_min + 0.5 * (lr_init - lr_min) * (1 + jnp.cos(jnp.pi * t))

    return schedule
