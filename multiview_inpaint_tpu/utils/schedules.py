"""Learning-rate schedules and small numeric helpers.

Parity with ``gs-simp/utils/general_utils.py:31-78`` (log-lerp exponential
decay with optional delayed cosine warm ramp; inverse sigmoid).
Schedules are pure jnp functions of the step so they can live inside a
jitted optax transform.
"""

from __future__ import annotations

import jax.numpy as jnp


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def expon_lr(step, lr_init: float, lr_final: float, max_steps: int,
             lr_delay_steps: int = 0, lr_delay_mult: float = 1.0):
    """Log-linearly interpolated LR with optional delayed start.

    Returns 0 when lr_init == lr_final == 0 (disabled group). ``step`` may be
    a traced array; all branching is arithmetic.
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, dtype=jnp.float32))
    step = jnp.asarray(step, dtype=jnp.float32)
    if lr_delay_steps > 0:
        pct = jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * pct)
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    # Negative steps mean "disabled" (reference convention); past max_steps
    # the clip above holds the final LR.
    return jnp.where(step >= 0, delay_rate * log_lerp, 0.0)
