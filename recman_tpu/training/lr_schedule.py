"""Large-batch learning-rate recipes (BASELINE.json config 5).

The reference cites the Keskar large-batch paper in its README (README.md:
9-10) but implements nothing. Standard practice for 64K+ batches:

- linear scaling: lr = base_lr * (batch / base_batch)       [Goyal et al.]
- warmup from ~0 to the scaled lr over the first k steps
- optional cosine/linear decay to zero over the remaining steps
- LAMB (create_optimizer("lamb", ...)) when pure scaling stops converging
  [You et al., arXiv:1904.00962]

All builders return optax schedules usable as the ``learning_rate`` of any
optimizer from training.create_optimizer.
"""

from __future__ import annotations

import optax


def linear_scaled_lr(base_lr: float, batch_size: int, base_batch_size: int = 256) -> float:
    """lr scaled linearly with batch size."""
    return base_lr * (batch_size / base_batch_size)


def warmup_schedule(peak_lr: float, warmup_steps: int, total_steps: int | None = None,
                    decay: str = "none"):
    """Linear warmup 0 -> peak, then constant / cosine / linear decay."""
    warm = optax.linear_schedule(0.0, peak_lr, max(warmup_steps, 1))
    if decay == "none" or total_steps is None:
        return optax.join_schedules([warm, optax.constant_schedule(peak_lr)],
                                    [warmup_steps])
    rest = max(total_steps - warmup_steps, 1)
    if decay == "cosine":
        tail = optax.cosine_decay_schedule(peak_lr, rest)
    elif decay == "linear":
        tail = optax.linear_schedule(peak_lr, 0.0, rest)
    else:
        raise ValueError(f"unknown decay {decay!r}")
    return optax.join_schedules([warm, tail], [warmup_steps])


def large_batch_schedule(base_lr: float, batch_size: int, base_batch_size: int,
                         warmup_steps: int, total_steps: int | None = None,
                         decay: str = "cosine"):
    """The full recipe: linear scaling + warmup + decay."""
    return warmup_schedule(
        linear_scaled_lr(base_lr, batch_size, base_batch_size),
        warmup_steps, total_steps, decay,
    )
