"""Row-wise Adam for embedding tables: the DLRM-style optimizer recipe.

The dense Adam sweep over 26 (V, 16) tables + full-shape moments moves
~1.16 GB/step on the bench config (7 passes over 167 MB of packed
params) — profiled at ~1.4 ms of the 15 ms step. Industry CTR systems
(DLRM's row-wise AdaGrad; Adafactor's factored second moment) keep ONE
second-moment scalar per embedding ROW: rows are updated-or-not as a
unit (a row's gradient exists only when its id was in the batch), so a
per-row learning-rate scale loses almost nothing while cutting the
second-moment state and its read+write traffic by k (16x here).
Optionally the first moment is stored in bfloat16 (mu_dtype) for
another ~2 passes of halved traffic.

``rowwise_adam(lr)`` partitions a FLAT name-keyed param dict (this
framework's model contract, models/base.py): 2-D ``*_feat_embed``
tables get the rowwise/bf16-m scaling; every other param gets exact
optax.adam math. The reference has no counterpart (its optimizer menu
is plain adam/adagrad/gd/momentum, recman/tf/utils.py:201-213) — this
is a beyond-reference, quality-gated option (``create_optimizer(
"rowwise_adam", ...)``); BASELINE.md records the gates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class ScaleByRowwiseAdamState(NamedTuple):
    count: jnp.ndarray  # ()
    mu: dict  # first moment, param-shaped (optionally bf16)
    nu: dict  # second moment, (V,) per 2-D param


def scale_by_rowwise_adam(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """Adam scaling with a ROW-WISE second moment for 2-D params.

    For a (V, k) param: nu is (V,), updated with the row-mean of g**2;
    the per-row denominator sqrt(nu_hat[v]) + eps scales the whole row.
    1-D params degenerate to exact elementwise Adam (mean over a
    single element), so only 2-D tables see the approximation.
    """

    def init_fn(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
        )
        nu = jax.tree.map(
            lambda p: jnp.zeros(p.shape[:1] if p.ndim == 2 else p.shape,
                                dtype=p.dtype),
            params,
        )
        return ScaleByRowwiseAdamState(
            count=jnp.zeros((), jnp.int32), mu=mu, nu=nu
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, mu, nu):
            mu_f = mu.astype(g.dtype)
            mu_new = b1 * mu_f + (1.0 - b1) * g
            g2 = jnp.mean(g * g, axis=1) if g.ndim == 2 else g * g
            nu_new = b2 * nu + (1.0 - b2) * g2
            denom = jnp.sqrt(nu_new / bc2) + eps
            if g.ndim == 2:
                denom = denom[:, None]
            step = (mu_new / bc1) / denom
            return step, mu_new.astype(mu.dtype), nu_new

        flat = {}
        for name, g in updates.items():
            if getattr(g, "ndim", None) is None:
                # optax.MaskedNode under multi_transform: not ours to touch
                flat[name] = (g, state.mu[name], state.nu[name])
            else:
                flat[name] = upd(g, state.mu[name], state.nu[name])
        steps = {n: v[0] for n, v in flat.items()}
        mu = {n: v[1] for n, v in flat.items()}
        nu = {n: v[2] for n, v in flat.items()}
        return steps, ScaleByRowwiseAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _is_table(name: str, param) -> bool:
    return name.endswith("_feat_embed") and getattr(param, "ndim", 0) == 2


def rowwise_adam(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """Embedding tables -> rowwise/bf16-m Adam; everything else -> exact
    optax.adam. Accepts a float or schedule learning rate."""
    return optax.multi_transform(
        {
            "table": optax.chain(
                scale_by_rowwise_adam(b1, b2, eps, mu_dtype),
                optax.scale_by_learning_rate(learning_rate),
            ),
            "rest": optax.adam(learning_rate, b1=b1, b2=b2, eps=eps),
        },
        param_labels=lambda params: {
            name: "table" if _is_table(name, p) else "rest"
            for name, p in params.items()
        },
    )
