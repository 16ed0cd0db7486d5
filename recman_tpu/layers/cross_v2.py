"""CrossNetV2 — the DCN-V2 cross tower (arXiv:2008.13535).

Beyond-reference addition (the reference's model set ends at DCN v1,
whose CrossNet it lost — SURVEY.md §2.2): DCN-V2 replaces v1's rank-1
vector interaction with a FULL (or low-rank) weight matrix per layer,
optionally as a mixture of low-rank experts with a softmax gate:

    full:      x_{l+1} = x0 ⊙ (W_l x_l + b_l) + x_l          W_l (d, d)
    low-rank:  W_l = U_l V_lᵀ                                 (d, r) each
    mixture:   x_{l+1} = x0 ⊙ Σ_e g_e(x_l) U_e(V_eᵀ x_l) + b + x_l

All variants are dense matmuls over (B, d) — MXU-native; the low-rank
form cuts layer FLOPs from d² to 2dr.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import glorot_normal, l2_loss
from .common import split_rng


class CrossNetV2:
    """Params (low-rank, per layer i / expert e): ``cross_v2_u_{i}_{e}``
    (d, r), ``cross_v2_v_{i}_{e}`` (d, r), gate ``cross_v2_gate_{i}``
    (d, E) when E > 1, bias ``cross_v2_b_{i}`` (d,). Full-rank
    (rank=None): ``cross_v2_w_{i}`` (d, d). Head: ``cross_v2_w`` (d, 1),
    ``cross_v2_w0`` (1,)."""

    def __init__(self, input_dim, num_layers=3, rank=None, num_experts=1,
                 l2_reg=0.0, gated=False, prefix=""):
        assert num_layers > 0 and num_experts >= 1
        assert rank is not None or num_experts == 1, (
            "mixture-of-experts requires low-rank experts (set rank)"
        )
        assert not (gated and rank is not None), (
            "the GDCN gate (arXiv:2311.04635) is defined on full-rank "
            "cross layers"
        )
        self.input_dim = input_dim
        self.num_layers = num_layers
        self.rank = rank
        self.num_experts = num_experts
        self.l2_reg = l2_reg
        self.gated = gated
        self.prefix = prefix

    def _layer_param_names(self, i):
        names = [f"{self.prefix}cross_v2_b_{i}"]
        if self.rank is None:
            names.append(f"{self.prefix}cross_v2_w_{i}")
            if self.gated:
                names.append(f"{self.prefix}cross_v2_wg_{i}")
        else:
            for e in range(self.num_experts):
                names.append(f"{self.prefix}cross_v2_u_{i}_{e}")
                names.append(f"{self.prefix}cross_v2_v_{i}_{e}")
            if self.num_experts > 1:
                names.append(f"{self.prefix}cross_v2_gate_{i}")
        return names

    def init(self, key) -> dict:
        d, r = self.input_dim, self.rank
        keys = split_rng(key, self.num_layers * (2 * self.num_experts + 2) + 1)
        ki = iter(keys)
        params = {}
        for i in range(self.num_layers):
            params[f"{self.prefix}cross_v2_b_{i}"] = jnp.zeros(
                (d,), dtype=jnp.float32
            )
            if r is None:
                params[f"{self.prefix}cross_v2_w_{i}"] = glorot_normal(
                    next(ki), (d, d)
                )
                if self.gated:
                    params[f"{self.prefix}cross_v2_wg_{i}"] = glorot_normal(
                        next(ki), (d, d)
                    )
            else:
                for e in range(self.num_experts):
                    params[f"{self.prefix}cross_v2_u_{i}_{e}"] = glorot_normal(
                        next(ki), (d, r)
                    )
                    params[f"{self.prefix}cross_v2_v_{i}_{e}"] = glorot_normal(
                        next(ki), (d, r)
                    )
                if self.num_experts > 1:
                    params[f"{self.prefix}cross_v2_gate_{i}"] = glorot_normal(
                        next(ki), (d, self.num_experts)
                    )
        params[f"{self.prefix}cross_v2_w"] = glorot_normal(
            next(ki), (d, 1)
        )
        params[f"{self.prefix}cross_v2_w0"] = jnp.zeros((1,), dtype=jnp.float32)
        return params

    def features(self, params, inputs):
        """The cross tower's (B, d) feature output (no head) — DCN-V2's
        stacked structure feeds this into the deep tower."""
        assert inputs.ndim == 2  # (B, d)
        x0 = inputs
        x = inputs
        for i in range(self.num_layers):
            b = params[f"{self.prefix}cross_v2_b_{i}"]
            info_gate = None
            if self.rank is None:
                inter = x @ params[f"{self.prefix}cross_v2_w_{i}"]
                if self.gated:
                    # GDCN (arXiv:2311.04635): information gate filters each
                    # cross term; x_{l+1} = x0 ⊙ (W_c x + b) ⊙ σ(W_g x) + x
                    info_gate = jax.nn.sigmoid(
                        x @ params[f"{self.prefix}cross_v2_wg_{i}"]
                    )
            else:
                outs = []
                for e in range(self.num_experts):
                    u = params[f"{self.prefix}cross_v2_u_{i}_{e}"]
                    v = params[f"{self.prefix}cross_v2_v_{i}_{e}"]
                    outs.append((x @ v) @ u.T)  # (B, d)
                if self.num_experts == 1:
                    inter = outs[0]
                else:
                    gate = jax.nn.softmax(
                        x @ params[f"{self.prefix}cross_v2_gate_{i}"], axis=-1
                    )  # (B, E)
                    inter = sum(
                        outs[e] * gate[:, e : e + 1]
                        for e in range(self.num_experts)
                    )
            cross = x0 * (inter + b)
            if info_gate is not None:
                cross = cross * info_gate
            x = cross + x
        return x

    def apply(self, params, inputs, training=True, rng=None):
        x = self.features(params, inputs)
        return x @ params[f"{self.prefix}cross_v2_w"] + params[
            f"{self.prefix}cross_v2_w0"
        ]

    def l2(self, params):
        total = self.l2_reg * l2_loss(params[f"{self.prefix}cross_v2_w"])
        for i in range(self.num_layers):
            for name in self._layer_param_names(i):
                if not name.endswith(f"_b_{i}"):
                    total += self.l2_reg * l2_loss(params[name])
        return total
