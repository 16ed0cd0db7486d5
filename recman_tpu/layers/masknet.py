"""MaskNet building blocks (arXiv:2102.07619).

Beyond-reference layers. A MaskBlock multiplies its input by an
*instance-guided mask* — a two-layer aggregation/projection MLP computed
from the raw feature embeddings — then projects through a hidden matrix
with layer normalization and ReLU:

    mask  = (relu(V_emb @ W_agg + b_agg)) @ W_proj + b_proj    (eq. 8-9)
    V_out = relu(LN((mask * x) @ W_hid))                       (eq. 10-13)

Two topologies in the paper, both built from this block: SerialMaskNet
(blocks chained like an MLP) and ParallelMaskNet (blocks side by side on
the embeddings, a small MLP head on the concat). See models/masknet.py.

Everything is (B, D)-shaped dense matmul work — MXU-friendly; the mask
path adds two small GEMMs per block. Layer norm is over the last axis
with learnable gain/bias (one (D,) pair per normalized tensor, shared
across fields for the embedding LN, per the common public formulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import glorot_normal, l2_loss
from .common import split_rng


class LayerNorm:
    """LN over the last axis with learnable (dim,) gain/bias."""

    def __init__(self, dim: int, prefix: str, eps: float = 1e-6):
        self.dim = int(dim)
        self.prefix = prefix
        self.eps = float(eps)

    def init(self) -> dict:
        return {
            f"{self.prefix}ln_gamma": jnp.ones((self.dim,), dtype=jnp.float32),
            f"{self.prefix}ln_beta": jnp.zeros((self.dim,), dtype=jnp.float32),
        }

    def apply(self, params, x) -> jnp.ndarray:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * params[f"{self.prefix}ln_gamma"] + params[f"{self.prefix}ln_beta"]


class MaskBlock:
    """One instance-guided mask block: x, V_emb -> (B, output_dim)."""

    def __init__(
        self,
        mask_input_dim: int,
        input_dim: int,
        output_dim: int,
        agg_dim: int,
        l2_reg: float = 0.0,
        prefix: str = "mask_block_",
    ):
        self.mask_input_dim = int(mask_input_dim)
        self.input_dim = int(input_dim)
        self.output_dim = int(output_dim)
        self.agg_dim = int(agg_dim)
        self.l2_reg = float(l2_reg)
        self.prefix = prefix
        self.ln = LayerNorm(self.output_dim, prefix=prefix)

    def init(self, key) -> dict:
        k_agg, k_proj, k_hid = split_rng(key, 3)
        params = {
            f"{self.prefix}agg_w": glorot_normal(
                k_agg, (self.mask_input_dim, self.agg_dim)
            ),
            f"{self.prefix}agg_b": jnp.zeros((self.agg_dim,), dtype=jnp.float32),
            f"{self.prefix}proj_w": glorot_normal(
                k_proj, (self.agg_dim, self.input_dim)
            ),
            f"{self.prefix}proj_b": jnp.zeros((self.input_dim,), dtype=jnp.float32),
            f"{self.prefix}hidden_w": glorot_normal(
                k_hid, (self.input_dim, self.output_dim)
            ),
        }
        params.update(self.ln.init())
        return params

    def mask(self, params, mask_input) -> jnp.ndarray:
        """Instance-guided mask (B, input_dim) from raw embeddings."""
        a = jnp.maximum(
            mask_input @ params[f"{self.prefix}agg_w"]
            + params[f"{self.prefix}agg_b"],
            0.0,
        )
        return a @ params[f"{self.prefix}proj_w"] + params[f"{self.prefix}proj_b"]

    def apply(self, params, x, mask_input) -> jnp.ndarray:
        masked = x * self.mask(params, mask_input)
        hidden = masked @ params[f"{self.prefix}hidden_w"]
        return jnp.maximum(self.ln.apply(params, hidden), 0.0)

    def l2(self, params):
        if self.l2_reg == 0.0:
            return 0.0
        return self.l2_reg * (
            l2_loss(params[f"{self.prefix}agg_w"])
            + l2_loss(params[f"{self.prefix}proj_w"])
            + l2_loss(params[f"{self.prefix}hidden_w"])
        )
