"""SENET field reweighting + bilinear field interactions (FiBiNET,
arXiv:1905.09433).

Beyond-reference layers. SENET squeezes each field embedding to a scalar
(mean over k), runs a 2-layer excitation MLP over the F field scalars, and
rescales the field vectors — a (B, F) elementwise path, negligible next to
the towers. The bilinear interaction replaces FM's inner product with
p_ij = (v_i · W) ⊙ v_j; the three weight-sharing schemes of the paper are
supported:

- "all":         one shared (k, k) W
- "each":        a (k, k) W_i per FIELD i
- "interaction": a (k, k) W_ij per PAIR (i, j), i < j

All three compile to one batched einsum over a STATIC pair-index gather
(no per-pair Python ops in the traced graph), so F up to the Criteo 39
stays a single MXU contraction.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..utils import glorot_normal, l2_loss
from .common import split_rng


class SENETLayer:
    """(B, F, k) -> (B, F, k) with per-(example, field) learned scales."""

    def __init__(self, num_fields: int, reduction_ratio: int = 3,
                 l2_reg: float = 0.0, prefix: str = "senet_"):
        self.num_fields = int(num_fields)
        self.reduced = max(1, self.num_fields // int(reduction_ratio))
        self.l2_reg = float(l2_reg)
        self.prefix = prefix

    def init(self, key) -> dict:
        k1, k2 = split_rng(key, 2)
        return {
            f"{self.prefix}w1": glorot_normal(k1, (self.num_fields, self.reduced)),
            f"{self.prefix}w2": glorot_normal(k2, (self.reduced, self.num_fields)),
        }

    def apply(self, params, embeddings) -> jnp.ndarray:
        assert embeddings.ndim == 3
        z = jnp.mean(embeddings, axis=2)  # squeeze: (B, F)
        a = jax_relu(z @ params[f"{self.prefix}w1"])
        a = jax_relu(a @ params[f"{self.prefix}w2"])  # (B, F)
        return embeddings * a[:, :, None]

    def l2(self, params):
        return self.l2_reg * (
            l2_loss(params[f"{self.prefix}w1"]) + l2_loss(params[f"{self.prefix}w2"])
        )


def jax_relu(x):
    return jnp.maximum(x, 0.0)


class BilinearInteraction:
    """(B, F, k) -> (B, F(F-1)/2, k): p_ij = (v_i W_·) ⊙ v_j for i < j."""

    def __init__(self, num_fields: int, embedding_size: int,
                 bilinear_type: str = "all", l2_reg: float = 0.0,
                 prefix: str = "bilinear_"):
        assert bilinear_type in ("all", "each", "interaction")
        self.num_fields = int(num_fields)
        self.embedding_size = int(embedding_size)
        self.bilinear_type = bilinear_type
        self.l2_reg = float(l2_reg)
        self.prefix = prefix
        iu = np.triu_indices(self.num_fields, k=1)
        self._rows = jnp.asarray(iu[0], dtype=jnp.int32)
        self._cols = jnp.asarray(iu[1], dtype=jnp.int32)
        self.n_pairs = len(iu[0])

    @property
    def output_dim(self) -> int:
        return self.n_pairs * self.embedding_size

    def _w_name(self):
        return f"{self.prefix}w_{self.bilinear_type}"

    def init(self, key) -> dict:
        k = self.embedding_size
        n_w = {"all": 1, "each": self.num_fields, "interaction": self.n_pairs}[
            self.bilinear_type
        ]
        # stacked (n_w, k, k) so every scheme is ONE gather + ONE einsum
        w = glorot_normal(key, (n_w, k, k))
        return {self._w_name(): w}

    def apply(self, params, embeddings) -> jnp.ndarray:
        assert embeddings.ndim == 3
        w = params[self._w_name()]  # (n_w, k, k)
        vi = embeddings[:, self._rows, :]  # (B, P, k)
        vj = embeddings[:, self._cols, :]
        if self.bilinear_type == "all":
            left = jnp.einsum("bpk,kl->bpl", vi, w[0])
        else:
            idx = self._rows if self.bilinear_type == "each" else jnp.arange(
                self.n_pairs, dtype=jnp.int32
            )
            w_pair = w[idx]  # (P, k, k) via static gather
            left = jnp.einsum("bpk,pkl->bpl", vi, w_pair)
        return left * vj  # (B, P, k)

    def l2(self, params):
        return self.l2_reg * l2_loss(params[self._w_name()])
