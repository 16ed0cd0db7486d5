"""Product layer (PNN, arXiv:1611.00144).

Beyond-reference layer. Produces the product signal ``p`` that PNN
concatenates with the flat embeddings ``z`` before the DNN:

- inner (IPNN, paper §II-C): all F(F−1)/2 pairwise inner products
  <v_i, v_j>. One ``bfk,bgk->bfg`` einsum (MXU-shaped batched matmul)
  followed by a STATIC upper-triangle gather — no Python-loop over pairs,
  so XLA sees one fused contraction regardless of F.
- outer (OPNN, paper eq. 11 superposition trick): p = vec((Σ_f v)(Σ_f v)ᵀ),
  a (B, k·k) signal. The paper's D1 per-unit kernels are equivalent to the
  DNN's first matmul over this flattened signal, so we emit the raw k×k
  outer product and let the tower own the weights (keeps the MXU matmul
  large instead of D1 tiny ones).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


class ProductLayer:
    """kind in {"inner", "outer", "both"}; parameter-free signal builder."""

    def __init__(self, num_fields: int, embedding_size: int, kind="inner"):
        assert kind in ("inner", "outer", "both")
        self.kind = kind
        self.num_fields = int(num_fields)
        self.embedding_size = int(embedding_size)
        iu = np.triu_indices(self.num_fields, k=1)
        self._rows = jnp.asarray(iu[0], dtype=jnp.int32)
        self._cols = jnp.asarray(iu[1], dtype=jnp.int32)

    @property
    def output_dim(self) -> int:
        n_pairs = self.num_fields * (self.num_fields - 1) // 2
        k2 = self.embedding_size * self.embedding_size
        return {"inner": n_pairs, "outer": k2, "both": n_pairs + k2}[self.kind]

    def init(self, key=None) -> dict:
        return {}

    def apply(self, params, embeddings) -> jnp.ndarray:
        assert embeddings.ndim == 3
        parts = []
        if self.kind in ("inner", "both"):
            gram = jnp.einsum("bfk,bgk->bfg", embeddings, embeddings)
            parts.append(gram[:, self._rows, self._cols])  # (B, F(F-1)/2)
        if self.kind in ("outer", "both"):
            s = jnp.sum(embeddings, axis=1)  # (B, k)
            outer = s[:, :, None] * s[:, None, :]
            parts.append(outer.reshape(outer.shape[0], -1))  # (B, k*k)
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)

    def l2(self, params):
        return jnp.float32(0.0)
