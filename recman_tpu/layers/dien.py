"""Interest extraction + evolution layers for DIEN (arXiv:1809.03672).

Beyond-reference sequence machinery (the reference's DIN.py gestures at a
sequence family but ends mid-graph, DIN.py:98-108; SequenceFeat itself
raises NotImplementedError, inputs.py:443). Two stages per the paper:

1. Interest extractor: a GRU over the behavior-sequence embeddings
   (masked: padded positions carry the hidden state through unchanged).
2. Interest evolution: an AUGRU — a second GRU whose UPDATE GATE is scaled
   by the attention score between each extracted interest state and the
   candidate item embedding — so interests relevant to the candidate
   evolve, irrelevant ones decay.

TPU shape: both recurrences are ``lax.scan`` over the (small, static)
sequence length with one packed (B, 3H) matmul per step — no dynamic
shapes, no per-step host control flow. Behavior sequences in CTR are
short (max_len ~10-50), so the scan is latency-trivial next to the
embedding and MLP towers.

GRU convention (paper eq. 1-4): u=update, r=reset,
h' = (1-u)*h + u*h_tilde.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import glorot_normal, l2_loss

__all__ = ["InterestEvolution"]


def _gru_step(wx, wh, b, h, x, u_scale=None, mask=None):
    """One (A)GRU step. x (B, k); h (B, H); u_scale (B, 1) or None for the
    AUGRU attentional update-gate scaling; mask (B, 1) bool keeps h at
    padded positions."""
    hdim = h.shape[1]
    gx = x @ wx + b  # (B, 3H)
    gh = h @ wh
    u = jax.nn.sigmoid(gx[:, :hdim] + gh[:, :hdim])
    r = jax.nn.sigmoid(gx[:, hdim:2 * hdim] + gh[:, hdim:2 * hdim])
    n = jnp.tanh(gx[:, 2 * hdim:] + r * gh[:, 2 * hdim:])
    if u_scale is not None:
        u = u * u_scale  # AUGRU: attention scales the update gate
    h_new = (1.0 - u) * h + u * n
    if mask is not None:
        h_new = jnp.where(mask, h_new, h)
    return h_new


class InterestEvolution:
    """GRU interest extractor + attentional-update-gate AUGRU evolution.

    Params (all ``{prefix}``-scoped): ``gru_wx`` (k, 3H), ``gru_wh``
    (H, 3H), ``gru_b`` (3H,), ``augru_wx`` (H, 3H), ``augru_wh`` (H, 3H),
    ``augru_b`` (3H,), ``att_w`` (H, k) bilinear attention against the
    candidate embedding (masked softmax over positions, paper §4.3).
    """

    def __init__(self, embedding_size: int, hidden_size: int | None = None,
                 l2_reg: float = 0.0, prefix: str = ""):
        self.k = embedding_size
        self.h = hidden_size or embedding_size
        self.l2_reg = l2_reg
        self.prefix = prefix

    def init(self, key) -> dict:
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        p = self.prefix
        return {
            f"{p}gru_wx": glorot_normal(k1, (self.k, 3 * self.h)),
            f"{p}gru_wh": glorot_normal(k2, (self.h, 3 * self.h)),
            f"{p}gru_b": jnp.zeros((3 * self.h,), dtype=jnp.float32),
            f"{p}augru_wx": glorot_normal(k3, (self.h, 3 * self.h)),
            f"{p}augru_wh": glorot_normal(k4, (self.h, 3 * self.h)),
            f"{p}augru_b": jnp.zeros((3 * self.h,), dtype=jnp.float32),
            f"{p}att_w": glorot_normal(k5, (self.h, self.k)),
        }

    def extract(self, params, seq, mask):
        """Stage 1: GRU over (B, L, k) -> all hidden states (B, L, H)."""
        p = self.prefix
        B = seq.shape[0]
        xs = jnp.swapaxes(seq, 0, 1)  # (L, B, k)
        ms = jnp.swapaxes(mask, 0, 1)[:, :, None]  # (L, B, 1)

        def step(h, xm):
            x, m = xm
            h = _gru_step(
                params[f"{p}gru_wx"], params[f"{p}gru_wh"],
                params[f"{p}gru_b"], h, x, mask=m,
            )
            return h, h

        h0 = jnp.zeros((B, self.h), dtype=seq.dtype)
        _, hs = jax.lax.scan(step, h0, (xs, ms))
        return jnp.swapaxes(hs, 0, 1)  # (B, L, H)

    def evolve(self, params, states, mask, query):
        """Stage 2: AUGRU over the interest states (B, L, H) with attention
        scores vs the candidate ``query`` (B, k) -> final interest (B, H)."""
        p = self.prefix
        B = states.shape[0]
        scores = jnp.einsum(
            "blh,hk,bk->bl", states, params[f"{p}att_w"], query
        )
        scores = jnp.where(mask, scores, -1e9)
        att = jax.nn.softmax(scores, axis=1)  # (B, L)

        xs = jnp.swapaxes(states, 0, 1)  # (L, B, H)
        ats = jnp.swapaxes(att, 0, 1)[:, :, None]  # (L, B, 1)
        ms = jnp.swapaxes(mask, 0, 1)[:, :, None]

        def step(h, xam):
            x, a, m = xam
            h = _gru_step(
                params[f"{p}augru_wx"], params[f"{p}augru_wh"],
                params[f"{p}augru_b"], h, x, u_scale=a, mask=m,
            )
            return h, None

        h0 = jnp.zeros((B, self.h), dtype=states.dtype)
        h_final, _ = jax.lax.scan(step, h0, (xs, ats, ms))
        return h_final

    def apply(self, params, seq, mask, query):
        """(B, L, k) behaviors + (B, L) mask + (B, k) candidate ->
        ((B, H) final interest, (B, L, H) extracted states for the
        auxiliary loss)."""
        states = self.extract(params, seq, mask)
        return self.evolve(params, states, mask, query), states

    def aux_loss(self, params, states, seq, mask):
        """Auxiliary next-behavior loss (paper §4.2, eq. 7): the extracted
        state h_t should score the ACTUAL next behavior e_{t+1} above a
        negative. Negatives are in-batch: the next-behavior column rolled
        by one row (cheap, no sampling tables). Returns a scalar mean over
        valid (t, t+1) position pairs; 0.0 when none are valid.
        """
        h_t = states[:, :-1, :]  # (B, L-1, H)
        e_next = seq[:, 1:, :]  # (B, L-1, k)
        e_neg = jnp.roll(e_next, 1, axis=0)
        valid = (mask[:, :-1] & mask[:, 1:]).astype(states.dtype)

        # score via the same bilinear map used by the evolution attention
        w = params[f"{self.prefix}att_w"]  # (H, k)
        pos = jnp.einsum("blh,hk,blk->bl", h_t, w, e_next)
        neg = jnp.einsum("blh,hk,blk->bl", h_t, w, e_neg)
        ll = jax.nn.log_sigmoid(pos) + jax.nn.log_sigmoid(-neg)
        denom = jnp.maximum(jnp.sum(valid), 1.0)
        return -jnp.sum(ll * valid) / denom

    def l2(self, params):
        p = self.prefix
        total = 0.0
        for name in ("gru_wx", "gru_wh", "augru_wx", "augru_wh", "att_w"):
            total = total + self.l2_reg * l2_loss(params[f"{p}{name}"])
        return total
