"""Compressed Interaction Network — xDeepFM's core (arXiv:1803.05170).

Reference: recman/tf/core/layers.py:631-777. The reference computes each
layer by splitting along the embedding dim into D unit tensors, batching a
matmul over them, and running conv1d with filters (1, Hk*H0, size)
(layers.py:711-736) — a TF-shaped formulation. The TPU-native form is two
einsums (an outer product + an MXU contraction) with identical semantics,
validated against the notebook's hand-computed toy tensors
(notes/xDeepFM.ipynb cells 6-7):

    z_k[b, d, h*Hk + m] = x0[b, h, d] * xk[b, m, d]     # vector-wise outer
    fmap[b, d, o]       = sum_x z_k[b, d, x] * W_k[x, o] + bias_k[o]

Per layer: activation, transpose to (B, size, D), dropout (keep-prob), then
the half-split: the FIRST size/2 maps feed the next layer, the second half
are "direct connect" outputs; the last layer is all direct connect
(layers.py:742-752). Direct outputs concat, sum-pool over the embedding dim,
and project to one logit (layers.py:754-760).
"""

from __future__ import annotations

import jax.numpy as jnp

# Trace-time experiment mode for the field-major tail's direct-connect
# pooling (bit-identical math in every mode):
#   "concat"    — concatenate the full (final_size, B*D) map, reshape
#                 (-1, B, D), reduce axis 2 (the round-3 default).
#   "split_flat"— per-block free reshape (F_i*B, D) + minor-axis reduce.
#                 MEASURED DEAD END (tools/bench_r4d.py ABAB 2026-08-21):
#                 600.2k vs 672.8k ex/s — the 16-lane minor reduce runs
#                 at 1/8 VPU width (the narrow-minor trap, NOTES.md).
#   "split_bdh" — per-block (F_i, B, D) reshape + axis-2 reduce (the
#                 proven reduce form, applied per block so only the
#                 SMALL (F_i, B) results concatenate — kills the
#                 big-concat + backward-split + relayout cluster).
#                 ABAB-measured DEFAULT (tools/bench_r4e.py 2026-08-21,
#                 TPU v5e): 720.5k vs 677.1k ex/s median (+6.4%) at the
#                 headline config; 4 consistent rounds. Only the
#                 field-major (TPU Pallas) tail is affected — the
#                 batch-major SPMD/CPU path is unchanged.
CIN_POOL_MODE = "split_bdh"
CIN_POOL_SPLIT = False  # back-compat alias for "split_flat" (tests)

# Whole-chain fused kernel (ops/cin_chain.py): every layer + bias +
# activation + direct-connect split + pooling in ONE forward and ONE
# backward Pallas call — no (O, B*D) intermediate touches HBM in either
# direction (the backward recomputes fmaps in VMEM, subsuming cin_remat).
#   "auto" — use it whenever the field-major path is active AND the
#            chain is eligible (supported activation, all in-chain
#            dropout keeps == 1 or eval mode, geometry fits).
#   "off"  — per-layer kernels (the round-4 default).
CIN_CHAIN_MODE = "auto"

from ..utils import glorot_normal, glorot_uniform, l2_loss
from ..ops.cin_interact import cin_interact, cin_interact_fm, pallas_cin_active
from .common import dropout, resolve_activation, split_rng


class CIN:
    """Param names match the reference: ``cin_filter_{i}`` (H0*Hk, size),
    ``cin_bias_{i}`` (size,), ``cin_w`` (final_size, 1), ``cin_w0`` (1,)."""

    def __init__(
        self,
        field_size,
        cross_layer_units,
        activation,
        dropout_keep,
        l2_reg=1e-5,
        prefix="",
        compute_dtype="bfloat16",
        remat=False,
    ):
        assert len(cross_layer_units) > 0
        assert len(cross_layer_units) + 1 == len(dropout_keep)
        for size in cross_layer_units[:-1]:
            assert size % 2 == 0, "non-final CIN layer width must be even (half-split)"

        self.field_size = field_size
        self.cross_layer_units = tuple(cross_layer_units)
        self.activation = resolve_activation(activation)
        # the fused chain implements the activation in-kernel; it needs
        # the NAME (callables fall back to the per-layer path)
        self._act_name = activation if isinstance(activation, str) else None
        self.dropout_keep = tuple(dropout_keep)
        self.l2_reg = l2_reg
        self.prefix = prefix
        # z-intermediate / MXU-multiplicand precision (f32 accumulation);
        # bf16 halves the layer's HBM traffic — see ops/cin_interact.py
        self.compute_dtype = jnp.dtype(compute_dtype) if compute_dtype else jnp.float32
        self.remat = remat

        # field_nums[i] = H_i, the fan-in of layer i (reference layers.py:659-685)
        self.field_nums = [field_size]
        final_size = 0
        for i, size in enumerate(self.cross_layer_units):
            self.field_nums.append(size // 2)
            final_size += size // 2 if i != len(self.cross_layer_units) - 1 else size
        self.final_size = final_size

    def init(self, key) -> dict:
        keys = split_rng(key, len(self.cross_layer_units) + 1)
        params = {}
        h0 = self.field_nums[0]
        for i, size in enumerate(self.cross_layer_units):
            hk = self.field_nums[i]
            params[f"{self.prefix}cin_filter_{i}"] = glorot_normal(
                keys[i], (h0 * hk, size)
            )
            params[f"{self.prefix}cin_bias_{i}"] = jnp.zeros((size,), dtype=jnp.float32)
        params[f"{self.prefix}cin_w"] = glorot_uniform(keys[-1], (self.final_size, 1))
        params[f"{self.prefix}cin_w0"] = jnp.zeros((1,), dtype=jnp.float32)
        return params

    def apply(self, params, inputs, training=True, rng=None):
        assert inputs.ndim == 3  # (B, F, D)
        # the Pallas chain is bf16-multiplicand by construction; an
        # explicit compute_dtype opt-out (f32 studies) keeps the einsum
        if self.compute_dtype == jnp.bfloat16 and pallas_cin_active(
            max(self.field_nums)
        ):
            return self._apply_field_major(params, inputs, training, rng)
        return self._apply_batch_major(params, inputs, training, rng)

    def _apply_batch_major(self, params, inputs, training, rng):
        """XLA einsum chain in (B, D, H) embedding-position-major layout
        (SPMD/CPU path — the partitioner shards einsums natively)."""
        B, H0, D = inputs.shape
        rngs = split_rng(rng, len(self.cross_layer_units) + 1)

        x0 = dropout(rngs[0], inputs, self.dropout_keep[0], training)
        x0t = jnp.transpose(x0, (0, 2, 1))  # (B, D, H0)
        xkt = x0t
        finals = []

        def layer_fn(x0t, xkt, w, bias, rng_i, keep):
            pre = cin_interact(x0t, xkt, w, dtype=self.compute_dtype) + bias
            return dropout(rng_i, self.activation(pre), keep, training)

        if self.remat:
            # rematerialize the WHOLE layer (z + activation + dropout) in
            # the backward instead of keeping its activations: trades
            # ~2x CIN recompute for O(B*D) layer memory — the enabler
            # for 128k+ batches on a 16 GB chip (the remat boundary must
            # cover the (B, D, size) fmap, not just the interaction —
            # measured: kernel-only remat saves nothing, BASELINE.md)
            import jax

            layer_fn = jax.checkpoint(layer_fn, static_argnums=(5,))

        for i, size in enumerate(self.cross_layer_units):
            fmap = layer_fn(
                x0t, xkt, params[f"{self.prefix}cin_filter_{i}"],
                params[f"{self.prefix}cin_bias_{i}"], rngs[i + 1],
                self.dropout_keep[i + 1],
            )  # (B, D, size)

            if i != len(self.cross_layer_units) - 1:
                xkt = fmap[:, :, : size // 2]
                direct = fmap[:, :, size // 2 :]
            else:
                direct = fmap
            finals.append(direct)

        result = jnp.concatenate(finals, axis=2)  # (B, D, final_size)
        result = jnp.sum(result, axis=1)  # (B, final_size)
        return result @ params[f"{self.prefix}cin_w"] + params[f"{self.prefix}cin_w0"]

    def _chain_eligible(self, training: bool, b: int, d: int) -> bool:
        """Static eligibility of the whole-chain fused kernel for this
        trace: supported activation name, no live in-chain dropout
        (keeps past index 0 all >= 1, or eval mode — input dropout runs
        BEFORE the chain and is unrestricted), and geometry the kernel
        tiles (ops/cin_chain.py chain_supported)."""
        if CIN_CHAIN_MODE == "off" or self._act_name is None:
            return False
        if training and any(k < 1.0 for k in self.dropout_keep[1:]):
            return False
        from ..ops.cin_chain import chain_supported

        return chain_supported(
            self.field_size, self.cross_layer_units, d, b * d,
            self._act_name,
        )

    def _apply_field_major(self, params, inputs, training, rng):
        """Pallas chain in (H, B*D) field-major layout: the fused kernel
        (ops/cin_interact.py) keeps z in VMEM and emits (O, B*D), whose
        leading slice IS the next layer's input — no transposes anywhere
        in the whole tower, forward or backward. Semantics identical to
        the batch-major path (tests/test_cin_interact.py)."""
        B, H0, D = inputs.shape
        rngs = split_rng(rng, len(self.cross_layer_units) + 1)

        x0 = dropout(rngs[0], inputs, self.dropout_keep[0], training)
        x0c = jnp.transpose(x0, (1, 0, 2)).reshape(H0, B * D)

        if self._chain_eligible(training, B, D):
            # ONE fused kernel per direction for the whole tower
            # (ops/cin_chain.py): returns per-layer pooled direct blocks
            # (F_i, B); their concat is the pooled (final_size, B)
            # result. The backward recomputes fmaps in VMEM, so
            # activation memory is O(B*D*H0) — cin_remat is subsumed.
            from ..ops.cin_chain import cin_chain_fm

            pooled = cin_chain_fm(
                x0c,
                [params[f"{self.prefix}cin_filter_{i}"]
                 for i in range(len(self.cross_layer_units))],
                [params[f"{self.prefix}cin_bias_{i}"]
                 for i in range(len(self.cross_layer_units))],
                self.cross_layer_units, D, self._act_name,
            )
            result = jnp.concatenate(pooled, axis=1)  # (B, final_size)
            return (
                result @ params[f"{self.prefix}cin_w"]
                + params[f"{self.prefix}cin_w0"]
            )
        xkc = x0c
        finals = []

        def layer_fn(x0c, xkc, w, bias, rng_i, keep):
            pre = cin_interact_fm(x0c, xkc, w) + bias[:, None]
            return dropout(rng_i, self.activation(pre), keep, training)

        if self.remat:
            import jax

            # full-layer remat (see _apply_batch_major)
            layer_fn = jax.checkpoint(layer_fn, static_argnums=(5,))

        for i, size in enumerate(self.cross_layer_units):
            fmap = layer_fn(
                x0c, xkc, params[f"{self.prefix}cin_filter_{i}"],
                params[f"{self.prefix}cin_bias_{i}"], rngs[i + 1],
                self.dropout_keep[i + 1],
            )  # (size, B*D)

            if i != len(self.cross_layer_units) - 1:
                xkc = fmap[: size // 2]
                direct = fmap[size // 2 :]
            else:
                direct = fmap
            finals.append(direct)

        mode = "split_flat" if CIN_POOL_SPLIT else CIN_POOL_MODE
        if mode == "split_flat":
            pooled = []
            for direct in finals:
                f_i = direct.shape[0]
                # (f_i, B*D) -> (f_i*B, D) is a contiguous-row bitcast;
                # the reduce then runs over the 16-lane minor axis (the
                # measured dead end — see CIN_POOL_MODE)
                pooled.append(
                    jnp.sum(direct.reshape(f_i * B, D), axis=1)
                    .reshape(f_i, B)
                )
            result = jnp.concatenate(pooled, axis=0)  # (final_size, B)
        elif mode == "split_bdh":
            pooled = [
                jnp.sum(direct.reshape(direct.shape[0], B, D), axis=2)
                for direct in finals
            ]
            result = jnp.concatenate(pooled, axis=0)  # (final_size, B)
        else:
            result = jnp.concatenate(finals, axis=0)  # (final_size, B*D)
            result = jnp.sum(result.reshape(-1, B, D), axis=2)
        return (
            jnp.einsum("fb,fo->bo", result, params[f"{self.prefix}cin_w"])
            + params[f"{self.prefix}cin_w0"]
        )

    def l2(self, params):
        """Filters + head (reference layers.py:762-777)."""
        total = self.l2_reg * l2_loss(params[f"{self.prefix}cin_w"])
        for i in range(len(self.cross_layer_units)):
            total += self.l2_reg * l2_loss(params[f"{self.prefix}cin_filter_{i}"])
        return total
