"""Stacked per-slice conv nets for the channel-conditional entropy transforms.

The reference builds 12 independent 5-layer 3x3 conv nets per transform
(cc_transform_mean / cc_transform_scale / lrp_transform,
/root/reference/models/Compression/MCM.py:165-293) whose *input* widths grow
with the slice index (latent_depth + 32*min(i, 6)). A naive port would be 36
tiny separately-compiled convs chained by Python — hostile to XLA.

TPU-first design: all slices share one *stacked* parameter tensor with a
uniform input width (the maximum), and callers zero-pad the missing support
channels. Zero inputs x anything = 0, so this is functionally identical to the
reference's ragged widths while enabling a single `lax.scan` over slices (one
compiled step executed 12x) and a clean torch-checkpoint embedding (reference
kernels land in a zero-padded block of the stacked kernel).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")


class StackedSliceNet(nn.Module):
    """num_slices independent conv stacks, parameters stacked on a leading axis.

    channels[-1] is the output width; GELU between layers, none after the last
    (matching the reference nets' Conv/GELU alternation).
    """

    num_slices: int
    in_ch: int
    channels: Sequence[int]
    kernel_size: int = 3

    def setup(self):
        dims = (self.in_ch,) + tuple(self.channels)
        k = self.kernel_size
        init = jax.nn.initializers.variance_scaling(
            1 / 3, "fan_in", "uniform", in_axis=-2, out_axis=-1, batch_axis=(0,)
        )  # ~torch kaiming_uniform(a=sqrt(5)) scale, stacked-aware
        kernels = []
        biases = []
        for j in range(len(self.channels)):
            kernels.append(
                self.param(f"kernel_{j}", init, (self.num_slices, k, k, dims[j], dims[j + 1]))
            )
            biases.append(
                self.param(f"bias_{j}", nn.initializers.zeros, (self.num_slices, dims[j + 1]))
            )
        self.kernels = kernels
        self.biases = biases

    def stacked_params(self) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """Parameter stacks to be fed as `lax.scan` xs (leading axis = slice)."""
        return list(self.kernels), list(self.biases)

    @staticmethod
    def apply_one(
        kernels: Sequence[jnp.ndarray],
        biases: Sequence[jnp.ndarray],
        x: jnp.ndarray,
        compute_dtype=None,
    ) -> jnp.ndarray:
        """Run one slice's net. kernels/biases are the per-slice (unstacked)
        params.

        compute_dtype: optional matmul input dtype for the convs (e.g.
        bfloat16 — inputs/kernels cast down per layer, accumulation forced
        back to f32 via preferred_element_type, biases/GELU stay f32). None
        preserves the exact legacy f32 expression (the torch-oracle-parity
        and codec-bit-identity default).
        """
        pad = kernels[0].shape[0] // 2
        n = len(kernels)
        for j in range(n):
            if compute_dtype is None:
                y = jax.lax.conv_general_dilated(
                    x, kernels[j], (1, 1), ((pad, pad), (pad, pad)),
                    dimension_numbers=_DN,
                )
            else:
                # plain low-precision conv, f32 upcast after: XLA accumulates
                # bf16 MXU dots in f32 internally, and keeping operand/output
                # dtypes equal keeps the conv VJP well-typed (a f32
                # preferred_element_type on bf16 operands breaks the
                # transpose rule's dtype agreement)
                y = jax.lax.conv_general_dilated(
                    x.astype(compute_dtype),
                    kernels[j].astype(compute_dtype),
                    (1, 1), ((pad, pad), (pad, pad)), dimension_numbers=_DN,
                ).astype(jnp.float32)
            x = y + biases[j]
            if j < n - 1:
                x = nn.gelu(x, approximate=False)
        return x

    def __call__(self, x: jnp.ndarray, slice_index: int) -> jnp.ndarray:
        """Convenience: run slice `slice_index` (static or traced) on x (N,H,W,in_ch)."""
        kernels = [k[slice_index] for k in self.kernels]
        biases = [b[slice_index] for b in self.biases]
        return self.apply_one(kernels, biases, x)
