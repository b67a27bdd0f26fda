"""Convolution primitives, TPU-first (NWC/NHWC layouts) with exact
PyTorch-semantics equivalence where it matters for checkpoint parity.

Layouts:
- 1D activations: (N, W, C)  — channels-last so the channel dim lands on TPU
  lanes and convs lower to MXU matmuls.
- 1D kernels:     (K, I, O)  for forward convs ('WIO').
- transposed 1D kernels: (K, I, O) where I is the *input* feature count of
  the transposed conv (torch ConvTranspose1d stores (I, O, K); converter
  transposes (2, 0, 1)).
- 2D activations: (N, H, W, C); kernels (KH, KW, I, O).

Equivalences validated against torch in tests/test_ops.py:
- `conv1d` == torch.nn.Conv1d (incl. dilation/groups/torch integer padding).
- `conv_transpose1d` == torch.nn.ConvTranspose1d(stride, padding) via the
  lhs-dilation identity (input dilated by stride, kernel flipped, pad k-1-p)
  — reference upsampler semantics at src/models.py:85-88.
- `avg_pool1d` == torch.nn.AvgPool1d(count_include_pad=True) — reference
  MSD mean-pools at src/models.py:227-230.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1  # reference src/models.py:8


def leaky_relu(x: jax.Array, slope: float = LRELU_SLOPE) -> jax.Array:
    return jnp.where(x >= 0, x, x * slope)


def torch_same_padding(kernel_size: int, dilation: int = 1) -> int:
    """Reference `get_padding` (src/utils.py:78): (k*d - d) // 2."""
    return (kernel_size * dilation - dilation) // 2


def weight_norm_kernel(v: jax.Array, g: jax.Array, axes: tuple[int, ...]) -> jax.Array:
    """w = g * v / ||v||, norm over ``axes`` (all axes but the norm dim).

    For forward convs (K, I, O): axes=(0, 1) — per-output-channel norm,
    matching torch weight_norm(dim=0) on (O, I, K) weights. For transposed
    convs stored (K, I, O): axes=(0, 2) — per-*input*-channel norm, matching
    torch weight_norm(dim=0) on (I, O, K) weights.
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
    return v * (g.reshape(norm.shape) / norm)


def conv1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    stride: int = 1,
    padding: int | tuple[int, int] = 0,
    dilation: int = 1,
    groups: int = 1,
    precision=None,
) -> jax.Array:
    """(N, W, C_in) @ (K, C_in/groups, C_out) -> (N, W', C_out)."""
    if isinstance(padding, int):
        padding = (padding, padding)
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=(padding,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        precision=precision,
    )
    if bias is not None:
        y = y + bias
    return y


def conv_transpose1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
    precision=None,
) -> jax.Array:
    """torch.nn.ConvTranspose1d-exact: (N, W, I) @ (K, I, O) -> (N, W', O).

    W' = (W - 1) * stride - 2 * padding + K + output_padding.
    Implemented as a forward conv over the stride-dilated input with the
    kernel flipped along K (the gradient-of-conv identity), so XLA lowers it
    to the same MXU path as a normal conv.
    """
    k = kernel.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    y = jax.lax.conv_general_dilated(
        x,
        jnp.flip(kernel, axis=0),
        window_strides=(1,),
        padding=((lo, hi),),
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=precision,
    )
    if bias is not None:
        y = y + bias
    return y


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    stride: tuple[int, int] = (1, 1),
    padding: tuple[int, int] | tuple[tuple[int, int], tuple[int, int]] = (0, 0),
    dilation: tuple[int, int] = (1, 1),
    groups: int = 1,
    precision=None,
) -> jax.Array:
    """(N, H, W, C_in) @ (KH, KW, C_in/groups, C_out) -> (N, H', W', C_out)."""
    pad = tuple(p if isinstance(p, tuple) else (p, p) for p in padding)
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision,
    )
    if bias is not None:
        y = y + bias
    return y


def avg_pool1d(
    x: jax.Array,
    kernel_size: int,
    stride: int,
    padding: int = 0,
    count_include_pad: bool = True,
) -> jax.Array:
    """torch.nn.AvgPool1d-exact over (N, W, C)."""
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, kernel_size, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (padding, padding), (0, 0)),
    )
    if count_include_pad:
        return summed / kernel_size
    ones = jnp.ones((1, x.shape[1], 1), dtype=x.dtype)
    counts = jax.lax.reduce_window(
        ones,
        0.0,
        jax.lax.add,
        window_dimensions=(1, kernel_size, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (padding, padding), (0, 0)),
    )
    return summed / counts


def reflect_pad_1d(x: jax.Array, pad: tuple[int, int], axis: int = 1) -> jax.Array:
    """Reflect padding along the time axis (torch F.pad mode='reflect')."""
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = pad
    return jnp.pad(x, cfg, mode="reflect")
