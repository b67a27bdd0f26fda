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


def conv1d_time_folded(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    padding: int = 0,
    dilation: int = 1,
    precision=None,
    fold: int | None = None,
    max_fold: int = 16,
) -> jax.Array:
    """Narrow-channel stride-1 conv via the group time-fold transform.

    XLA's conv lowering collapses at tiny channel counts over long
    sequences (the distill discriminator's 1-66-channel convs measure
    ~0.5 TFLOP/s on v5e — lanes are 128 wide). Folding `fold` time steps
    into lanes (conv_stack.zone_grouped_layer with groups=1, sigma=1)
    re-expresses the conv over a (T/fold, fold*C) layout with a small
    banded kernel whose tap count ~ K*dilation/fold + 2: near-full lanes at
    a bounded FLOP pad of (2*fold + (K-1)*dilation) / K. Exact (incl.
    odd T via fold padding == conv zero padding; validated against
    torch-parity conv1d in tests/test_ops.py).
    """
    from hifigan_tpu.ops.pallas.conv_stack import (
        fold_group_zones,
        unfold_group_zones,
        zone_grouped_layer,
    )

    k, ci, co = kernel.shape
    t = x.shape[1]
    if fold is None:
        fold = max(1, min(128 // max(ci, co, 1), max_fold))
    if fold <= 1:
        return conv1d(x, kernel, bias, padding=padding, dilation=dilation,
                      precision=precision)
    zk, zb, spec = zone_grouped_layer(
        kernel, bias, 1, padding, fold, fold, 1, 1.0, t, dilation=dilation
    )
    z = fold_group_zones(x, 1, fold)
    y = jax.lax.conv_general_dilated(
        z, zk, (spec.stride,), [(spec.pad_l, spec.pad_r)],
        dimension_numbers=("NWC", "WIO", "NWC"), precision=precision,
    )
    if zb is not None:
        y = y + zb
    t_out = t + 2 * padding - (k - 1) * dilation
    return unfold_group_zones(y, 1, fold, t_out=t_out)


def conv_transpose1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
    precision=None,
    method: str = "dilated",
) -> jax.Array:
    """torch.nn.ConvTranspose1d-exact: (N, W, I) @ (K, I, O) -> (N, W', O).

    W' = (W - 1) * stride - 2 * padding + K + output_padding.

    method='dilated' (default): the gradient-of-conv identity (stride-dilated
    input, flipped kernel). Measured FASTER on TPU v5e than the polyphase
    decomposition (XLA lowers lhs-dilation convs efficiently; the polyphase
    depth-to-space relayout of the upsampled tensor costs more than the MACs
    it saves — V1 bench: 74 ms vs 80 ms per 95 s of audio).
    method='polyphase': ``stride`` output phases via one dense conv +
    depth-to-space; exact for k - 2p == stride; kept for layouts/backends
    where dilated convs lower poorly.
    method='polyphase_dot': the same polyphase math lowered as ONE
    dot_general over lane-concatenated shifted input slices instead of a
    conv. At tiny batch*length XLA's conv lowering crawls (B=1 V1 serving
    profile: the 512->256 k16 s8 upsampler ran at 2.7 TFLOP/s, 0.39 ms);
    the dot form tiles on the MXU like any matmul. Exact under the same
    k - 2p == stride condition.
    method='auto': polyphase on CPU (where XLA's lhs-dilated conv lowering
    is 2x+ slower at narrow channel counts — V3 64->32 k8s4: 15.3 vs
    34.7 ms/8 s audio on one core), dilated elsewhere.
    """
    if method == "auto":
        method = "polyphase" if jax.default_backend() == "cpu" else "dilated"
    # polyphase fast path: exact when output length == W*stride, i.e.
    # k - 2p == stride (every HiFi-GAN variant: k = 2u, p = u/2)
    if (
        method == "polyphase_dot"
        and stride > 1
        and output_padding == 0
        and kernel.shape[0] - 2 * padding == stride
    ):
        return _conv_transpose1d_polyphase(
            x, kernel, bias, stride, padding, precision, as_dot=True
        )
    if (
        method == "polyphase"
        and stride > 1
        and output_padding == 0
        and kernel.shape[0] - 2 * padding == stride
    ):
        return _conv_transpose1d_polyphase(x, kernel, bias, stride, padding, precision)
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


def _conv_transpose1d_polyphase(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None,
    stride: int,
    padding: int,
    precision,
    as_dot: bool = False,
) -> jax.Array:
    """Polyphase transposed conv.

    y[n*u + r] = sum_s x[n - s] * W[s*u + r + p] (taps with index in [0, k)),
    computed as one conv with kernel K[w, i, r*O + o] = W[(s_max-w)*u + r + p]
    (zero-masked out of range) followed by an (N, u, O) -> (N*u, O)
    depth-to-space reshape. Exact for output_padding == 0.
    """
    import numpy as np

    k, in_ch, out_ch = kernel.shape
    u, p = stride, padding
    s_min = -((p + u - 1) // u)
    s_max = (k - 1 - p) // u
    wn = s_max - s_min + 1

    w_idx = np.arange(wn)[:, None]
    r_idx = np.arange(u)[None, :]
    tap = (s_max - w_idx) * u + r_idx + p  # (wn, u)
    valid = (tap >= 0) & (tap < k)
    tap_safe = np.clip(tap, 0, k - 1)

    gathered = kernel[jnp.asarray(tap_safe.reshape(-1))]  # (wn*u, I, O)
    gathered = gathered.reshape(wn, u, in_ch, out_ch)
    gathered = jnp.where(jnp.asarray(valid)[:, :, None, None], gathered, 0.0)
    big_kernel = jnp.transpose(gathered, (0, 2, 1, 3)).reshape(wn, in_ch, u * out_ch)

    if as_dot:
        # one MXU matmul over lane-concatenated shifted slices — tiles far
        # better than the conv lowering at tiny batch*length (B=1 serving)
        n, w, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (s_max, max(-s_min, 0)), (0, 0)))
        xcat = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(xp, i, w, axis=1) for i in range(wn)],
            axis=-1,
        )  # (N, W, wn*I)
        y = jax.lax.dot_general(
            xcat,
            big_kernel.reshape(wn * in_ch, u * out_ch),
            (((2,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=x.dtype,
        )  # (N, W, u*O)
    else:
        y = jax.lax.conv_general_dilated(
            x,
            big_kernel,
            window_strides=(1,),
            padding=((s_max, -s_min),),
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=precision,
        )  # (N, W, u*O)
    n, w_out, _ = y.shape
    y = y.reshape(n, w_out * u, out_ch)
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


def conv1d_time_blocked(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    dilation: int = 1,
    block: int = 4,
    precision=None,
) -> jax.Array:
    """'same'-padded stride-1 conv computed in a time-blocked layout.

    The narrow tail of the generator (C=32..64) starves the MXU (channels
    land on the 128-wide lane dim). Folding ``block`` consecutive time steps
    into channels — a free row-major reshape (B, T, C) -> (B, T/block,
    block*C) — turns each k-tap CxC conv into an nq-tap (block*C)x(block*C)
    block conv whose per-tap matrices scatter the original taps by phase:

        y4[n, r*C+o] = sum_q x4[n+q] @ K[q],
        K[q][rho*C + i, r*C + o] = sum_{tau: q(tau,r)=q, rho(tau,r)=rho} W[tau,i,o]

    with q, rho the block/phase of each tap offset. Denser MACs
    (~nq*block^2/k x) but near-full MXU lanes — measured several-fold faster
    for the 32-channel stages. Exact (incl. zero boundary semantics) for
    odd k, stride 1, groups 1; validated against conv1d in tests.
    """
    import numpy as np

    k, in_ch, out_ch = kernel.shape
    assert in_ch == out_ch, "time-blocked conv: square channels only"
    b, t, c = x.shape
    assert t % block == 0, "time length must be divisible by the block factor"
    p = (k - 1) * dilation // 2

    # tap -> (block offset, phase) per output phase r
    tau = np.arange(k)[:, None]
    r = np.arange(block)[None, :]
    off = tau * dilation - p  # (k, 1)
    q = (r + off) // block  # (k, block)
    rho = (r + off) % block
    q_min, q_max = int(q.min()), int(q.max())
    nq = q_max - q_min + 1

    # scatter W into the block kernel (host-side indices; traced gather-add)
    big = jnp.zeros((nq, block * c, block * c), kernel.dtype)
    flat_idx = (
        (q - q_min) * (block * block) + rho * block + r
    ).reshape(-1)  # index into (nq, rho, r)
    big = big.reshape(nq * block * block, c, c).at[jnp.asarray(flat_idx)].add(
        jnp.repeat(kernel, block, axis=0).reshape(k * block, c, c)
    )
    big = (
        big.reshape(nq, block, block, c, c)
        .transpose(0, 1, 3, 2, 4)
        .reshape(nq, block * c, block * c)
    )

    x4 = x.reshape(b, t // block, block * c)
    y4 = jax.lax.conv_general_dilated(
        x4,
        big,
        window_strides=(1,),
        padding=((-q_min, q_max),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=precision,
    )
    y = y4.reshape(b, t, c)
    if bias is not None:
        y = y + bias
    return y


def conv1d_grouped_blocked(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
    block_out: int | None = None,
    precision=None,
) -> jax.Array:
    """Grouped (optionally strided) conv computed in a time-blocked layout.

    XLA's grouped-conv lowering starves the MXU when per-group features are
    far below the 128 lanes (the MSD's g=16 k41 stacks run at a few % of
    peak, docs/OPERATIONS.md). Folding ``block_out`` output samples into the
    feature dim turns the conv into ANOTHER feature-grouped conv whose
    per-group widths are ``b_in*cig`` in / ``block_out*cog`` out (chosen
    ~128): full MXU tiles per group. Construction (b_in = block_out*stride;
    rows n index b_in-sample input blocks == block_out-sample output blocks):

        out[n*b_out + r, o] = sum_tau in[(n*b_out+r)*s + tau - p] @ W[tau]
        e = r*s + tau - p;  q = e // b_in;  rho = e mod b_in
        K[q][rho*cig + i, r*cog + o] += W[tau, i, o]   (per group)

    FLOP overhead ~ nq*b_in/k (the block kernels contain zeros). Exact,
    including zero boundary semantics, whenever T % b_in == 0 and the
    conv's output length equals T // stride (true for the MSD's
    'same'-family paddings).

    MEASURED RESULT on v5e (don't redo): LOSES to the native grouped
    lowering on every MSD layer (e.g. g=16 k41 512->1024: 1.89 ms blocked
    fwd vs 1.45 native; only the g=4 layer improves, and the block-diagonal
    dense form beats both there, models/layers.py groups_impl). The MSD
    layers are per-op-overhead-bound, not lane-bound — the layout
    transposes cost more than the lane win. Kept as a tested-exact
    alternative for other hardware/shapes; NOT in the auto dispatch.
    """
    import numpy as np

    k, cig, co = kernel.shape
    g = groups
    cog = co // g
    b, t, ci = x.shape
    assert ci == cig * g, "input features must be groups * per-group channels"
    s = stride
    if block_out is None:
        block_out = max(1, 128 // cog)
    b_out = block_out
    b_in = b_out * s
    assert t % b_in == 0, "time length must divide the input block factor"
    rows = t // b_in
    t_out = (t + 2 * padding - k) // s + 1
    assert rows * b_out == t_out, (
        "blocked grouped conv requires out_len == T // stride "
        f"(got {t_out} vs {rows * b_out})"
    )

    tau = np.arange(k)[:, None]
    r = np.arange(b_out)[None, :]
    e = r * s + tau - padding  # (k, b_out) input-sample offset within block 0
    q = e // b_in
    rho = e % b_in
    q_min, q_max = int(q.min()), int(q.max())
    nq = q_max - q_min + 1

    # scatter W into per-group block kernels (host-side indices, traced add)
    kernel_g = kernel.reshape(k, cig, g, cog).transpose(0, 2, 1, 3)  # (k,g,cig,cog)
    flat_idx = ((q - q_min) * (b_in * b_out) + rho * b_out + r).reshape(-1)
    big = jnp.zeros((nq * b_in * b_out, g, cig, cog), kernel.dtype)
    big = big.at[jnp.asarray(flat_idx)].add(
        jnp.repeat(kernel_g, b_out, axis=0).reshape(k * b_out, g, cig, cog)
    )
    # -> (nq, b_in*cig, g*b_out*cog), output features ordered [g][r][o]
    big = (
        big.reshape(nq, b_in, b_out, g, cig, cog)
        .transpose(0, 1, 4, 3, 2, 5)
        .reshape(nq, b_in * cig, g * b_out * cog)
    )

    # input features ordered [g][rho][cig] per block row
    x4 = (
        x.reshape(b, rows, b_in, g, cig)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, rows, g * b_in * cig)
    )
    y4 = jax.lax.conv_general_dilated(
        x4,
        big,
        window_strides=(1,),
        padding=((-q_min, q_max),),
        feature_group_count=g,
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=precision,
    )
    y = (
        y4.reshape(b, rows, g, b_out, cog)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, t_out, co)
    )
    if bias is not None:
        y = y + bias
    return y
