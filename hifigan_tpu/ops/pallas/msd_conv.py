"""Fused Pallas grouped/strided conv1d (+ leaky ReLU) for the MSD stack.

The MultiScaleDiscriminator (reference src/models.py:191-217) is the vocoder
train step's sink: XLA runs each of its 8 convs as a separate op at a
~1.3-2 ms per-op floor regardless of FLOPs (grouped-conv lowering + layout
moves; docs/OPERATIONS.md), 33 ms of an 81 ms step. This op computes one
whole conv layer per Pallas instance with everything VMEM-resident:

- **Stride via phase folding** (host/XLA side, pure reshape): a stride-s
  K-tap conv over (T, C) becomes a stride-1 ceil(K/s)-tap conv over the
  folded (T/s, s*C) input, so the kernel is always a static tap loop of
  full MXU matmuls ``acc += xf[a : a+T_out] @ wf[a]`` with f32 accumulation
  and the bias + leaky ReLU fused into the epilogue.
- **Groups** either densify into block-diagonal weights (small folded
  weights: the g<=4 k41 layer and the 16-group 128->256 layer — full 128
  lanes beat the xg FLOP blowup) or run as a real grid axis with per-group
  weight blocks (the wide 16-group layers, where a dense blowup would not
  fit VMEM); chosen by folded-weight size.
- **Custom VJP**: the input gradient is the SAME kernel run on the
  (lrelu-masked, K'-1 zero-padded) cotangent with tap-flipped transposed
  weights; the weight gradient is a static tap loop of plain XLA dots
  (contraction over batch*time — no grouped-conv lowering involved); the
  fold/unfold transforms live OUTSIDE the custom_vjp as plain differentiable
  reshapes, so weight-norm / spectral-norm chains autodiff through.

Validated against lax.conv_general_dilated in interpreter mode
(tests/test_pallas_msd.py) and on hardware via the train-step parity test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# densify groups when the folded block-diagonal dense weight stays at most
# this many bytes (stays VMEM-resident alongside input/acc/output slabs)
_DENSIFY_WEIGHT_BYTES = 4 * 1024 * 1024
# tile the output-channel axis when one (taps, C', D) weight block would
# exceed this (e.g. the 1024->1024 k5 layer: 10.5 MB bf16)
_WEIGHT_BLOCK_BYTES = 6 * 1024 * 1024


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# the kernel: stride-1 tap-loop conv, bias + lrelu epilogue
# ---------------------------------------------------------------------------


def _tapconv_kernel(xf_ref, wf_ref, b_ref, y_ref, acc_ref, *, taps: int,
                    t_out: int, slope: float, step: int):
    # accumulate INTO a scratch ref: the data dependence serializes the tap
    # dots so only one (t_out, C') load + one dot output are live at a time
    # (a pure value chain let Mosaic keep all `taps` slices on the stack —
    # 22 MB scoped-vmem OOM at the 4096x256 layer)
    acc_ref[...] = jnp.dot(
        xf_ref[0, 0, 0:t_out, :], wf_ref[0, 0], preferred_element_type=jnp.float32
    )
    for a in range(1, taps):
        acc_ref[...] += jnp.dot(
            xf_ref[0, 0, a * step : a * step + t_out, :], wf_ref[0, a],
            preferred_element_type=jnp.float32,
        )
    z = acc_ref[...] + b_ref[0, 0].astype(jnp.float32)
    if slope != 1.0:
        # no bf16 compares on Mosaic; z is f32 here so where() is safe
        z = jnp.where(z >= 0, z, slope * z)
    y_ref[0, 0] = z.astype(y_ref.dtype)


def _tapconv_pallas(xf, wf, bias2, *, slope: float, interpret: bool, step: int = 1):
    """(B, G, U, C') x (G, taps, C', D) + (G, 1, D) -> (B, G, T_out, D)
    with T_out = U - (taps-1)*step; ``step`` is the tap dilation."""
    batch, g, u, c_in = xf.shape
    g2, taps, c_in2, d = wf.shape
    assert g2 == g and c_in2 == c_in, (xf.shape, wf.shape)
    t_out = u - (taps - 1) * step
    assert t_out >= 1

    d_tiles = 1
    while (taps * c_in * d // d_tiles) * xf.dtype.itemsize > _WEIGHT_BLOCK_BYTES:
        d_tiles *= 2
    while d % d_tiles:
        d_tiles //= 2
    d_blk = d // d_tiles

    kern = functools.partial(
        _tapconv_kernel, taps=taps, t_out=t_out, slope=slope, step=step
    )
    return pl.pallas_call(
        kern,
        grid=(g, d_tiles, batch),
        in_specs=[
            pl.BlockSpec((1, 1, u, c_in), lambda gi, di, bi: (bi, gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, taps, c_in, d_blk), lambda gi, di, bi: (gi, 0, 0, di),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_blk), lambda gi, di, bi: (gi, 0, di),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t_out, d_blk), lambda gi, di, bi: (bi, gi, 0, di),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, g, t_out, d), xf.dtype),
        scratch_shapes=[pltpu.VMEM((t_out, d_blk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # v5e has 128 MB VMEM; the 16 MB scoped default is too tight for
            # the wide layers' weight block + double-buffered input slabs
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xf, wf, bias2)


# ---------------------------------------------------------------------------
# custom VJP over the folded core (fold/unfold stay outside, autodiffed)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _get_tapconv(slope: float, interpret: bool, step: int = 1):
    @jax.custom_vjp
    def tapconv(xf, wf, bias2):
        return _tapconv_pallas(xf, wf, bias2, slope=slope, interpret=interpret,
                               step=step)

    def fwd(xf, wf, bias2):
        y = tapconv(xf, wf, bias2)
        return y, (xf, wf, y)

    def bwd(res, dy):
        xf, wf, y = res
        taps = wf.shape[1]
        t_out = y.shape[2]
        if slope != 1.0:
            dz = dy * jnp.where(y >= 0, 1.0, slope).astype(dy.dtype)
        else:
            dz = dy
        # bias grad: sum over batch and time -> (G, 1, D)
        dbias = dz.sum(axis=(0, 2), dtype=jnp.float32)[:, None, :].astype(dz.dtype)
        # weight grad: per tap, a plain batched dot over (batch, time)
        dwf = jnp.stack(
            [
                jnp.einsum(
                    "bguc,bguo->gco",
                    xf[:, :, a * step : a * step + t_out],
                    dz,
                    preferred_element_type=jnp.float32,
                )
                for a in range(taps)
            ],
            axis=1,
        ).astype(wf.dtype)
        # input grad: the SAME kernel on the zero-padded cotangent with
        # tap-flipped transposed weights (correlation <-> convolution)
        pad = (taps - 1) * step
        dzp = jnp.pad(dz, ((0, 0), (0, 0), (pad, pad), (0, 0)))
        wt = jnp.flip(wf, axis=1).transpose(0, 1, 3, 2)
        zero_bias = jnp.zeros((wf.shape[0], 1, wf.shape[2]), dz.dtype)
        dxf = _tapconv_pallas(dzp, wt, zero_bias, slope=1.0, interpret=interpret,
                              step=step)
        return dxf, dwf, dbias

    tapconv.defvjp(fwd, bwd)
    return tapconv


# ---------------------------------------------------------------------------
# public op: fold -> tapconv -> unfold
# ---------------------------------------------------------------------------


def _densify(kernel: jax.Array, groups: int) -> jax.Array:
    """(K, Ci_g, Cout) grouped kernel -> exact block-diagonal dense
    (K, Cin, Cout) (off-block zeros; same trick as NormConv1d block_dense)."""
    k, ci_g, cout = kernel.shape
    co_g = cout // groups
    dense = jnp.zeros((k, ci_g * groups, cout), kernel.dtype)
    for g in range(groups):
        dense = dense.at[:, g * ci_g : (g + 1) * ci_g, g * co_g : (g + 1) * co_g].set(
            kernel[:, :, g * co_g : (g + 1) * co_g]
        )
    return dense


def msd_conv1d_lrelu(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None,
    *,
    stride: int = 1,
    padding: int | tuple[int, int] = 0,
    dilation: int = 1,
    groups: int = 1,
    slope: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """Fused conv1d + leaky-relu, torch integer-padding semantics.

    x (B, T, Cin), kernel (K, Cin//groups, Cout) [lax feature_group_count
    layout, = NormConv1d's], bias (Cout,) or None. slope=1.0 disables the
    activation (the conv_post layer). Either ``stride`` (phase folding) or
    ``dilation`` (tap step) may exceed 1, not both — the reference's conv
    inventory never combines them. Differentiable (custom VJP).
    """
    assert stride == 1 or dilation == 1, "stride and dilation are exclusive"
    batch, t_in, c_in = x.shape
    k, ci_g_k, c_out = kernel.shape
    pad_l, pad_r_cfg = (padding, padding) if isinstance(padding, int) else padding

    if groups > 1 and (
        _cdiv(k, stride) * (stride * c_in) * c_out * x.dtype.itemsize
        <= _DENSIFY_WEIGHT_BYTES
    ):
        kernel = _densify(kernel, groups)
        groups = 1
    g = groups
    ci_g = c_in // g
    co_g = c_out // g
    assert kernel.shape[1] == ci_g, (kernel.shape, c_in, g)

    k_span = (k - 1) * dilation + 1
    t_out = (t_in + pad_l + pad_r_cfg - k_span) // stride + 1
    taps = _cdiv(k, stride)
    c_fold = stride * ci_g
    u = t_out + (taps - 1) * dilation
    total_len = stride * u
    pad_r = total_len - t_in - pad_l
    assert pad_r >= 0, (t_in, pad_l, pad_r_cfg, stride, k, dilation)

    # ---- fold input: (B, T, Cin) -> (B, G, U, s*Ci_g) ----
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    xf = xp.reshape(batch, u, stride, g, ci_g)
    xf = xf.transpose(0, 3, 1, 2, 4).reshape(batch, g, u, c_fold)

    # ---- fold weights: (K, Ci_g, Cout) -> (G, taps, s*Ci_g, Co_g) ----
    kp = jnp.pad(kernel, ((0, stride * taps - k), (0, 0), (0, 0)))
    wf = kp.reshape(taps, stride * ci_g, g, co_g).transpose(2, 0, 1, 3)

    bias2 = (
        bias.reshape(g, 1, co_g)
        if bias is not None
        else jnp.zeros((g, 1, co_g), x.dtype)
    ).astype(x.dtype)

    y = _get_tapconv(float(slope), bool(interpret), int(dilation))(
        xf, wf.astype(x.dtype), bias2
    )
    # (B, G, T_out, Co_g) -> (B, T_out, Cout)
    return y.transpose(0, 2, 1, 3).reshape(batch, t_out, c_out)
