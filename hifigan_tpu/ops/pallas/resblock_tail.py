"""Fused multi-ResBlock Pallas kernel for the generator's narrow tail.

The last upsampling stages run 13-19 convolutions at 32-64 channels over
hundreds of thousands of samples; XLA executes each as a separate HBM-
roundtripping conv at ~1-2% MXU utilisation (channels << 128 lanes). This
kernel computes an ENTIRE stage's MRF (mean of num_kernels ResBlock1/2
stacks, reference src/models.py:100-111) in one pass per time tile:

- the tile (plus the stage's receptive-field halo) is DMA'd into VMEM once;
  every intermediate activation of every resblock stays in VMEM;
- activations are held in a time-blocked layout (T/b, b*C = 128 lanes) so
  every conv is a chain of full-width (128, 128) MXU matmuls;
- each k-tap dilation-d conv becomes sum_q shift(x, q) @ K[q] with the block
  kernels K (nq, 128, 128) precomputed HOST-SIDE by scattering the original
  (k, C, C) taps by phase (same construction as ops.conv.conv1d_time_blocked).

Semantics == mean of ResBlock1/ResBlock2 outputs; validated against the jnp
model in interpreter mode and on hardware (tests/test_pallas_tail.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hifigan_tpu.ops.conv import LRELU_SLOPE


def _blocked_kernel_np(kernel: np.ndarray, dilation: int, block: int) -> tuple[np.ndarray, int]:
    """(k, Ci, Co) tap kernel -> ((nq, block*Ci, block*Co), live_q) blocks."""
    k, ci, co = kernel.shape
    p = (k - 1) * dilation // 2
    tau = np.arange(k)[:, None]
    r = np.arange(block)[None, :]
    off = tau * dilation - p
    q = (r + off) // block
    rho = (r + off) % block
    q_min, q_max = int(q.min()), int(q.max())
    nq = q_max - q_min + 1
    big = np.zeros((nq, block, block, ci, co), np.float32)
    for ti in range(k):
        for ri in range(block):
            big[q[ti, ri] - q_min, rho[ti, ri], ri] += np.asarray(kernel[ti], np.float32)
    big = big.transpose(0, 1, 3, 2, 4).reshape(nq, block * ci, block * co)
    # dilated convs leave many all-zero tap slots in the dense q range —
    # keep only live taps (the kernel loops an explicit (slot, q) list)
    live = [qi for qi in range(nq) if np.abs(big[qi]).sum() > 0]
    if not live:  # all-zero kernel: keep the q=0 slot so live_q is never empty
        live = [-q_min]
    big = big[live]
    live_q = [q_min + qi for qi in live]
    return big, live_q


def prepare_tail_stage(params_stage, dilations, block: int, pair_size: int) -> dict:
    """Pack one stage's resblock conv params for the fused kernel.

    params_stage: [resblock][conv] dicts with 'kernel' (k, C, C) and 'bias'
    (C,), in execution order. pair_size: convs per residual connection —
    2 for ResBlock1 (dilated+unit), 1 for ResBlock2.
    """
    packed = []
    for convs, ds in zip(params_stage, dilations):
        rb_pack = []
        for conv, d in zip(convs, ds):
            big, live_q = _blocked_kernel_np(np.asarray(conv["kernel"]), int(d), block)
            bias = np.tile(np.asarray(conv["bias"], np.float32), block)[None, :]  # 2-D for TPU
            rb_pack.append({"big": big, "live_q": tuple(live_q), "bias": bias})
        packed.append(rb_pack)
    return {"resblocks": packed, "block": block, "pair_size": pair_size}


def _blocked_trans_kernel_np(
    kernel: np.ndarray, stride: int, padding: int, block_out: int
) -> tuple[np.ndarray, list[int]]:
    """(k, Ci, Co) TRANSPOSED-conv tap kernel -> blocked matmul form.

    torch ConvTranspose1d(stride=u, padding=p) semantics (out[o] += in[i] @
    W[k] where o = i*u - p + k) in the shared time-block index space: with
    output blocks of ``block_out`` samples and input blocks of b_in =
    block_out/u samples, block t of the output depends on input blocks t+q:

        out[t*b_out + r] = sum_q in_block[t+q] @ K[q],
        K[q][s*Ci + ci, r*Co + co] += W[ktap, ci, co]
        where ktap = r - q*b_out - s*u + p  (kept when 0 <= ktap < k).

    Returns ((nq, b_in*Ci, block_out*Co), live_q) like _blocked_kernel_np, so
    an upsampler can run as the leading matmul chain of a fused tail stage.
    """
    k, ci, co = kernel.shape
    u, p = stride, padding
    assert block_out % u == 0, "output block must be a multiple of the stride"
    b_in = block_out // u
    entries = []  # (q, s, r, ktap)
    for r in range(block_out):
        for s in range(b_in):
            base = r - s * u + p
            q_lo = -(-(base - (k - 1)) // block_out)  # ceil
            q_hi = base // block_out  # floor
            for q in range(q_lo, q_hi + 1):
                ktap = base - q * block_out
                if 0 <= ktap < k:
                    entries.append((q, s, r, ktap))
    if not entries:
        return np.zeros((1, b_in * ci, block_out * co), np.float32), [0]
    q_min = min(e[0] for e in entries)
    q_max = max(e[0] for e in entries)
    nq = q_max - q_min + 1
    big = np.zeros((nq, b_in, block_out, ci, co), np.float32)
    for q, s, r, ktap in entries:
        big[q - q_min, s, r] += np.asarray(kernel[ktap], np.float32)
    big = big.transpose(0, 1, 3, 2, 4).reshape(nq, b_in * ci, block_out * co)
    live = [qi for qi in range(nq) if np.abs(big[qi]).sum() > 0]
    if not live:
        live = [-q_min]
    big = big[live]
    live_q = [q_min + qi for qi in live]
    return big, live_q


def prepare_upsample(trans_params: dict, stride: int, padding: int, block: int) -> dict:
    """Pack a folded ConvTranspose1d upsampler (kernel (k, Ci, Co), bias
    (Co,)) so :func:`fused_tail_stage` can absorb it as ``pre_pack``: the
    stage then computes lrelu -> upsample -> MRF [-> post] entirely in VMEM,
    removing the XLA transposed conv and its (T, C) HBM round trips
    (reference stage structure: src/models.py:100-111)."""
    big, live_q = _blocked_trans_kernel_np(
        np.asarray(trans_params["kernel"]), stride, padding, block
    )
    bias = np.tile(np.asarray(trans_params["bias"], np.float32), block)[None, :]
    return {
        "big": big,
        "live_q": tuple(live_q),
        "bias": bias,
        "b_in": block // stride,
        "ci": int(np.asarray(trans_params["kernel"]).shape[1]),
    }


def prepare_post(post_params: dict, block: int) -> dict:
    """Pack the generator's conv_post (k7, C -> 1) for in-kernel folding:
    lrelu(0.01) -> conv_post -> tanh happens inside the tail kernel, saving
    the (T, C) HBM round trip + two extra XLA ops on the serving path."""
    big, live_q = _blocked_kernel_np(np.asarray(post_params["kernel"]), 1, block)
    bias = np.tile(np.asarray(post_params["bias"], np.float32), block)[None, :]
    return {"big": big, "live_q": tuple(live_q), "bias": bias}


def fused_tail_stage(x: jax.Array, packed: dict, interpret: bool = False,
                     tile_blocks: int = 512,
                     split_resblocks: bool | str = False,
                     post_pack: dict | None = None,
                     pre_pack: dict | None = None) -> jax.Array:
    """x: (B, T, C) -> mean of resblock outputs, same shape (the MRF stage).

    ``split_resblocks`` bounds per-kernel VMEM weight footprint (>~8 MB of
    VMEM-resident inputs OOMs on v5e):
    - ``'resblock'`` (or True): one pallas call per resblock, averaged in
      XLA — 1/num_kernels the weight footprint (V1's k=11 64-ch stage packs
      ~5.7 MB of block kernels).
    - ``'pair'``: one call per RESIDUAL PAIR chained in XLA (each call
      computes ``h + convchain(lrelu(h))`` for its pair) — 1/(num_kernels *
      n_pairs) the footprint. This is what lets the WIDE 256-ch stage-0 fuse
      at block=1 (lanes = C = 256, i.e. two lane tiles): its k=11 resblock
      alone packs ~8.6 MB, each of its pairs only ~2.9 MB.

    ``post_pack`` (from :func:`prepare_post`) folds the generator tail —
    lrelu(0.01) -> conv_post -> tanh (reference src/models.py:112-114) —
    into the same kernel; the result is then (B, T, 1) float32 waveform.

    ``pre_pack`` (from :func:`prepare_upsample`) folds the stage's
    ConvTranspose1d upsampler (and the lrelu before it, reference
    src/models.py:101-103) into the same kernel: x is then the PREVIOUS
    stage's output (B, T/u, u*C) and the upsample runs as the leading
    blocked matmul chain — no XLA transposed conv, no HBM round trip of
    either the pre-upsample or post-upsample activation.
    """
    split = "resblock" if split_resblocks is True else (split_resblocks or "")
    if split and len(packed["resblocks"]) * (
        1 if split == "resblock" else len(packed["resblocks"][0])
    ) > 1:
        assert post_pack is None, "post folding requires the monolithic form"
        assert pre_pack is None, "upsampler folding requires the monolithic form"
        n = len(packed["resblocks"])
        ps = packed["pair_size"]
        if split == "bin":
            # greedy-bin resblocks under the VMEM weight limit: fewer kernel
            # launches than 'resblock' (V1 stage-0: k3+k7 share one call,
            # k11 its own — 3 calls -> 2) at the same per-call footprint
            # bound. Each sub-call averages over ITS group, so reweight by
            # group size before the global /n.
            limit = 9 * 1024 * 1024
            groups: list[list] = []
            gbytes = 0
            for rb in packed["resblocks"]:
                rbb = sum(2 * cv["big"].size for cv in rb)
                if groups and gbytes + rbb <= limit:
                    groups[-1].append(rb)
                    gbytes += rbb
                else:
                    groups.append([rb])
                    gbytes = rbb
            acc = None
            for grp in groups:
                sub = {"resblocks": grp, "block": packed["block"],
                       "pair_size": ps}
                out = fused_tail_stage(x, sub, interpret=interpret,
                                       tile_blocks=tile_blocks)
                out = out * len(grp) if len(grp) != n else out
                acc = out if acc is None else acc + out
            return acc / n if len(groups) > 1 else acc
        acc = None
        for rb in packed["resblocks"]:
            if split == "pair" and len(rb) > ps:
                h = x
                for pi in range(len(rb) // ps):
                    sub = {"resblocks": [rb[pi * ps : (pi + 1) * ps]],
                           "block": packed["block"], "pair_size": ps}
                    # single-pair call: h <- h + pair(h) (residual inside)
                    h = fused_tail_stage(h, sub, interpret=interpret,
                                         tile_blocks=tile_blocks)
                out = h
            else:
                sub = {"resblocks": [rb], "block": packed["block"],
                       "pair_size": ps}
                out = fused_tail_stage(x, sub, interpret=interpret,
                                       tile_blocks=tile_blocks)
            acc = out if acc is None else acc + out
        return acc / n
    block = packed["block"]
    pair_size = packed["pair_size"]
    if pre_pack is not None:
        b, t_in, c_in = x.shape
        b_in = pre_pack["b_in"]
        assert c_in == pre_pack["ci"], "pre_pack input channels mismatch"
        assert t_in % b_in == 0, "input time must divide the input block factor"
        lanes = int(pre_pack["big"].shape[2])  # block * C_out
        c = lanes // block
        t = t_in * (block // b_in)  # output samples = T_in * stride
        # one shared zero-padded work buffer => equal lane widths (128 in
        # every HiFi-GAN tail case: b_in*2C == block*C)
        assert b_in * c_in == lanes, "pre_pack lane width must match the stage's"
        t_blocks_total = t_in // b_in
    else:
        b, t, c = x.shape
        lanes = block * c
        assert t % block == 0, "time must divide the block factor"
        t_blocks_total = t // block

    # conservative stage halo (blocks): longest resblock chain's per-conv
    # radii, rounded to the f32 sublane tile (8) so every in-kernel slice
    # offset stays aligned
    halo_b = max(
        sum(max(abs(q) for q in cv["live_q"]) + 1 for cv in rb)
        for rb in packed["resblocks"]
    )
    if post_pack is not None:
        halo_b += max(abs(q) for q in post_pack["live_q"]) + 1
    if pre_pack is not None:
        halo_b += max(abs(q) for q in pre_pack["live_q"]) + 1
    halo_b = -(-halo_b // 8) * 8

    tile_b = min(tile_blocks, t_blocks_total)
    n_tiles = -(-t_blocks_total // tile_b)
    pad_b = n_tiles * tile_b - t_blocks_total
    x4 = x.reshape(b, t_blocks_total, lanes)
    if pad_b:
        x4 = jnp.pad(x4, ((0, 0), (0, pad_b), (0, 0)))
    total_b = t_blocks_total + pad_b
    work = tile_b + 2 * halo_b

    weights: list[jax.Array] = []
    pre_span: tuple[int, ...] = ()
    if pre_pack is not None:  # pre weights FIRST: kernel reads w_refs[0:2]
        weights.append(jnp.asarray(pre_pack["big"], x.dtype))
        weights.append(jnp.asarray(pre_pack["bias"], x.dtype))
        pre_span = tuple(pre_pack["live_q"])
    w_off = 2 if pre_span else 0
    spans: list[list[tuple[int, ...]]] = []
    for rb in packed["resblocks"]:
        rb_spans = []
        for cv in rb:
            weights.append(jnp.asarray(cv["big"], x.dtype))
            weights.append(jnp.asarray(cv["bias"], x.dtype))
            rb_spans.append(tuple(cv["live_q"]))
        spans.append(rb_spans)
    n_rb = len(spans)
    post_span: tuple[int, ...] = ()
    if post_pack is not None:
        weights.append(jnp.asarray(post_pack["big"], x.dtype))
        weights.append(jnp.asarray(post_pack["bias"], x.dtype))
        post_span = tuple(post_pack["live_q"])
    # widest single-conv shift, for the zero-padded work buffer (8-aligned)
    qmax_abs = max(max(abs(q) for q in qs) for rb in spans for qs in rb)
    if post_span:
        qmax_abs = max(qmax_abs, max(abs(q) for q in post_span))
    if pre_span:
        qmax_abs = max(qmax_abs, max(abs(q) for q in pre_span))
    qmax_abs = -(-qmax_abs // 8) * 8

    flat_spans = [sp for rb in spans for sp in rb]

    def kernel(x_ref, *refs):
        # arg order: inputs, outputs, scratch
        sem = refs[-1]
        pad_buf = refs[-2]  # (work + 2*qmax_abs, lanes) zero-bordered scratch
        xw = refs[-3]  # (work, lanes) VMEM scratch
        out_ref = refs[-4]
        w_refs = refs[:-4]
        bi = pl.program_id(0)
        ti = pl.program_id(1)

        dma = pltpu.make_async_copy(x_ref.at[bi, pl.ds(ti * tile_b, work), :], xw, sem)
        dma.start()
        # zero the pad borders once; conv writes only touch the centre
        pad_buf[0:qmax_abs, :] = jnp.zeros((qmax_abs, lanes), pad_buf.dtype)
        pad_buf[qmax_abs + work :, :] = jnp.zeros((qmax_abs, lanes), pad_buf.dtype)
        dma.wait()
        x0 = xw[:, :]
        dtype = x0.dtype

        # outside-sequence mask: the unsharded model zero-pads EVERY layer at
        # the true sequence edges; keep those rows zero through the chain
        row = jax.lax.broadcasted_iota(jnp.int32, (work, 1), 0)
        left = jnp.where(ti == 0, halo_b, 0)
        right = jnp.minimum(t_blocks_total - ti * tile_b + halo_b, work)
        seq_mask = ((row >= left) & (row < right)).astype(dtype)

        if pre_span:
            # folded upsampler: lrelu (pre-upsample activation, ref
            # src/models.py:101) -> blocked ConvTranspose1d matmul chain
            xin = jnp.maximum(x0, 0) + jnp.asarray(LRELU_SLOPE, dtype) * jnp.minimum(x0, 0)
            pad_buf[qmax_abs : qmax_abs + work, :] = xin * seq_mask
            K0 = w_refs[0]
            acc0 = jnp.zeros((work, lanes), jnp.float32)
            for qi, q in enumerate(pre_span):
                seg = pad_buf[qmax_abs + q : qmax_abs + q + work, :]
                acc0 = acc0 + jnp.dot(seg, K0[qi], preferred_element_type=jnp.float32)
            bias0 = w_refs[1][0, :].astype(jnp.float32)
            x0 = (acc0 + bias0[None, :]).astype(dtype)

        def conv(tcur, wi):
            live_q = flat_spans[wi // 2]
            K = w_refs[w_off + wi]
            bias = w_refs[w_off + wi + 1]
            pad_buf[qmax_abs : qmax_abs + work, :] = tcur * seq_mask
            accum = jnp.zeros((work, lanes), jnp.float32)
            for qi, q in enumerate(live_q):
                seg = pad_buf[qmax_abs + q : qmax_abs + q + work, :]
                accum = accum + jnp.dot(seg, K[qi], preferred_element_type=jnp.float32)
            bias_val = bias[0, :].astype(jnp.float32)
            return (accum + bias_val[None, :]).astype(dtype)

        acc = jnp.zeros((work, lanes), jnp.float32)
        wi = 0
        for rb_spans in spans:
            h = x0
            n_pairs = len(rb_spans) // pair_size
            for _pair in range(n_pairs):
                tcur = h
                for _ in range(pair_size):
                    # max/min form — Mosaic lacks bf16 vector comparisons
                    tcur = jnp.maximum(tcur, 0) + jnp.asarray(
                        LRELU_SLOPE, tcur.dtype
                    ) * jnp.minimum(tcur, 0)
                    tcur = conv(tcur, wi)
                    wi += 2
                h = h + tcur
            acc = acc + h.astype(jnp.float32)
        out = (acc / n_rb).astype(dtype)
        if post_span:
            # folded generator tail: lrelu(0.01, torch default slope at
            # conv_post input, ref src/models.py:112) -> conv_post -> tanh
            h01 = jnp.maximum(out, 0) + jnp.asarray(0.01, dtype) * jnp.minimum(out, 0)
            pad_buf[qmax_abs : qmax_abs + work, :] = h01 * seq_mask
            K = w_refs[-2]
            pbias = w_refs[-1]
            pacc = jnp.zeros((work, block), jnp.float32)
            for qi, q in enumerate(post_span):
                seg = pad_buf[qmax_abs + q : qmax_abs + q + work, :]
                pacc = pacc + jnp.dot(seg, K[qi], preferred_element_type=jnp.float32)
            pacc = pacc + pbias[0, :].astype(jnp.float32)[None, :]
            wav = jnp.tanh(pacc)
            out_ref[0, :, :] = wav[halo_b : halo_b + tile_b, :]
        else:
            out_ref[0, :, :] = out[halo_b : halo_b + tile_b, :]

    x4p = jnp.pad(x4, ((0, 0), (halo_b, halo_b), (0, 0)))

    out_lanes = block if post_span else lanes
    out_dtype = jnp.float32 if post_span else x.dtype
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        out_specs=pl.BlockSpec(
            (1, tile_b, out_lanes), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, total_b, out_lanes), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((work, lanes), x.dtype),
            pltpu.VMEM((work + 2 * qmax_abs, lanes), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x4p, *weights)
    if post_span:
        return out[:, :t_blocks_total, :].reshape(b, t, 1)
    return out[:, :t_blocks_total, :].reshape(b, t, c)


# ---------------------------------------------------------------------------
# generator integration helpers
# ---------------------------------------------------------------------------


def pack_generator_tail(h, folded_params: dict, stage_index: int, block: int) -> dict:
    """Extract stage `stage_index`'s resblock convs from folded Generator
    params and pack them for :func:`fused_tail_stage`."""
    num_kernels = len(h["resblock_kernel_sizes"])
    is_rb1 = str(h["resblock"]) == "1"
    pair_size = 2 if is_rb1 else 1
    params_stage = []
    dilations = []
    for j in range(num_kernels):
        rb = folded_params[f"resblocks_{stage_index * num_kernels + j}"]
        convs = []
        ds = []
        rds = h["resblock_dilation_sizes"][j]
        if is_rb1:
            for i, d in enumerate(rds):
                convs.append(rb[f"convs1_{i}"])
                ds.append(d)
                convs.append(rb[f"convs2_{i}"])
                ds.append(1)
        else:
            for i, d in enumerate(rds):
                convs.append(rb[f"convs_{i}"])
                ds.append(d)
        params_stage.append(convs)
        dilations.append(ds)
    return prepare_tail_stage(params_stage, dilations, block, pair_size)
