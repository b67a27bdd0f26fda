"""Vocoder inference with the fused-Pallas tail (optional path).

Builds a jittable mel->wav function from FOLDED generator params where the
narrow stages' MRF runs through ops.pallas.resblock_tail.fused_tail_stage
(time-blocked, VMEM-resident).

Measured on v5e: the fused stage wins in isolation at moderate batch
(stage3: 19 ms vs 36 ms XLA, bf16, B=32) but at the bench's B=128 the plain
XLA path is faster end-to-end (144 ms vs 160 ms with stage3 fused) — XLA's
conv lowering amortises better with batch while the kernel's in-VMEM matmul
chain plateaus at ~80 TF/s. The default inference path therefore stays pure
XLA; this module is the measured alternative for small-batch / low-latency
serving: V1 B=1 x 256 mel frames runs at **1511x real time** (BENCH_r04,
tile_blocks='auto' defaults; the round-3 tile=512 form measured 1271x /
2.34 ms) — all four MRF stages fused incl. the wide 256-ch stage-0,
dot-form polyphase upsamplers — see make_fast_vocoder.

Exactness: the fused stages match the flax MRF to float tolerance
(tests/test_pallas_tail.py); end-to-end parity in tests/test_fast_infer.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from hifigan_tpu.ops.conv import LRELU_SLOPE, conv1d, conv_transpose1d, leaky_relu
from hifigan_tpu.ops.pallas.resblock_tail import (
    fused_tail_stage,
    pack_generator_tail,
    prepare_post,
    prepare_upsample,
)


def make_fast_vocoder(h: Any, folded_params: dict, dtype=jnp.bfloat16,
                      tile_blocks: int | str = "auto", interpret: bool = False,
                      min_fused_stage: int = 0, fold_post: bool = True,
                      trans_method: str | None = None, fold_up: bool = False,
                      max_fused_ch: int = 256, wide_split: str = "auto"):
    """(folded params, h) -> jittable fn(mel (B, M, T)) -> wav (B, 1, T*hop).

    The packed block kernels are baked in as constants (inference-only path;
    rebuild after updating params). ``tile_blocks='auto'`` (default) picks a
    per-stage time tile from a calibrated scoped-VMEM budget model (weight
    tables + ~13 lane-rows of body temporaries per work block ≤ 14 MB) —
    2048 blocks for V1's narrow stages, 512 for the weight-heavy wide
    stage-0; see the in-loop comment. ``fold_post`` folds the generator tail
    (lrelu 0.01 -> conv_post -> tanh) into the last fused stage's kernel,
    eliminating the final (T, C) HBM round trip. ``fold_up`` folds each
    fused stage's ConvTranspose1d upsampler (+ its lrelu) into the same
    kernel when the block geometry allows (stride-2 stages: the V1/V2 tail).
    MEASURED SLOWER on v5e at B=1 (507x vs 676x RT): the blocked transposed
    conv costs more in-kernel MACs + halo than the XLA polyphase upsampler
    it replaces — default off; don't redo. ``trans_method`` applies to the
    XLA upsamplers; default (None) resolves to 'polyphase_dot' on
    accelerators — the conv-lowered polyphase form crawls at B=1 (the
    512->256 upsampler alone: 0.39 ms at 2.7 TFLOP/s in the serving
    profile), the dot form tiles on the MXU — and 'polyphase' on CPU (the
    measured CPU winner, docs/OPERATIONS.md). ``max_fused_ch`` gates which
    MRF stages run in the fused Pallas kernel: 256 (default) also fuses
    V1's WIDE 256-channel stage-0 at block=1 (lanes = 256, resblock-split
    to bound VMEM). MEASURED at B=1 (bf16, 256-frame mel, v5e): **1511x
    RT** with the tile_blocks='auto' defaults (BENCH_r04; the round-3
    tile=512 form was 1271x / 2.34 ms) with stage-0 fused + dot
    upsamplers, vs 996x with the conv-form upsamplers, 897x with
    pair-split stage-0, 803x with stage-0 left in XLA (max_fused_ch=128),
    675x with max_fused_ch=64, and 533x plain-XLA-bf16.
    """
    if trans_method is None:
        trans_method = (
            "polyphase" if jax.default_backend() == "cpu" else "polyphase_dot"
        )
    num_kernels = len(h["resblock_kernel_sizes"])
    stages = list(enumerate(zip(h["upsample_rates"], h["upsample_kernel_sizes"])))
    ch0 = h["upsample_initial_channel"]

    packs: dict[int, dict] = {}
    splits: dict[int, str] = {}
    tiles: dict[int, int] = {}
    pre_packs: dict[int, dict] = {}
    for i, (u, k) in stages:
        ch = ch0 // (2 ** (i + 1))
        # narrow stages time-fold to 128 lanes (block = 128/ch); WIDE stages
        # (ch a multiple of 128, e.g. V1 stage-0 at 256) run at block=1 with
        # lanes = ch (multiple Mosaic lane tiles)
        if ch <= max_fused_ch and i >= min_fused_stage and (
            128 % ch == 0 or ch % 128 == 0
        ):
            block = max(128 // ch, 1)
            packs[i] = pack_generator_tail(h, folded_params, i, block=block)
            # Bound per-call VMEM weight footprint. MEASURED (v5e, B=1 V1
            # stage-0 at 256 ch): 'resblock' split (<=8.6 MB/call) 968x RT,
            # monolithic 16.5 MB 964x (no OOM — whole-array VMEM operands
            # are single-buffered; the >8 MB OOM gotcha applies to
            # double-buffered windowed inputs), 'pair' split 897x (call
            # overhead). Auto: greedy 'bin' split when the monolithic pack
            # exceeds ~9 MB (round 5: 1554x vs 1542x for 'resblock' —
            # fewer launches at the same per-call bound), pair-split only
            # if a single resblock overruns on its own.
            wbytes = sum(
                2 * cv["big"].size for rb in packs[i]["resblocks"] for cv in rb
            )
            rb_bytes = max(
                sum(2 * cv["big"].size for cv in rb)
                for rb in packs[i]["resblocks"]
            )
            limit = 9 * 1024 * 1024
            if wide_split != "auto":
                if wide_split != "none" and wbytes > limit:
                    splits[i] = wide_split
            elif wbytes > limit:
                # 'bin' (round 5) greedily packs resblocks into <=limit
                # calls — V1 stage-0 goes 3 calls -> 2 (k3+k7 share one);
                # measured 1.912 vs 1.927 ms B=1 end-to-end vs 'resblock'
                splits[i] = "pair" if rb_bytes > limit else "bin"
            # 'bin' greedily packs resblocks under the same limit (fewer
            # launches than 'resblock'); its per-call weight max is bounded
            # by the limit itself, which the tile model must respect
            split_eff_w = limit if splits.get(i) == "bin" else rb_bytes
            if tile_blocks == "auto":
                # Per-stage time tile: a larger tile cuts halo overcompute
                # (per-tile compute is tile_b + 2*halo_b — stage 1 runs 25%
                # halo at 512) and grid steps, but the kernel's scoped-VMEM
                # stack — scratch + double-buffered out block + the body's
                # live vector temporaries — scales with the work size and
                # shares the 16 MB budget with the per-call weight tables.
                # Calibrated on v5e OOM reports: the body costs ~13 lane-rows
                # of bf16 per work block (stage 1 at tile 4096 = 17.16 MB,
                # over by 1.16; tile 16384 = same; the round-3 tile 512
                # always fit). Pick the largest tile that keeps
                # weights + body under 14 MB.
                eff_w = split_eff_w if i in splits else wbytes
                lanes = max(block * ch, 128)
                tiles[i] = 512
                # (2048 is the effective ceiling for every shipped config:
                # the body alone at 4096 blocks x 128 lanes is ~13.5 MB,
                # so 4096 only fires for hypothetical <0.5 MB weight tables)
                for cand in (4096, 2048, 1024):
                    body = 13 * (cand + 160) * lanes * 2
                    if eff_w + body <= 14 * 1024 * 1024:
                        tiles[i] = cand
                        break
            else:
                tiles[i] = int(tile_blocks)
            # the upsampler folds when in/out lane widths agree:
            # (block/u) * 2ch == block * ch  <=>  u == 2
            if fold_up and i not in splits and block % u == 0 and (
                block // u
            ) * 2 * ch == block * ch:
                pre_packs[i] = prepare_upsample(
                    folded_params[f"ups_{i}"], u, (k - u) // 2, block
                )

    last_stage = stages[-1][0]
    post_pack = None
    # post folding needs the monolithic kernel form — a split last stage
    # (VMEM-bound wide final stage) keeps the XLA tail instead
    if fold_post and last_stage in packs and last_stage not in splits:
        post_pack = prepare_post(folded_params["conv_post"], packs[last_stage]["block"])

    def cast(p):
        return jax.tree_util.tree_map(lambda v: jnp.asarray(v, dtype), p)

    params = cast(folded_params)

    def mrf_xla(x, stage_idx, ch):
        from hifigan_tpu.models.generator import ResBlock1, ResBlock2

        cls = ResBlock1 if str(h["resblock"]) == "1" else ResBlock2
        xs = None
        for j, (rk, rd) in enumerate(zip(h["resblock_kernel_sizes"], h["resblock_dilation_sizes"])):
            out = cls(channels=ch, kernel_size=rk, dilation=tuple(rd), norm="none").apply(
                {"params": params[f"resblocks_{stage_idx * num_kernels + j}"]}, x
            )
            xs = out if xs is None else xs + out
        return xs / num_kernels

    def fn(mel: jax.Array) -> jax.Array:
        x = jnp.swapaxes(mel, -1, -2).astype(dtype)
        p = params["conv_pre"]
        x = conv1d(x, p["kernel"], p["bias"], padding=3)
        for i, (u, k) in stages:
            ch = ch0 // (2 ** (i + 1))
            if i in pre_packs:  # lrelu + upsampler folded into the kernel
                x = fused_tail_stage(
                    x, packs[i], interpret=interpret, tile_blocks=tiles[i],
                    post_pack=post_pack if i == last_stage else None,
                    pre_pack=pre_packs[i],
                )
                continue
            x = leaky_relu(x, LRELU_SLOPE)
            p = params[f"ups_{i}"]
            x = conv_transpose1d(x, p["kernel"], p["bias"], stride=u, padding=(k - u) // 2,
                                 method=trans_method)
            if i in packs:
                x = fused_tail_stage(
                    x, packs[i], interpret=interpret, tile_blocks=tiles[i],
                    split_resblocks=splits.get(i, False),
                    post_pack=post_pack if i == last_stage else None,
                )
            else:
                x = mrf_xla(x, i, ch)
        if post_pack is not None:
            return jnp.swapaxes(x, -1, -2)  # tail already folded in-kernel
        x = leaky_relu(x, 0.01)
        p = params["conv_post"]
        x = conv1d(x, p["kernel"], p["bias"], padding=3)
        x = jnp.tanh(x).astype(jnp.float32)
        return jnp.swapaxes(x, -1, -2)

    return fn
