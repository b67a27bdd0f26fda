"""Stateful streaming vocoder: mel chunks in, waveform chunks out, with
per-stage left-context state instead of receptive-field recompute.

The halo streamer (parallel/halo.streaming_vocode) re-synthesizes a
``chunk + 2*halo`` window per chunk — for V1's 78-frame halo at 32-frame
chunks that is ~5x overcompute. This module keeps a small ring buffer of
each STAGE's inputs (2x the stage's own one-sided receptive field, which is
tens of samples at the stage rate) so each step computes only the new
samples plus that local context.

Exactness: every block applies the SAME-padded ops on ``[buffer, new]``
windows and emits only interior outputs, which equal full-sequence
synthesis bit-for-bit up to float addition order. Sequence head: the first
``delay_samples`` emitted samples precede position 0 (priming — drop
them), and the following <= ``delay_samples`` samples can differ slightly
from whole-utterance synthesis — full synthesis zero-pads at EVERY layer's
input at t=0 while a streamer only has zero raw history (live-stream
semantics; the layers' pre-sequence activations are bias-propagated, not
zero). From sample ``delay_samples`` on the stream is exact. Like any
centered-conv streamer it runs ``delay_samples`` behind the input frontier
(the architecture's inherent right-context latency — the halo streamer
waits for the same future frames, it just recomputes the past too).
End-of-stream: infinite-stream semantics (no end-of-sequence zero
padding); flush by feeding silence.

Reference surface: the reference has no streaming inference at all
(inference.py synthesizes whole utterances, README.md:33-39); this is the
TPU-native serving design: static shapes per chunk (one compiled step), the
fused Pallas MRF stages riding the same VMEM-resident kernels as B=1
serving (models/fast_infer.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from hifigan_tpu.ops.conv import LRELU_SLOPE, conv1d, conv_transpose1d, leaky_relu


def _resblock_halo(h: Any) -> list[int]:
    """One-sided receptive field of each stage's MRF at the stage rate."""
    halos = []
    if str(h["resblock"]) == "1":
        # ResBlock1: per dilation d, conv(k,d) then conv(k,1), units chained
        per = lambda k, ds: sum((k - 1) // 2 * d + (k - 1) // 2 for d in ds)  # noqa: E731
    else:
        # ResBlock2: per dilation d one conv(k,d), units chained
        per = lambda k, ds: sum((k - 1) // 2 * d for d in ds)  # noqa: E731
    halos.append(
        max(
            per(k, ds)
            for k, ds in zip(h["resblock_kernel_sizes"], h["resblock_dilation_sizes"])
        )
    )
    return halos * len(h["upsample_rates"])


def make_streaming_vocoder(h: Any, folded_params: dict, dtype=jnp.bfloat16,
                           use_fast: bool | None = None,
                           interpret: bool = False):
    """Build (init_state, step, delay_samples) for chunked streaming.

    ``step(state, mel_chunk (B, M, F)) -> (state, wav (B, 1, F*hop))`` is
    jittable with static chunk size; outputs stream ``delay_samples``
    behind the input frontier (drop the first ``delay_samples`` priming
    samples). ``use_fast`` routes each MRF through the fused Pallas stage
    kernels (models/fast_infer.py packing) — default on accelerators; the
    XLA MRF otherwise.
    """
    if use_fast is None:
        use_fast = jax.default_backend() not in ("cpu",)
    num_kernels = len(h["resblock_kernel_sizes"])
    stages = list(enumerate(zip(h["upsample_rates"], h["upsample_kernel_sizes"])))
    ch0 = h["upsample_initial_channel"]
    mrf_halo = _resblock_halo(h)

    params = jax.tree_util.tree_map(lambda v: jnp.asarray(v, dtype), folded_params)

    packs: dict[int, dict] = {}
    splits: dict[int, bool | str] = {}
    if use_fast:
        from hifigan_tpu.ops.pallas.resblock_tail import pack_generator_tail

        for i, (u, k) in stages:
            ch = ch0 // (2 ** (i + 1))
            if 128 % ch == 0 or ch % 128 == 0:
                block = max(128 // ch, 1)
                packs[i] = pack_generator_tail(h, folded_params, i, block=block)
                wbytes = sum(
                    2 * cv["big"].size for rb in packs[i]["resblocks"] for cv in rb
                )
                rb_bytes = max(
                    sum(2 * cv["big"].size for cv in rb)
                    for rb in packs[i]["resblocks"]
                )
                limit = 9 * 1024 * 1024
                if wbytes > limit:
                    splits[i] = "pair" if rb_bytes > limit else "resblock"

    def mrf_xla(x, stage_idx, ch):
        from hifigan_tpu.models.generator import ResBlock1, ResBlock2

        cls = ResBlock1 if str(h["resblock"]) == "1" else ResBlock2
        xs = None
        for j, (rk, rd) in enumerate(
            zip(h["resblock_kernel_sizes"], h["resblock_dilation_sizes"])
        ):
            out = cls(channels=ch, kernel_size=rk, dilation=tuple(rd), norm="none").apply(
                {"params": params[f"resblocks_{stage_idx * num_kernels + j}"]}, x
            )
            xs = out if xs is None else xs + out
        return xs / num_kernels

    def mrf_apply(x, i, ch):
        if i in packs:
            from hifigan_tpu.ops.pallas.resblock_tail import fused_tail_stage

            return fused_tail_stage(
                x, packs[i], interpret=interpret,
                split_resblocks=splits.get(i, False),
            )
        return mrf_xla(x, i, ch)

    # ---- static block plan: (kind, R, fn, channels) ----
    # every block consumes n inputs (time-major (B, T, C)) and emits n
    # (stride-1) or u*n (upsampler) outputs, delayed by R of its inputs
    blocks = []
    # conv_pre: k7 SAME pad 3 at the mel rate
    blocks.append((
        "s1", 3,
        lambda z: conv1d(z, params["conv_pre"]["kernel"],
                         params["conv_pre"]["bias"], padding=3),
        h["num_mels"],
    ))
    for i, (u, k) in stages:
        ch_in = ch0 // (2 ** i)
        ch = ch0 // (2 ** (i + 1))
        r_up = -(-k // u)  # ceil(k/u): covers the transposed conv's reach

        def up_fn(z, i=i, u=u, k=k):
            p = params[f"ups_{i}"]
            z = leaky_relu(z, LRELU_SLOPE)
            return conv_transpose1d(z, p["kernel"], p["bias"], stride=u,
                                    padding=(k - u) // 2)

        blocks.append(("up", r_up, up_fn, ch_in, u))
        r_mrf = mrf_halo[i]
        if i in packs:
            # the fused stage kernel folds time into lane blocks of
            # `block` samples: keep the window length (n + 2R) divisible
            # by rounding R up (a larger R stays exact — more context)
            blk = packs[i]["block"]
            r_mrf = -(-r_mrf // blk) * blk
        blocks.append((
            "s1", r_mrf,
            lambda z, i=i, ch=ch: mrf_apply(z, i, ch),
            ch,
        ))
    # tail: lrelu(0.01) + conv_post k7 + tanh
    blocks.append((
        "s1", 3,
        lambda z: jnp.tanh(
            conv1d(leaky_relu(z, 0.01), params["conv_post"]["kernel"],
                   params["conv_post"]["bias"], padding=3)
        ).astype(jnp.float32),
        ch0 // (2 ** len(stages)),
    ))

    # total output delay in samples: each block's R at its input rate,
    # scaled by the remaining upsampling below it
    delay = 0
    remaining = [1] * len(blocks)
    acc = 1
    for bi in range(len(blocks) - 1, -1, -1):
        remaining[bi] = acc
        if blocks[bi][0] == "up":
            acc *= blocks[bi][4]
    delay_samples = sum(
        b[1] * (remaining[bi] * (b[4] if b[0] == "up" else 1))
        for bi, b in enumerate(blocks)
    )

    def init_state(batch: int = 1):
        state = []
        for b in blocks:
            r, c = b[1], b[3]
            state.append(jnp.zeros((batch, 2 * r, c), dtype))
        return state

    def step(state, mel_chunk: jax.Array):
        """mel_chunk (B, M, F) -> (new_state, wav (B, 1, F*hop))."""
        x = jnp.swapaxes(mel_chunk, -1, -2).astype(dtype)  # (B, F, M)
        new_state = []
        for bi, b in enumerate(blocks):
            kind, r, fn = b[0], b[1], b[2]
            buf = state[bi]
            z = jnp.concatenate([buf, x], axis=1) if r else x
            y = fn(z)
            if kind == "s1":
                out = y[:, r : r + x.shape[1]] if r else y
            else:  # upsampler: emits u per input, interior starts at r*u
                u = b[4]
                out = y[:, r * u : (r + x.shape[1]) * u]
            new_state.append(z[:, z.shape[1] - 2 * r :] if r else buf)
            x = out
        return new_state, jnp.swapaxes(x, -1, -2)

    return init_state, step, int(delay_samples)
