"""Stateful streaming vocoder (models/streaming.py): chunked synthesis with
per-stage left-context state must equal full-sequence synthesis exactly on
the interior (the first `delay` samples are priming, the stream then runs
`delay` behind the frontier)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hifigan_tpu.config import AttrDict
from hifigan_tpu.models import Generator, fold_weight_norm
from hifigan_tpu.models.streaming import make_streaming_vocoder


def _setup(resblock="2"):
    h = AttrDict(
        resblock=resblock,
        upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=16,
        resblock_kernel_sizes=[3, 5] if resblock == "1" else [3],
        resblock_dilation_sizes=[[1, 3], [1, 2]] if resblock == "1" else [[1, 2]],
        num_mels=8,
    )
    gen = Generator(h)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 192)).astype(np.float32)
    )
    params = fold_weight_norm(gen.init(jax.random.PRNGKey(0), mel)["params"])
    full = np.asarray(
        Generator(h, folded=True).apply({"params": params}, mel)
    )
    return h, params, mel, full


@pytest.mark.parametrize("resblock", ["1", "2"])
def test_streaming_state_matches_full(resblock):
    h, params, mel, full = _setup(resblock)
    hop = int(np.prod(h["upsample_rates"]))
    init_state, step, delay = make_streaming_vocoder(
        h, params, dtype=jnp.float32, use_fast=False
    )
    assert delay > 0
    step = jax.jit(step)

    chunk = 16
    state = init_state(batch=mel.shape[0])
    outs = []
    for s in range(0, mel.shape[-1], chunk):
        state, wav = step(state, mel[:, :, s : s + chunk])
        assert wav.shape == (mel.shape[0], 1, chunk * hop)
        outs.append(np.asarray(wav))
    stream = np.concatenate(outs, axis=-1)

    # emitted positions are [-delay, T*hop - delay). The first `delay`
    # samples are pre-sequence priming; the next <= `delay` differ from
    # whole-utterance synthesis (which zero-pads at EVERY layer's input at
    # t=0 — a streamer only has zero raw history); exact afterwards.
    total = full.shape[-1]
    np.testing.assert_allclose(
        stream[:, :, 2 * delay :], full[:, :, delay : total - delay],
        rtol=2e-4, atol=2e-5,
    )
    # and the head region is still CLOSE (bias-propagated vs zero padding)
    head_err = np.max(np.abs(stream[:, :, delay : 2 * delay]
                             - full[:, :, :delay]))
    assert head_err < 0.5


def test_streaming_state_smaller_windows_than_halo():
    """The stateful streamer's per-step compute windows are much smaller
    than the halo streamer's chunk+2*halo mel window (the whole point)."""
    from hifigan_tpu.parallel.halo import generator_halo_frames

    h, params, mel, full = _setup("1")
    halo = generator_halo_frames(h)
    init_state, step, delay = make_streaming_vocoder(
        h, params, dtype=jnp.float32, use_fast=False
    )
    # mel-rate state buffer is 2*3 (conv_pre) regardless of the halo, and
    # the output delay is below the halo streamer's halo*hop lookahead
    state = init_state()
    assert state[0].shape[1] == 6
    hop = int(np.prod(h["upsample_rates"]))
    assert delay <= halo * hop


def test_cli_streaming_state_glue():
    """cli.infer.synthesize(--streaming_chunk --streaming_state) returns a
    full-length waveform matching whole-utterance synthesis on the interior
    (live-stream semantics at the head/tail)."""
    from types import SimpleNamespace

    from hifigan_tpu.cli.infer import synthesize

    h, params, mel, full = _setup("2")
    hop = int(np.prod(h["upsample_rates"]))
    apply = jax.jit(
        lambda p, m: Generator(h, folded=True).apply({"params": p}, m)
    )
    a = SimpleNamespace(streaming_chunk=16, streaming_state=True)
    y = synthesize(a, h, apply, params, mel)
    assert y.shape == full.shape
    from hifigan_tpu.models.streaming import make_streaming_vocoder

    delay = make_streaming_vocoder(h, params, dtype=jnp.float32,
                                   use_fast=False)[2]
    total = full.shape[-1]
    np.testing.assert_allclose(
        np.asarray(y)[:, :, delay : total - delay],
        full[:, :, delay : total - delay], rtol=3e-3, atol=3e-3,
    )
