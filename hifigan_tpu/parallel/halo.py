"""Time-axis (sequence) parallelism for convolutional synthesis.

The reference has no long-context story beyond segment cropping (SURVEY §5);
the TPU-native answer is context parallelism for convs: shard the time axis
over the mesh and exchange receptive-field halos between neighbours over
ICI (`jax.lax.ppermute` inside `shard_map`), so an arbitrarily long mel can
be vocoded with per-chip memory ~T/n.

`halo_exchange` pads each local time-shard with its neighbours' edges; the
generator then runs on the padded shard and the overlap is cropped after
upsampling. Because every conv in the generator family is 'same'-padded,
running the full model on a shard padded by the total receptive-field halo
and cropping halo*prod(upsample_rates) output samples is exactly equivalent
to the unsharded computation (validated in tests against the single-device
result).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def generator_halo_frames(h, margin: int = 4) -> int:
    """Receptive-field halo of the generator in *mel frames*.

    conv_pre k7 contributes 3; each stage's resblocks contribute
    (k-1)/2 * max_dilation... summed in input-frame units by dividing by the
    cumulative upsample factor; conv_post k7 adds 3 output samples.
    A safe (slightly generous) static bound is used — correctness only needs
    halo >= receptive field, cropping removes the rest.
    """
    halo = 3  # conv_pre k7
    up = 1
    for i, u in enumerate(h["upsample_rates"]):
        k_up = h["upsample_kernel_sizes"][i]
        up *= u
        stage = (k_up - u) // 2  # transposed-conv overlap, in pre-stage samples
        res = 0
        for k, ds in zip(h["resblock_kernel_sizes"], h["resblock_dilation_sizes"]):
            depth = sum(ds) + len(ds)  # dilated + unit convs
            res = max(res, (k - 1) // 2 * depth)
        halo += -(-(stage + res) // up) + 1
    halo += -(-3 // up)  # conv_post
    return halo + margin  # safety margin; cropping removes any excess


def halo_exchange(x: jax.Array, halo: int, axis_name: str) -> tuple[jax.Array, jax.Array]:
    """Extend a local time-shard (B, T_loc, C) to a (B, T_loc + 2*halo, C)
    window via neighbour exchange; returns (window, local_offset).

    Interior shards centre their segment (offset = halo). Boundary shards
    slide the window *inward* (offset 0 / 2*halo) so that the window edge
    coincides with the true sequence edge — the model's layer-wise zero
    padding there is then exactly the unsharded model's, making the sharded
    result bit-equivalent everywhere (zero-padding the input instead would
    corrupt the first/last receptive field). Requires T_loc >= 2*halo.
    """
    n_static = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    t_loc = x.shape[1]
    assert t_loc >= 2 * halo, (
        f"per-device shard ({t_loc} frames) must be >= 2*halo ({2 * halo}) "
        f"for boundary-window sliding"
    )

    def shift_right(v):  # device i receives from i-1
        return jax.lax.ppermute(v, axis_name, [(i, (i + 1) % n_static) for i in range(n_static)])

    def shift_left(v):  # device i receives from i+1
        return jax.lax.ppermute(v, axis_name, [(i, (i - 1) % n_static) for i in range(n_static)])

    from_left = shift_right(x[:, -halo:, :])
    from_right = shift_left(x[:, :halo, :])
    from_left2 = shift_right(x[:, -2 * halo :, :])
    from_right2 = shift_left(x[:, : 2 * halo, :])

    window_mid = jnp.concatenate([from_left, x, from_right], axis=1)
    window_first = jnp.concatenate([x, from_right2], axis=1)
    window_last = jnp.concatenate([from_left2, x], axis=1)

    is_first = (idx == 0) & (n_static > 1)
    is_last = (idx == n_static - 1) & (n_static > 1)
    window = jnp.where(is_first, window_first, jnp.where(is_last, window_last, window_mid))
    offset = jnp.where(is_first, 0, jnp.where(is_last, 2 * halo, halo))
    if n_static == 1:
        return x, jnp.zeros((), offset.dtype)
    return window, offset


def make_sharded_generator(h, mesh: Mesh, folded: bool = True, dtype=None,
                           axis_name: str = "data"):
    """Build fn(params, mel) vocoding with the mel time axis sharded over
    ``axis_name``: each device processes its shard plus exchanged halos and
    crops the overlap after upsampling. mel: (B, num_mels, T) with T a
    multiple of the mesh axis size."""
    import jax.numpy as jnp

    from hifigan_tpu.models import Generator

    kwargs = {} if dtype is None else {"dtype": dtype}
    gen = Generator(h, folded=folded, **kwargs)
    halo = generator_halo_frames(h)
    up = 1
    for u in h["upsample_rates"]:
        up *= u

    def local_fn(params, mel_shard):
        # mel_shard: (B, num_mels, T_loc) on each device
        t_loc = mel_shard.shape[-1]
        x = jnp.swapaxes(mel_shard, -1, -2)  # (B, T_loc, mels)
        window, offset = halo_exchange(x, halo, axis_name)
        y = gen.apply({"params": params}, jnp.swapaxes(window, -1, -2))  # (B,1,T')
        y = jax.lax.dynamic_slice_in_dim(y, offset * up, t_loc * up, axis=2)
        return y

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(None, None, axis_name)),
        out_specs=P(None, None, axis_name),
    )
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# streaming chunked inference (host-side, single device)
# ---------------------------------------------------------------------------


def streaming_vocode(apply_fn, params, mel: jax.Array, chunk_frames: int,
                     halo_frames: int, hop: int):
    """Vocode an unbounded-length mel in fixed-size chunks with receptive-
    field overlap, concatenating exactly-cropped outputs (no artefacts —
    the overlap covers the receptive field, so chunks agree bit-for-bit
    with full-sequence synthesis up to float addition order).

    apply_fn(params, mel_chunk) -> (B, 1, T) waveform. mel: (B, M, T).
    Keeps XLA shapes static: all interior chunks share one shape; the last
    chunk is zero-padded then cropped.
    """
    import numpy as np

    b, m, total = mel.shape
    window = chunk_frames + 2 * halo_frames
    if total <= window:
        return np.asarray(apply_fn(params, mel))

    outs = []
    start = 0
    while start < total:
        take_frames = min(chunk_frames, total - start)
        # slide the fixed-size window inward at the sequence edges so the
        # window edge coincides with the true sequence edge (layer-wise zero
        # padding there matches full-sequence synthesis exactly)
        lo = min(max(0, start - halo_frames), total - window)
        offset = start - lo
        chunk = mel[:, :, lo : lo + window]
        wav = apply_fn(params, chunk)  # (B, 1, window*hop)
        valid = np.asarray(wav)[:, :, offset * hop : (offset + take_frames) * hop]
        outs.append(valid)
        start += chunk_frames
    return np.concatenate(outs, axis=-1)
