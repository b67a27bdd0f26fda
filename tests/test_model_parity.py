"""Waveform/logit parity vs the reference PyTorch models.

The reference's own torch modules (imported at test time from
/root/reference/src — never copied) are the oracle: we randomly initialise
them, convert their state_dicts with hifigan_tpu.train.checkpoint, and assert
output closeness. This validates the whole path used for the pretrained
model matrix (LJ_V1/V2/V3 etc., reference README.md:49-60).
"""

import numpy as np
import pytest

from tests.conftest import requires_reference

import jax
import jax.numpy as jnp

from hifigan_tpu.config import get_config
from hifigan_tpu.models import (
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    fold_weight_norm,
)
from hifigan_tpu.train.checkpoint import (
    convert_torch_generator,
    convert_torch_discriminators,
)


def _ref_generator(reference_src, version):
    import torch
    from env import AttrDict  # reference src/env.py
    import models as ref_models  # reference src/models.py

    torch.manual_seed(1234)
    h = AttrDict(dict(get_config(version)))
    gen = ref_models.Generator(h)
    gen.eval()
    return gen, h


@requires_reference
@pytest.mark.parametrize("version", ["v1", "v2", "v3"])
def test_generator_parity(reference_src, version, rng):
    import torch

    gen, h = _ref_generator(reference_src, version)
    mel = rng.standard_normal((1, 80, 16)).astype(np.float32) * 2.0 - 5.0

    with torch.no_grad():
        ref_wav = gen(torch.from_numpy(mel)).numpy()

    variables = convert_torch_generator(gen.state_dict())
    ours = Generator(get_config(version))
    got = np.asarray(ours.apply(variables, jnp.asarray(mel)))

    assert got.shape == ref_wav.shape
    np.testing.assert_allclose(got, ref_wav, atol=2e-4, rtol=1e-4)


@requires_reference
@pytest.mark.parametrize("version", ["v1", "v3"])
def test_generator_folded_parity(reference_src, version, rng):
    """fold_weight_norm == reference remove_weight_norm (src/models.py:118)."""
    import torch

    gen, h = _ref_generator(reference_src, version)
    mel = rng.standard_normal((1, 80, 16)).astype(np.float32) * 2.0 - 5.0

    variables = convert_torch_generator(gen.state_dict())
    folded = {"params": fold_weight_norm(variables["params"])}

    gen.remove_weight_norm()
    with torch.no_grad():
        ref_wav = gen(torch.from_numpy(mel)).numpy()

    ours = Generator(get_config(version), folded=True)
    got = np.asarray(ours.apply(folded, jnp.asarray(mel)))
    np.testing.assert_allclose(got, ref_wav, atol=2e-4, rtol=1e-4)


@requires_reference
def test_mpd_parity(reference_src, rng):
    import torch
    import models as ref_models

    torch.manual_seed(7)
    mpd = ref_models.MultiPeriodDiscriminator()
    mpd.eval()

    y = rng.standard_normal((2, 1, 4096)).astype(np.float32) * 0.3
    y_hat = rng.standard_normal((2, 1, 4096)).astype(np.float32) * 0.3
    with torch.no_grad():
        r_ref, g_ref, fr_ref, fg_ref = mpd(torch.from_numpy(y), torch.from_numpy(y_hat))

    variables = convert_torch_discriminators({"mpd": {
        k: v.numpy() for k, v in mpd.state_dict().items()
    }})["mpd"]
    ours = MultiPeriodDiscriminator()
    r, g, fr, fg = ours.apply(variables, jnp.asarray(y[:, 0]), jnp.asarray(y_hat[:, 0]))

    for a, b in zip(r, r_ref):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-4, rtol=1e-3)
    # Feature maps: ours are channels-last; compare via transpose.
    for fmaps_ours, fmaps_ref in zip(fr, fr_ref):
        for a, b in zip(fmaps_ours, fmaps_ref):
            np.testing.assert_allclose(
                np.asarray(a).transpose(0, 3, 1, 2), b.numpy(), atol=2e-4, rtol=1e-3
            )


@requires_reference
def test_msd_parity(reference_src, rng):
    """MSD includes the spectral-normed scale 0; we copy torch's u buffer and
    compare in train mode (one power iteration on both sides)."""
    import torch
    import models as ref_models

    torch.manual_seed(11)
    msd = ref_models.MultiScaleDiscriminator()

    y = rng.standard_normal((1, 1, 2048)).astype(np.float32) * 0.3
    y_hat = rng.standard_normal((1, 1, 2048)).astype(np.float32) * 0.3

    sd = {k: v.detach().numpy().copy() for k, v in msd.state_dict().items()}
    msd.train()
    with torch.no_grad():
        r_ref, g_ref, _, _ = msd(torch.from_numpy(y), torch.from_numpy(y_hat))

    variables = convert_torch_discriminators({"msd": sd})["msd"]
    ours = MultiScaleDiscriminator()
    (r, g, _, _), _ = ours.apply(
        variables, jnp.asarray(y[:, 0]), jnp.asarray(y_hat[:, 0]), True, mutable=["spectral"]
    )
    # torch runs the power iteration twice (once per input) while we share one
    # update per call; scale 0 logits therefore agree loosely and scales 1-2
    # (weight norm only) agree tightly.
    for i, (a, b) in enumerate(zip(r, r_ref)):
        tol = 5e-2 if i == 0 else 2e-4
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=tol, rtol=1e-2)


@requires_reference
def test_reference_losses_parity(reference_src, rng):
    import torch
    import models as ref_models

    from hifigan_tpu.models.losses import (
        discriminator_loss,
        feature_loss,
        generator_loss,
    )

    dr = [rng.standard_normal((2, 10)).astype(np.float32) for _ in range(3)]
    dg = [rng.standard_normal((2, 10)).astype(np.float32) for _ in range(3)]
    fr = [[rng.standard_normal((2, 4, 8)).astype(np.float32) for _ in range(2)] for _ in range(3)]
    fg = [[rng.standard_normal((2, 4, 8)).astype(np.float32) for _ in range(2)] for _ in range(3)]

    t = torch.from_numpy
    ref_d, _, _ = ref_models.discriminator_loss([t(x) for x in dr], [t(x) for x in dg])
    ref_g, _ = ref_models.generator_loss([t(x) for x in dg])
    ref_f = ref_models.feature_loss(
        [[t(x) for x in row] for row in fr], [[t(x) for x in row] for row in fg]
    )

    got_d, _, _ = discriminator_loss([jnp.asarray(x) for x in dr], [jnp.asarray(x) for x in dg])
    got_g, _ = generator_loss([jnp.asarray(x) for x in dg])
    got_f = feature_loss(
        [[jnp.asarray(x) for x in row] for row in fr], [[jnp.asarray(x) for x in row] for row in fg]
    )

    np.testing.assert_allclose(float(got_d), float(ref_d), rtol=1e-5)
    np.testing.assert_allclose(float(got_g), float(ref_g), rtol=1e-5)
    np.testing.assert_allclose(float(got_f), float(ref_f), rtol=1e-5)


@requires_reference
@pytest.mark.parametrize("version", ["v1", "v3"])
def test_generator_blocked_tail_parity(reference_src, version, rng):
    """narrow_channel_block (time-blocked tail convs) stays torch-exact."""
    import torch

    gen, h = _ref_generator(reference_src, version)
    mel = rng.standard_normal((1, 80, 16)).astype(np.float32) * 2.0 - 5.0
    with torch.no_grad():
        ref_wav = gen(torch.from_numpy(mel)).numpy()

    variables = convert_torch_generator(gen.state_dict())
    ours = Generator(get_config(version), narrow_channel_block=4)
    got = np.asarray(ours.apply(variables, jnp.asarray(mel)))
    np.testing.assert_allclose(got, ref_wav, atol=2e-4, rtol=1e-4)
