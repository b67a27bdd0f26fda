"""Checkpoint I/O: roundtrip, scan, async, torch-converter integration."""

import os

import numpy as np
import jax
import pytest

from tests.conftest import requires_reference

from hifigan_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    scan_checkpoint,
    wait_for_checkpoints,
)


def test_roundtrip_and_scan(tmp_path):
    obj = {"generator": {"conv": {"v": np.ones((3, 2)), "g": np.full((2,), 2.0)}},
           "steps": 1500}
    for step in (1000, 1500):
        save_checkpoint(os.path.join(tmp_path, f"g_{step:08d}"), obj)
    latest = scan_checkpoint(str(tmp_path), "g_")
    assert latest.endswith("g_00001500")
    restored = load_checkpoint(latest)
    np.testing.assert_array_equal(restored["generator"]["conv"]["v"], obj["generator"]["conv"]["v"])
    assert restored["steps"] == 1500
    assert scan_checkpoint(str(tmp_path), "do_") is None


def test_async_save(tmp_path):
    obj = {"x": np.arange(10.0)}
    path = os.path.join(tmp_path, "g_00000001")
    save_checkpoint(path, obj, async_=True)
    wait_for_checkpoints()
    restored = load_checkpoint(path)
    np.testing.assert_array_equal(restored["x"], obj["x"])


def test_compile_report():
    from hifigan_tpu.utils.debug import compile_report

    import jax.numpy as jnp

    rep = compile_report(lambda x: (x @ x).sum(), jnp.ones((64, 64)))
    assert rep["flops"] is None or rep["flops"] > 0


# ---------------------------------------------------------------------------
# JAX -> torch export round-trip (train here -> run in the reference)
# ---------------------------------------------------------------------------


def test_export_torch_generator_roundtrip_convert():
    """export_torch_generator is the exact inverse of convert_torch_generator."""
    import jax
    import jax.numpy as jnp

    from hifigan_tpu.config import get_config
    from hifigan_tpu.models import Generator
    from hifigan_tpu.train.checkpoint import (
        convert_torch_generator,
        export_torch_generator,
    )

    h = get_config("v3")
    gen = Generator(h)
    mel = jnp.zeros((1, 80, 8), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]

    sd = export_torch_generator(params)
    back = convert_torch_generator(sd)["params"]
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(p): l for p, l in jax.tree_util.tree_leaves_with_path(back)}
    assert len(flat_a) == len(flat_b)
    for p, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), flat_b[jax.tree_util.keystr(p)])


@requires_reference
@pytest.mark.parametrize("folded", [False, True])
def test_save_torch_generator_runs_in_reference(reference_src, tmp_path, folded, rng):
    """Full interchange: our params -> torch g_* file -> reference Generator
    forward matches ours to 2e-4 (VERDICT round-trip requirement; reference
    src/inference.py:40-48)."""
    import torch

    import models as ref_models
    from env import AttrDict as RefAttrDict

    import jax
    import jax.numpy as jnp

    from hifigan_tpu.config import get_config
    from hifigan_tpu.models import Generator, fold_weight_norm
    from hifigan_tpu.train.checkpoint import save_torch_generator

    h = get_config("v3")
    gen = Generator(h, folded=folded)
    mel = rng.standard_normal((1, 80, 16)).astype(np.float32) * 2.0 - 5.0
    params = Generator(h).init(jax.random.PRNGKey(3), jnp.asarray(mel))["params"]
    if folded:
        params = fold_weight_norm(params)
    ours = np.asarray(gen.apply({"params": params}, jnp.asarray(mel)))

    path = str(tmp_path / "g_00000001")
    save_torch_generator(path, params)

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    ref = ref_models.Generator(RefAttrDict(dict(h)))
    if folded:
        ref.remove_weight_norm()
    ref.load_state_dict(ckpt["generator"])
    ref.eval()
    with torch.no_grad():
        ref_wav = ref(torch.from_numpy(mel)).numpy()
    np.testing.assert_allclose(ours, ref_wav, atol=2e-4, rtol=1e-4)


@requires_reference
def test_save_torch_discriminators_runs_in_reference(reference_src, tmp_path, rng):
    """Full D interchange: our MPD/MSD variables -> torch do_* file ->
    reference discriminators (strict load) produce matching logits.
    Completes the round-trip matrix (G import/export + D import/export)."""
    import torch

    import models as ref_models

    import jax.numpy as jnp

    from hifigan_tpu.models import MultiPeriodDiscriminator, MultiScaleDiscriminator
    from hifigan_tpu.train.checkpoint import save_torch_discriminators

    y = rng.standard_normal((1, 4096)).astype(np.float32) * 0.3
    y_hat = rng.standard_normal((1, 4096)).astype(np.float32) * 0.3

    mpd = MultiPeriodDiscriminator()
    msd = MultiScaleDiscriminator()
    vmpd = mpd.init(jax.random.PRNGKey(0), jnp.asarray(y), jnp.asarray(y_hat))
    vmsd = msd.init(jax.random.PRNGKey(1), jnp.asarray(y), jnp.asarray(y_hat))

    (rf, _, _, _), _ = mpd.apply(
        {"params": vmpd["params"]}, jnp.asarray(y), jnp.asarray(y_hat), True,
        mutable=["spectral"],
    )
    (rs, _, _, _), _ = msd.apply(
        {"params": vmsd["params"], "spectral": vmsd["spectral"]},
        jnp.asarray(y), jnp.asarray(y_hat), True, mutable=["spectral"],
    )

    path = str(tmp_path / "do_00000001")
    save_torch_discriminators(
        path,
        {"params": vmpd["params"]},
        {"params": vmsd["params"], "spectral": vmsd["spectral"]},
        steps=7,
        epoch=1,
    )

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    assert ckpt["steps"] == 7 and ckpt["epoch"] == 1
    ref_mpd = ref_models.MultiPeriodDiscriminator()
    ref_mpd.load_state_dict(ckpt["mpd"], strict=True)
    ref_msd = ref_models.MultiScaleDiscriminator()
    ref_msd.load_state_dict(ckpt["msd"], strict=True)
    ty, tyh = torch.from_numpy(y[:, None]), torch.from_numpy(y_hat[:, None])
    ref_mpd.train()
    ref_msd.train()
    with torch.no_grad():
        rf_ref, _, _, _ = ref_mpd(ty, tyh)
        rs_ref, _, _, _ = ref_msd(ty, tyh)

    for a, b in zip(rf, rf_ref):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-4, rtol=1e-3)
    # MSD scale 0 is spectral-normed: torch runs its power iteration twice
    # (once per input) vs our once per call -> loose tolerance, like
    # test_msd_parity; scales 1-2 (weight norm) agree tightly.
    for i, (a, b) in enumerate(zip(rs, rs_ref)):
        tol = 5e-2 if i == 0 else 2e-4
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=tol, rtol=1e-2)
