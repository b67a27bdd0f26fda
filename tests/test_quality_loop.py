"""Close the training-quality loop THROUGH the reference: train a few GAN
steps here, export with save_torch_generator, then run the reference's own
``src/inference.py`` code path (scan checkpoint -> torch Generator ->
remove_weight_norm -> its mel pipeline -> int16 wav files) on the exported
checkpoint, and assert the written waveforms match our own synthesis of the
same inputs (VERDICT r2 item 7; reference src/inference.py:37-61).

Environment shims (this machine has no librosa/torchaudio wheels): the
reference imports them at module scope, so the test installs minimal
FAITHFUL stand-ins — torchaudio.load(normalize=True) -> float32 [-1,1]
(scipy-backed), torchaudio.transforms.MelSpectrogram -> torch.stft + the
torchaudio-convention HTK filterbank (the same oracle test_mel.py validates
our mel against), librosa.util.normalize / librosa.filters.mel for import
resolution. One latent FORK BUG has to be patched to run at all:
inference.py was written for upstream jik876's scipy load_wav (1-D int16
floats), but the fork swapped meldataset.load_wav to torchaudio (2-D [-1,1]
floats) without touching inference.py — get_mel's reflect pad then sees a
4-D tensor and crashes, and the explicit / MAX_WAV_VALUE would normalize
twice. The test monkeypatches the inference module's load_wav binding back
to the upstream 1-D int16-scale contract (exactly what the code around it
assumes) and changes nothing else.
"""

import os
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from tests.conftest import requires_reference, requires_torch

SR = 22050


def _install_reference_dep_shims():
    import torch
    from scipy.io import wavfile

    from test_mel import _torch_melscale_fbanks

    if "torchaudio" in sys.modules:
        return

    class _MelScale:
        def __init__(self, fb):
            self.fb = fb

        def register_buffer(self, name, value):
            setattr(self, name, value)

    class MelSpectrogram:
        def __init__(self, n_fft, n_mels, sample_rate, hop_length, win_length,
                     f_min, f_max, center, power=2.0, wkwargs=None):
            self.n_fft, self.hop, self.win = n_fft, hop_length, win_length
            self.center, self.power = center, power
            f_max = f_max if f_max is not None else sample_rate / 2
            self.mel_scale = _MelScale(
                _torch_melscale_fbanks(n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate)
            )

        def __call__(self, y):
            window = torch.hann_window(self.win, periodic=True)
            spec = torch.stft(y, self.n_fft, self.hop, self.win, window=window,
                              center=self.center, onesided=True, return_complex=True)
            p = spec.abs() ** self.power
            return torch.matmul(self.mel_scale.fb.T, p)

    ta = types.ModuleType("torchaudio")
    ta_tf = types.ModuleType("torchaudio.transforms")
    ta_tf.MelSpectrogram = MelSpectrogram
    ta.transforms = ta_tf

    def _load(path, normalize=True):
        sr, data = wavfile.read(path)
        x = data.astype(np.float32)
        if normalize and data.dtype == np.int16:
            x = x / 32768.0
        return torch.from_numpy(x).unsqueeze(0), sr

    def _save(path, data, sr):
        wavfile.write(path, sr, np.asarray(data).squeeze())

    ta.load, ta.save = _load, _save

    lr = types.ModuleType("librosa")
    lr_util = types.ModuleType("librosa.util")
    lr_util.normalize = lambda x, axis=0: x / (np.abs(x).max() + 1e-12)
    lr_filters = types.ModuleType("librosa.filters")

    def _librosa_mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **_):
        from hifigan_tpu.audio.mel import mel_filterbank

        return np.asarray(
            mel_filterbank(sr, n_fft, n_mels, fmin, fmax, mel_scale="slaney", norm="slaney")
        )

    lr_filters.mel = _librosa_mel
    lr.util, lr.filters = lr_util, lr_filters

    sys.modules.update({
        "torchaudio": ta, "torchaudio.transforms": ta_tf,
        "librosa": lr, "librosa.util": lr_util, "librosa.filters": lr_filters,
    })


def _tiny_h():
    from hifigan_tpu.config import AttrDict

    return AttrDict(
        resblock="2",
        upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=32,
        resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 2], [2, 6]],
        segment_size=1024,
        num_mels=80,  # the reference Generator hardcodes 80 input channels
        n_fft=256,
        hop_size=16,
        win_size=256,
        sampling_rate=SR,
        fmin=0,
        fmax=8000,
        fmax_for_loss=None,
        learning_rate=2e-4,
        adam_b1=0.8,
        adam_b2=0.99,
        lr_decay=0.999,
        seed=1234,
        batch_size=2,
        mpd_periods=(2, 3),
        mpd_channels=(4, 8, 8, 8),
        msd_width=16,
        msd_num_scales=2,
    )


@requires_reference
@requires_torch
def test_train_export_then_reference_inference_py(reference_src, tmp_path):
    import jax
    import jax.numpy as jnp

    from hifigan_tpu.audio.mel import MelConfig, log_mel_spectrogram
    from hifigan_tpu.models import Generator
    from hifigan_tpu.train.checkpoint import save_torch_generator
    from hifigan_tpu.train.vocoder import create_train_state, make_train_step

    h = _tiny_h()

    # --- 1. train a few real GAN steps (G + MPD + MSD, in-step mels) ------
    state = create_train_state(h, jax.random.PRNGKey(0))
    step = make_train_step(h, donate=False)
    t = np.arange(h["batch_size"] * h["segment_size"], dtype=np.float32)
    audio = (0.4 * np.sin(2 * np.pi * 220.0 * t / SR)).reshape(
        h["batch_size"], h["segment_size"]
    )
    first_loss = last_loss = None
    for _ in range(6):
        state, metrics = step(state, {"audio": audio})
        last_loss = float(metrics["loss_gen_all"])
        first_loss = first_loss if first_loss is not None else last_loss
    assert np.isfinite(last_loss)
    gen_params = jax.device_get(state.params_g)

    # --- 2. export the trained generator as a reference g_* checkpoint ----
    cp_dir = tmp_path / "cp"
    cp_dir.mkdir()
    save_torch_generator(str(cp_dir / "g_00000006"), gen_params)

    # --- 3. run the REFERENCE's inference.py on it ------------------------
    _install_reference_dep_shims()
    import torch

    import inference as ref_inference
    from env import AttrDict as RefAttrDict

    wavs_dir = tmp_path / "test_files"
    out_dir = tmp_path / "generated_files"
    wavs_dir.mkdir()
    dur = np.arange(SR // 4, dtype=np.float32)
    test_wav = (0.5 * np.sin(2 * np.pi * 330.0 * dur / SR) * 32767).astype(np.int16)
    from scipy.io import wavfile

    wavfile.write(str(wavs_dir / "tone.wav"), SR, test_wav)

    ref_inference.h = RefAttrDict(dict(h))
    ref_inference.device = torch.device("cpu")
    # restore the upstream load contract inference.py was written against
    # (see module docstring): 1-D float tensor at int16 scale
    ref_inference.load_wav = lambda path: (
        torch.from_numpy(wavfile.read(path)[1].astype(np.float32)),
        wavfile.read(path)[0],
    )
    torch.manual_seed(h["seed"])
    args = types.SimpleNamespace(
        input_wavs_dir=str(wavs_dir),
        output_dir=str(out_dir),
        checkpoint_file=ref_inference.scan_checkpoint(str(cp_dir), "g_"),
    )
    assert args.checkpoint_file.endswith("g_00000006")
    ref_inference.inference(args)

    sr_out, ref_out = wavfile.read(str(out_dir / "tone_generated.wav"))
    assert sr_out == SR
    ref_out = ref_out.astype(np.float32) / 32768.0

    # --- 4. our own synthesis of the identical input must match -----------
    # (inference.py divides the int16-scale load by MAX_WAV_VALUE -> [-1,1])
    wav_as_reference_saw = test_wav.astype(np.float32) / 32768.0
    mel = log_mel_spectrogram(
        jnp.asarray(wav_as_reference_saw)[None], MelConfig.from_hparams(h)
    )
    ours = np.asarray(Generator(h).apply({"params": gen_params}, mel))[0, 0]

    assert ref_out.shape == ours.shape
    np.testing.assert_allclose(ref_out, ours, atol=2e-3)
    # waveform-level agreement, not just amplitude coincidence
    if ours.std() > 1e-6:
        corr = np.corrcoef(ref_out, ours)[0, 1]
        assert corr > 0.999, corr
