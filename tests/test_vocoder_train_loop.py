"""End-to-end vocoder training-loop test: synthetic LJSpeech-style corpus ->
train() host loop (checkpointing, validation, resume) -> inference CLI on
the produced checkpoint. This exercises the reconstructed train.py surface
(reference README.md:33-39) top to bottom."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

import jax

from hifigan_tpu.audio.io import save_wav
from hifigan_tpu.config import AttrDict

SR = 8000


def tiny_train_config():
    return AttrDict(
        resblock="2",
        upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=16,
        resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 2]],
        segment_size=512,
        num_mels=8,
        n_fft=64,
        hop_size=16,
        win_size=64,
        sampling_rate=SR,
        fmin=0,
        fmax=4000,
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


@pytest.fixture(scope="module")
def lj_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("lj")
    wavs = root / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(4):
        name = f"LJ001-{i:04d}"
        t = np.arange(SR) / SR
        wav = (0.3 * np.sin(2 * np.pi * (150 + 30 * i) * t)).astype(np.float32)
        save_wav(str(wavs / f"{name}.wav"), wav, SR)
        names.append(name)
    (root / "training.txt").write_text("\n".join(f"{n}|text" for n in names[:3]))
    (root / "validation.txt").write_text(f"{names[3]}|text")
    return root


def test_train_loop_checkpoint_resume_infer(lj_corpus, tmp_path, capsys):
    from hifigan_tpu.train.vocoder import train
    from hifigan_tpu.train.checkpoint import load_checkpoint, scan_checkpoint

    h = tiny_train_config()
    ckpt_dir = tmp_path / "cp"

    a = AttrDict(
        input_wavs_dir=str(lj_corpus / "wavs"),
        input_training_file=str(lj_corpus / "training.txt"),
        input_validation_file=str(lj_corpus / "validation.txt"),
        checkpoint_path=str(ckpt_dir),
        training_epochs=2,
        stdout_interval=1,
        checkpoint_interval=1,
        summary_interval=100,
        validation_interval=2,
        fine_tuning=False,
    )
    state = train(a, h)
    steps = int(state.step)
    assert steps == 2  # 3 train files, batch 2, drop_last -> 1 step/epoch

    g_path = scan_checkpoint(str(ckpt_dir), "g_")
    do_path = scan_checkpoint(str(ckpt_dir), "do_")
    assert g_path is not None and do_path is not None
    ck = load_checkpoint(do_path)
    assert int(ck["steps"]) == steps
    # optimizer moments persist in do_ (upstream saves optim_g/optim_d)
    assert "opt_g" in ck and "opt_d" in ck
    assert int(ck["opt_g"]["count"]) == steps

    # resume: one more epoch continues from the checkpoint, including Adam state
    a2 = AttrDict({**a, "training_epochs": 3})
    state2 = train(a2, h)
    assert int(state2.step) > 0
    assert int(state2.opt_g.count) == int(state2.step)
    out = capsys.readouterr().out
    assert "Restored checkpoint" in out
    assert "Validation" in out

    # inference CLI on the produced checkpoint
    import json as _json

    from hifigan_tpu.cli.infer import inference

    with open(ckpt_dir / "config.json", "w") as f:
        _json.dump(dict(h), f)
    ia = AttrDict(
        input_wavs_dir=str(lj_corpus / "wavs"),
        output_dir=str(tmp_path / "gen"),
        checkpoint_file=g_path,
    )
    inference(ia, h)
    outs = list((tmp_path / "gen").glob("*_generated.wav"))
    assert len(outs) == 4


def test_train_loop_fine_tuning_path(lj_corpus, tmp_path):
    """Teacher-forced .npy mel fine-tuning (reference meldataset.py:155-172)."""
    from hifigan_tpu.data.meldataset import mel_spectrogram_np
    from hifigan_tpu.train.vocoder import train

    h = tiny_train_config()
    mels_dir = tmp_path / "ft_mels"
    mels_dir.mkdir()
    for wav_path in (lj_corpus / "wavs").glob("*.wav"):
        from hifigan_tpu.audio.io import load_wav

        wav, _ = load_wav(str(wav_path))
        mel = mel_spectrogram_np(
            wav[0], h.n_fft, h.num_mels, h.sampling_rate, h.hop_size, h.win_size, h.fmin, h.fmax
        )
        np.save(mels_dir / f"{wav_path.stem}.npy", mel)

    a = AttrDict(
        input_wavs_dir=str(lj_corpus / "wavs"),
        input_training_file=str(lj_corpus / "training.txt"),
        input_validation_file=str(lj_corpus / "validation.txt"),
        input_mels_dir=str(mels_dir),
        checkpoint_path=str(tmp_path / "cp_ft"),
        training_epochs=1,
        stdout_interval=1,
        checkpoint_interval=100,
        summary_interval=100,
        validation_interval=100,
        fine_tuning=True,
    )
    state = train(a, h)
    assert int(state.step) == 1


def test_infer_e2e_cli(lj_corpus, tmp_path):
    """npy-mel -> wav end-to-end CLI (reference inference_e2e.py surface)."""
    import json as _json

    from hifigan_tpu.cli.infer_e2e import inference_e2e
    from hifigan_tpu.data.meldataset import mel_spectrogram_np
    from hifigan_tpu.audio.io import load_wav
    from hifigan_tpu.models import Generator
    from hifigan_tpu.train.checkpoint import save_checkpoint

    h = tiny_train_config()
    mels_dir = tmp_path / "mels"
    mels_dir.mkdir()
    wav_path = next((lj_corpus / "wavs").glob("*.wav"))
    wav, _ = load_wav(str(wav_path))
    mel = mel_spectrogram_np(
        wav[0], h.n_fft, h.num_mels, h.sampling_rate, h.hop_size, h.win_size, h.fmin, h.fmax
    )
    np.save(mels_dir / "utt1.npy", mel.astype(np.float32))

    ckpt_dir = tmp_path / "cp"
    ckpt_dir.mkdir()
    gen = Generator(h)
    params = gen.init(jax.random.PRNGKey(0), np.zeros((1, h.num_mels, 8), np.float32))["params"]
    save_checkpoint(str(ckpt_dir / "g_00000100"), {"generator": params})
    with open(ckpt_dir / "config.json", "w") as f:
        _json.dump(dict(h), f)

    a = AttrDict(
        input_mels_dir=str(mels_dir),
        output_dir=str(tmp_path / "out"),
        checkpoint_file=str(ckpt_dir / "g_00000100"),
    )
    inference_e2e(a, h)
    outs = list((tmp_path / "out").glob("*_generated_e2e.wav"))
    assert len(outs) == 1
    from scipy.io import wavfile

    sr, data = wavfile.read(outs[0])
    assert sr == h.sampling_rate and data.shape[0] == mel.shape[1] * h.hop_size


def test_infer_e2e_cli_streaming_matches_full(lj_corpus, tmp_path):
    """--streaming_chunk N vocodes in fixed overlap windows and must match
    whole-utterance synthesis (the halo covers the receptive field)."""
    import json as _json

    from hifigan_tpu.cli.infer_e2e import inference_e2e
    from hifigan_tpu.data.meldataset import mel_spectrogram_np
    from hifigan_tpu.audio.io import load_wav
    from hifigan_tpu.models import Generator
    from hifigan_tpu.train.checkpoint import save_checkpoint

    h = tiny_train_config()
    mels_dir = tmp_path / "mels"
    mels_dir.mkdir()
    wav_path = next((lj_corpus / "wavs").glob("*.wav"))
    wav, _ = load_wav(str(wav_path))
    mel = mel_spectrogram_np(
        wav[0], h.n_fft, h.num_mels, h.sampling_rate, h.hop_size, h.win_size, h.fmin, h.fmax
    )
    np.save(mels_dir / "utt1.npy", mel.astype(np.float32))

    ckpt_dir = tmp_path / "cp"
    ckpt_dir.mkdir()
    gen = Generator(h)
    params = gen.init(jax.random.PRNGKey(0), np.zeros((1, h.num_mels, 8), np.float32))["params"]
    save_checkpoint(str(ckpt_dir / "g_00000100"), {"generator": params})
    with open(ckpt_dir / "config.json", "w") as f:
        _json.dump(dict(h), f)

    base = AttrDict(
        input_mels_dir=str(mels_dir),
        output_dir=str(tmp_path / "out_full"),
        checkpoint_file=str(ckpt_dir / "g_00000100"),
    )
    inference_e2e(base, h)
    stream = AttrDict({**base, "output_dir": str(tmp_path / "out_stream"), "streaming_chunk": 4})
    inference_e2e(stream, h)

    from scipy.io import wavfile

    _, full = wavfile.read(next((tmp_path / "out_full").glob("*.wav")))
    _, chunked = wavfile.read(next((tmp_path / "out_stream").glob("*.wav")))
    assert full.shape == chunked.shape
    # int16 quantised output: allow 1 LSB of float re-association noise
    assert np.max(np.abs(full.astype(np.int32) - chunked.astype(np.int32))) <= 1
