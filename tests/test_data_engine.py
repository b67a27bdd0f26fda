"""End-to-end tests for the multilabel data engine: synthetic corpus on disk
-> complex-parser manifest -> TextGrid labels -> segmented tensors ->
augmented batches."""

import json
import math
from pathlib import Path

import numpy as np
import pytest

from hifigan_tpu.audio.io import save_wav
from hifigan_tpu.data.augmentation import (
    freeverb,
    hilbert_fir,
    mu_law_roundtrip,
    sox_one_pole_highpass,
    sox_one_pole_lowpass,
)
from hifigan_tpu.data.textgrid import parse_textgrid_file

SR = 16000


def _textgrid(path: Path, duration: float, words, phones):
    def tier(name, rows):
        out = [
            f'    item [{name[0]}]:',
            '        class = "IntervalTier"',
            f'        name = "{name[1]}"',
            "        xmin = 0",
            f"        xmax = {duration}",
            f"        intervals: size = {len(rows)}",
        ]
        for i, (lo, hi, text) in enumerate(rows):
            out += [
                f"        intervals [{i + 1}]:",
                f"            xmin = {lo}",
                f"            xmax = {hi}",
                f'            text = "{text}"',
            ]
        return out

    lines = [
        'File type = "ooTextFile"',
        'Object class = "TextGrid"',
        "",
        "xmin = 0",
        f"xmax = {duration}",
        "tiers? <exists>",
        "size = 2",
        "item []:",
        *tier((1, "words"), words),
        *tier((2, "phones"), phones),
    ]
    path.write_text("\n".join(lines))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    data = root / "data" / "mini"
    aug = root / "aug"
    cache = root / "cache"
    (data / "wavs").mkdir(parents=True)
    (data / "tg").mkdir(parents=True)
    (data / "data_configs" / "train").mkdir(parents=True)

    dur = 2.0
    t = np.arange(int(SR * dur)) / SR
    rng = np.random.default_rng(0)
    for name, spk, sex in [("spk1_a", "spk1", "m"), ("spk2_b", "spk2", "f"),
                           ("spk1_c", "spk1", "m"), ("spk2_d", "spk2", "f")]:
        wav = 0.3 * np.sin(2 * np.pi * (200 + 50 * rng.random()) * t).astype(np.float32)
        save_wav(str(data / "wavs" / f"{name}_{sex}.wav"), wav, SR)
        _textgrid(
            data / "tg" / f"{name}_{sex}.TextGrid",
            dur,
            words=[(0, 0.4, ""), (0.4, 1.5, "hello"), (1.5, 2.0, "")],
            phones=[(0, 0.4, "sil"), (0.4, 0.9, "HH"), (0.9, 1.5, "EH"), (1.5, 2.0, "sil")],
        )

    config = {
        "name": "mini",
        "result": "wavs",
        "config": [
            {
                "group-name": "wavs",
                "sources": [{"type": "glob", "glob": "**/wavs/*.wav", "label": "path"}],
                "group-labels": {"mic-brand": "blueyeti"},
                "enrichments": [
                    {"type": "regex",
                     "patterns": {"path": r"(?P<name>(?P<speaker>spk\d)_\w+_(?P<sex>[mf]))\.wav$"}},
                    {"type": "files",
                     "labels": {"wav": "**/wavs/{name}.wav", "textgrid": "**/tg/{name}.TextGrid"}},
                    {"type": "select",
                     "labels": ["wav", "textgrid", "speaker", "sex", "mic-brand"]},
                ],
            }
        ],
    }
    (data / "data_configs" / "train" / "mini.json").write_text(json.dumps(config))

    # augmentation assets
    noise_dir = aug / "libriadapt" / "noise" / "blueyeti" / "rain"
    noise_dir.mkdir(parents=True)
    save_wav(str(noise_dir / "rain1.wav"),
             (0.1 * rng.standard_normal(SR)).astype(np.float32), SR)
    rir_dir = aug / "RIRS_NOISES" / "simulated_rirs" / "smallroom"
    rir_dir.mkdir(parents=True)
    rir = np.zeros(800, np.float32)
    rir[0] = 1.0
    rir[200] = 0.4
    save_wav(str(rir_dir / "rir1.wav"), rir, SR)

    return {"data": str(root / "data"), "aug": str(aug), "cache": str(cache)}


AUG_CONFIG = {
    "options": {
        "noise": ["rain"],
        "rir": ["smallroom"],
        "reverb": ["yes"],
        "lowpass": ["400"],
        "highpass": ["1000"],
        "codec": ["wav", "gsm", "mp3", "vorbis"],
        "hilbert": ["yes"],
    },
    "probs": {
        "prob": 1.0,
        "sub_probs": {k: {"prob": 1.0} for k in
                      ["noise", "rir", "lowpass", "highpass", "reverb", "codec", "hilbert"]},
    },
}


def make_dataset(corpus, **over):
    from hifigan_tpu.data.multilabel import MultilabelWaveDataset

    kwargs = dict(
        data_dir=corpus["data"],
        aug_dir=corpus["aug"],
        cache_dir=corpus["cache"],
        name="train",
        source="train",
        segment_length=2400,
        sampling_rate=SR,
        embedding_size=240,
        augmentation_config=AUG_CONFIG,
        num_workers=1,
    )
    kwargs.update(over)
    return MultilabelWaveDataset(**kwargs)


def test_textgrid_parser(corpus):
    tg_files = list(Path(corpus["data"]).glob("**/*.TextGrid"))
    tiers = parse_textgrid_file(tg_files[0])
    assert set(tiers.keys()) == {"words", "phones"}
    assert list(tiers["words"].columns) == ["start", "end", "text"]
    assert tiers["words"]["text"].tolist() == ["", "hello", ""]
    assert tiers["phones"].shape[0] == 4


def test_dataset_build_and_item(corpus):
    ds = make_dataset(corpus)
    assert len(ds) == 4
    # label options include 'none' first everywhere
    for label, options in ds.label_options.items():
        assert options[0] == "none", label
    # label weights structured by group
    assert set(ds.label_weights_groups.keys()) == {"content", "style"}
    assert "speaker" in ds.label_weights_groups["content"]
    assert "noise" in ds.label_weights_groups["style"]

    wav, path, time_labels, grouped = ds[0]
    assert wav.shape == (2400,)
    assert wav.dtype == np.float32
    assert set(time_labels.keys()) == {"content", "style"}
    assert set(time_labels["content"].keys()) == {"speaker", "sex", "phones", "sad"}
    # augmentation labels merged into style group
    for aug in ["noise", "rir", "lowpass", "highpass", "reverb", "codec", "hilbert"]:
        assert aug in time_labels["style"], aug
    t_emb = 2400 // 240
    for g in time_labels.values():
        for label, arr in g.items():
            assert arr.shape == (t_emb,), label
            assert arr.dtype == np.int64
    # grouped (per-utterance) labels carry augmentation values too
    assert grouped["style"]["mic-brand"] == "blueyeti"
    assert "codec" in grouped["style"]


def test_dataset_batches(corpus):
    ds = make_dataset(corpus)
    batch = next(ds.batches(2, seed=0))
    assert batch["audio"].shape == (2, 2400)
    assert batch["time_labels"]["content"]["phones"].shape == (2, 10)
    assert len(batch["paths"]) == 2


def test_dataset_disable_wavs_and_deterministic(corpus):
    ds = make_dataset(corpus, disable_wavs=True, deterministic=True)
    wav, _, tl1, _ = ds[1]
    assert np.abs(wav).sum() == 0.0
    _, _, tl2, _ = ds[1]
    for g in tl1:
        for l in tl1[g]:
            np.testing.assert_array_equal(tl1[g][l], tl2[g][l])


def test_golden_ratio_subsample(corpus):
    ds = make_dataset(corpus, size=2, deterministic=True)
    assert len(ds) == 2
    _ = ds[0]
    _ = ds[1]


def test_native_dsp_augmentations():
    rng = np.random.default_rng(3)
    wav = (0.3 * rng.standard_normal(SR)).astype(np.float32)
    lp = sox_one_pole_lowpass(wav, 400.0, SR)
    hp = sox_one_pole_highpass(wav, 1000.0, SR)

    def band_energy(x, lo, hi):
        spec = np.abs(np.fft.rfft(x)) ** 2
        freqs = np.fft.rfftfreq(len(x), 1 / SR)
        return spec[(freqs >= lo) & (freqs < hi)].sum()

    # lowpass attenuates highs, highpass attenuates lows
    assert band_energy(lp, 4000, 8000) < 0.2 * band_energy(wav, 4000, 8000)
    assert band_energy(hp, 0, 200) < 0.5 * band_energy(wav, 0, 200)

    rt = mu_law_roundtrip(wav)
    # 8-bit mu-law quantisation error bound: ~0.022|x| at full scale
    assert np.abs(rt - np.clip(wav, -1, 1)).max() < 0.03

    rv = freeverb(wav, SR)
    assert rv.shape == wav.shape and np.isfinite(rv).all()

    hb = hilbert_fir(wav)
    assert hb.shape == wav.shape
    # Hilbert preserves magnitude spectrum away from DC/Nyquist
    assert abs(band_energy(hb, 1000, 4000) / band_energy(wav, 1000, 4000) - 1) < 0.1


def test_sniffer_cli_end_to_end(corpus, tmp_path):
    """label_bias_sniffer main() equivalent: 3 disable_wavs datasets, per-key
    trainer, checkpoints + decreasing loss (ref label_bias_sniffer.py:91-222)."""
    from hifigan_tpu.cli.train_sniffers import build_sniffer_datasets, train_sniffers

    # give the corpus a test split (same wavs; the reference assembles a third
    # dataset from **/data_configs/test/*.json)
    train_cfg = Path(corpus["data"]) / "mini" / "data_configs" / "train" / "mini.json"
    test_cfg_dir = Path(corpus["data"]) / "mini" / "data_configs" / "test"
    test_cfg_dir.mkdir(parents=True, exist_ok=True)
    (test_cfg_dir / "mini.json").write_text(train_cfg.read_text())

    flat = {
        "segment_length": 2400,
        "sampling_rate": SR,
        "augmentation": AUG_CONFIG,
    }
    datasets = build_sniffer_datasets(flat, corpus["data"].rsplit("/", 1)[0], 240)
    # dirs: build_sniffer_datasets expects <datasets_dir>/{data,aug,cache}
    for name, ds in datasets.items():
        assert ds.disable_wavs, name
    assert datasets["validation"].deterministic and datasets["test"].deterministic

    states = train_sniffers(
        {}, datasets, str(tmp_path / "logs"), max_steps=8, batch_size=2
    )
    assert set(states) == {"content", "style"}
    for key, state in states.items():
        assert int(state.step) == 8
        ckpt_dir = tmp_path / "logs" / "sniffers" / key / "default" / "version_1" / "checkpoints"
        assert (ckpt_dir / "latest").exists() or any(ckpt_dir.iterdir())

    # decreasing loss: retrain one key step-by-step and compare first/last
    from hifigan_tpu.distill.sniffer import (
        LabelBiasSnifferTrainer,
        generate_sniffers_by_example,
    )
    import jax

    from hifigan_tpu.cli.train_sniffers import DEFAULT_SNIFFER_LAYERS
    from hifigan_tpu.dsl.parsing import parse_layers

    sniffers = generate_sniffers_by_example(
        datasets["train"].label_options_groups,
        layers=parse_layers(list(DEFAULT_SNIFFER_LAYERS)),
    )
    trainer = LabelBiasSnifferTrainer(sniffers["content"], "content")
    batch = next(datasets["train"].batches(2))
    state = trainer.create_state(jax.random.PRNGKey(0), batch["time_labels"]["content"])
    step = trainer.make_train_step()
    series = []
    for _ in range(30):
        state, m = step(state, {"time_labels": batch["time_labels"]})
        series.append(float(m["loss"]))
    assert series[-1] < series[0], series


def test_batches_per_host_sharding_disjoint(corpus):
    """Mocked multi-host input sharding: batches(process_index=i,
    process_count=N) must cover the dataset disjointly with identical
    cross-host shuffles (the DistributedSampler equivalent, reference
    label_bias_sniffer.py:140)."""
    ds = make_dataset(corpus, disable_wavs=True)
    n_hosts = 2
    seen = []
    for host in range(n_hosts):
        paths = []
        for b in ds.batches(1, shuffle=True, seed=77, drop_last=False,
                            process_index=host, process_count=n_hosts):
            paths.extend(b["paths"])
        seen.append(paths)
    all_paths = [p for host_paths in seen for p in host_paths]
    assert len(all_paths) == len(ds)
    assert len(set(all_paths)) == len(all_paths)  # disjoint
    # same seed -> deterministic assignment
    again = []
    for b in ds.batches(1, shuffle=True, seed=77, drop_last=False,
                        process_index=0, process_count=n_hosts):
        again.extend(b["paths"])
    assert again == seen[0]


def test_warm_label_caches_parallel(corpus):
    """Pool fan-out label-cache warm (reference test.py:57-61 Pool(16))."""
    import shutil
    from pathlib import Path

    from hifigan_tpu.cli.warm_cache import warm_label_caches

    ds = make_dataset(corpus, disable_wavs=True)
    cache = Path(corpus["cache"]) / "train" / "frame_labels"
    shutil.rmtree(cache, ignore_errors=True)
    cache.mkdir(parents=True)
    warm_label_caches(ds, workers=2)
    assert len(list(cache.glob("*.pickle"))) == len(ds)


def test_real_codec_roundtrips():
    """Real MP3 (lame->mpg123) and Vorbis (vorbisenc/ogg->synthesis) round
    trips via the system codec libraries (data/codecs.py): length-preserving,
    time-aligned (no residual codec delay), tonal content survives (SNR well
    above the quantisation floor), and real lossy artifacts are present
    (the round trip is NOT the identity). Skips only if the libs are absent
    (the CodecAugmentor then uses the documented MDCT stand-in)."""
    import pytest

    from hifigan_tpu.data import codecs

    sr = 22050
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.2 * np.sin(2 * np.pi * 1320 * t)).astype(np.float32)
    for name, avail, fn in (
        ("mp3", codecs.mp3_available, codecs.mp3_roundtrip),
        ("vorbis", codecs.vorbis_available, codecs.vorbis_roundtrip),
    ):
        if not avail():
            pytest.skip(f"{name} libraries not present")
        y = fn(tone, sr)
        assert y.shape == tone.shape and y.dtype == np.float32
        assert np.all(np.isfinite(y))
        err = np.sqrt(np.mean((tone - y) ** 2))
        sig = np.sqrt(np.mean(tone ** 2))
        snr = 20 * np.log10(sig / max(err, 1e-9))
        assert snr > 12.0, f"{name} snr {snr:.1f} dB — misaligned or broken"
        assert err > 1e-4, f"{name} round trip is suspiciously lossless"
        # alignment: cross-correlation peak at zero lag
        xc = np.correlate(y[:6000], tone[:6000], "full")
        lag = int(np.argmax(xc)) - 5999
        assert abs(lag) <= 55, f"{name} residual codec delay {lag} samples"


def test_codec_augmentor_uses_real_codecs():
    """CodecAugmentor 'mp3'/'vorbis' route through the real codec bindings
    when available, preserving the augment() label protocol."""
    from hifigan_tpu.data.augmentation import CodecAugmentor
    from hifigan_tpu.data import codecs

    sr = 16000
    aug = CodecAugmentor(sr)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(sr) * 0.2).astype(np.float32)
    for fmt in ("mp3", "vorbis", "wav", "gsm"):
        labels, out, val = aug.augment(
            np.random.default_rng(0), {}, {}, wav.copy(), fmt
        )
        assert val == fmt and out.shape == wav.shape
        assert np.all(np.isfinite(out))
        assert not np.allclose(out, wav)  # the codec really transformed it
