"""Simple waveform dataset (parity with reference
speech_distillation/datasets.py WaveDataset — wav+filename items with an
in-memory cache and deterministic cropping)."""

from __future__ import annotations

import random
from pathlib import Path

import numpy as np

from hifigan_tpu.audio.io import load_wav


class WaveDataset:
    def __init__(self, data_dir, segment_length, sampling_rate, file_pattern="**/*.wav",
                 deterministic=False, n_cache_reuse=1):
        self.audio_files = sorted(Path(data_dir).glob(file_pattern))
        self.segment_length = segment_length
        self.sampling_rate = sampling_rate
        self.deterministic = deterministic
        self.n_cache_reuse = n_cache_reuse
        self._cached: np.ndarray | None = None
        self._cache_ref_count = 0

    def __len__(self) -> int:
        return len(self.audio_files)

    def __getitem__(self, index: int):
        filename = str(self.audio_files[index])
        if self._cache_ref_count == 0:
            audio, sr = load_wav(filename)
            if sr != self.sampling_rate:
                raise ValueError(f"{sr} SR doesn't match target {self.sampling_rate} SR")
            self._cached = audio[0]
            self._cache_ref_count = self.n_cache_reuse
        else:
            self._cache_ref_count -= 1
        audio = self._cached

        rng = random.Random(index if self.deterministic else None)
        if audio.shape[0] >= self.segment_length:
            start = rng.randint(0, audio.shape[0] - self.segment_length)
            audio = audio[start : start + self.segment_length]
        else:
            audio = np.pad(audio, (0, self.segment_length - audio.shape[0]))
        return audio.astype(np.float32), filename
