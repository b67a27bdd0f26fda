from hifigan_tpu.audio.mel import (  # noqa: F401
    MAX_WAV_VALUE,
    MelConfig,
    dynamic_range_compression,
    dynamic_range_decompression,
    mel_filterbank,
    mel_spectrogram,
    log_mel_spectrogram,
)
from hifigan_tpu.audio.stft import stft_magnitude, frame_signal, hann_window  # noqa: F401
from hifigan_tpu.audio.io import load_wav, save_wav  # noqa: F401
