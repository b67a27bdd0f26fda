from hifigan_tpu.data.meldataset import (  # noqa: F401
    MelDataset,
    get_dataset_filelist,
    mel_spectrogram_np,
)
from hifigan_tpu.data.wave_dataset import WaveDataset  # noqa: F401
from hifigan_tpu.data.multilabel import MultilabelWaveDataset  # noqa: F401
