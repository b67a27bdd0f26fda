from hifigan_tpu.data.meldataset import (  # noqa: F401
    MelDataset,
    get_dataset_filelist,
)
