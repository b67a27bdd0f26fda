from hifigan_tpu.train.checkpoint import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
    scan_checkpoint,
    convert_torch_generator,
    convert_torch_discriminators,
)
