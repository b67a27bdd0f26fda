from hifigan_tpu.distill.cycles import calculate_cycles, cycles_valid  # noqa: F401
from hifigan_tpu.distill.tensor_ops import expand, mix, unmix, cut_and_roll  # noqa: F401
from hifigan_tpu.distill.losses import (  # noqa: F401
    get_loss_by_type,
    get_losses_by_types,
    recursive_loss,
)
