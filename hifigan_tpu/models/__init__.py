from hifigan_tpu.models.generator import Generator, ResBlock1, ResBlock2  # noqa: F401
from hifigan_tpu.models.discriminators import (  # noqa: F401
    DiscriminatorP,
    DiscriminatorS,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
from hifigan_tpu.models.losses import (  # noqa: F401
    feature_loss,
    discriminator_loss,
    generator_loss,
)
from hifigan_tpu.models.layers import fold_weight_norm  # noqa: F401
