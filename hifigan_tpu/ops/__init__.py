from hifigan_tpu.ops.conv import (  # noqa: F401
    conv1d,
    conv2d,
    conv_transpose1d,
    avg_pool1d,
    weight_norm_kernel,
    leaky_relu,
    LRELU_SLOPE,
)
