from hifigan_tpu.ops.pallas.logmel import fused_log_mel, supports_fused_log_mel  # noqa: F401
