"""hifigan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) speech-synthesis framework.

Re-implements, TPU-first, the full capability surface of the reference
AlonKellner/hifi-gan fork (HiFi-GAN vocoder + the `speech_distillation`
research framework):

- ``hifigan_tpu.audio``   — STFT / log-mel DSP pipeline (MXU matmul-DFT + Pallas)
- ``hifigan_tpu.models``  — Generator V1/V2/V3, multi-period / multi-scale
  discriminators, GAN losses
- ``hifigan_tpu.ops``     — torch-semantics-exact conv primitives (NWC layout),
  weight/spectral norm, Pallas kernels
- ``hifigan_tpu.train``   — vocoder GAN trainer (data-parallel over a Mesh)
- ``hifigan_tpu.dsl``     — declarative layer-DSL model builder
- ``hifigan_tpu.distill`` — GAN-autoencoder distillation trainer
- ``hifigan_tpu.data``    — host-side dataset engines + augmentation
- ``hifigan_tpu.parallel``— mesh/sharding utilities, halo-exchange conv
"""

__version__ = "0.1.0"

from hifigan_tpu.config import AttrDict, load_config  # noqa: F401
