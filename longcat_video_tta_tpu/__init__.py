"""TPU-native rebuild of FifthEpoch/longcat-video-tta.

JAX/XLA/Pallas/pjit framework: LongCat-style video diffusion model stack
(UMT5 + causal 3D WAN VAE + 48-block DiT), flow-matching TTA engine with
seven adapter methods, sampler/pipeline with conditioning KV-cache, sweep
runner, evaluation, and aggregation tooling.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
