from .pipeline import (  # noqa: F401
    HashTokenizer,
    ModelBundle,
    generate_t2v,
    generate_vc,
    round_frames_4k1,
)
from .sampler import sample_latents  # noqa: F401
