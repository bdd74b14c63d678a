from .context_attention import (  # noqa: F401
    cp_self_attention,
    ring_self_attention,
)
from .mesh import AXES, build_mesh, factorize_devices, single_device_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    LATENT_SPEC,
    param_shardings,
    param_specs,
    shard_batch,
    shard_params,
)
