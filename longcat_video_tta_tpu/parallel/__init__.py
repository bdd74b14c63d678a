from .context_attention import (  # noqa: F401
    cp_self_attention,
    ring_self_attention,
)
from .mesh import (  # noqa: F401
    AXES,
    build_mesh,
    factorize_devices,
    init_distributed,
    single_device_mesh,
)
from .sharding import (  # noqa: F401
    LATENT_SPEC,
    param_shardings,
    param_specs,
    shard_batch,
    shard_params,
)
