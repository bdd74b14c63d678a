from .adapters import (  # noqa: F401
    AdapterScheme,
    block_group_map,
    build_scheme,
    merge_params,
    parse_target_blocks,
    partition_params,
)
from .early_stopping import AnchoredEarlyStopper, build_early_stopper  # noqa: F401
from .engine import adapter_norm, build_optimizer, make_train_step  # noqa: F401
from .losses import (  # noqa: F401
    flow_matching_loss,
    flow_matching_loss_conditioned,
    flow_matching_loss_conditioned_fixed,
    flow_matching_loss_fixed,
)
from .split import (  # noqa: F401
    estimate_tta_split_budget,
    resolve_frame_window,
    split_tta_latents,
    validate_tta_feature_budget,
)
