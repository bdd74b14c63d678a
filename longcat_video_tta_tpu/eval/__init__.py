from .frechet import (  # noqa: F401
    OnlineFrechetAccumulator,
    center_crop,
    frechet_distance,
    load_i3d_model,
    pad_for_i3d,
)
from .i3d import (  # noqa: F401
    convert_torch_i3d_state,
    i3d_logits,
    init_i3d,
    load_i3d_params,
    make_i3d_feature_fn,
)
from .inception import (  # noqa: F401
    convert_torch_inception_state,
    inception_features,
    init_inception,
    load_inception_params,
    make_inception_feature_fn,
)
from .lpips import (  # noqa: F401
    convert_torch_lpips_state,
    init_lpips_alex,
    load_lpips_params,
    lpips_alex,
    make_lpips_feature_fn,
)
from .metrics import (  # noqa: F401
    compute_lpips,
    compute_psnr,
    compute_ssim,
    evaluate_generation_metrics,
    psnr_per_frame,
    ssim_per_frame,
)
from .vbench import VBENCH_DIMENSIONS, run_vbench  # noqa: F401
