from .augment import (  # noqa: F401
    build_augmented_latent_variants,
    build_augmented_pixel_variants,
    parse_speed_factors,
    rotate_clip,
    speed_clip,
)
from .datasets import (  # noqa: F401
    analyze_caption_quality,
    apply_fixed_caption,
    load_panda70m_video_list,
    load_ucf101_video_list,
    load_video_list,
    normalize_caption,
    validate_caption_quality,
)
from .retrieval import RetrievalPool, build_retrieval_pool, hashed_bow_embed  # noqa: F401
from .video_io import (  # noqa: F401
    annotate_borders,
    count_frames,
    decode_frames,
    load_gt_frames,
    load_video_frames,
    resize_frames,
    save_video,
    validate_decodable,
)
