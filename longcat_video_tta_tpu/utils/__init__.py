from .tree import global_norm, tree_bytes, tree_cast, tree_count, tree_zeros_like  # noqa: F401
