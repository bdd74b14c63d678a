from .attention import attention, attention_xla  # noqa: F401
from .flash_attention import flash_attention  # noqa: F401
