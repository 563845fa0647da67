from chadavit_tpu.ops.attention import (  # noqa: F401
    masked_multihead_attention,
    xla_masked_attention,
)
from chadavit_tpu.ops.flash_attention import prefix_flash_attention  # noqa: F401
