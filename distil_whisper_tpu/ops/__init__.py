from .attention import mha, causal_mask  # noqa: F401
from .quant import quantize_encoder_params  # noqa: F401
