from .whisper import encode, decode, forward, init_cache, cross_kv  # noqa: F401
from .init import init_params, param_axes, sinusoidal_positions  # noqa: F401
from .load_hf import load_params, save_pretrained, params_from_state_dict  # noqa: F401
