from .attention import mha, causal_mask  # noqa: F401
