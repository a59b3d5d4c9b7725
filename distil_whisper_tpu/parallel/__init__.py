from .mesh import (  # noqa: F401
    DEFAULT_RULES, RULES_2D, make_mesh, spec_for_axes, shardings_for_tree,
    shard_params, shard_batch, data_sharding, replicated,
)
