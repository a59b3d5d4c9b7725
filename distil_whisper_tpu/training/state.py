"""Train state with mixed-precision policies and frozen-module masking.

Precision modes mirror the reference TPU trainer
(flax/run_distillation.py:422-442, 653-712):

* ``full``       — fp32 params, fp32 compute.
* ``half_mixed`` — fp32 master params + optimizer state; bf16 compute (the
  forward/backward casts params per-step).
* ``full_mixed`` — bf16 params on device, fp32 optimizer state; updates run
  upcast -> apply -> downcast.

Gradient clipping is global-norm (clip 1.0 default) applied inside the optax
chain, and gradient accumulation uses ``optax.MultiSteps`` — both as in the
reference (:665-698, adamw·MultiSteps at :1637).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.params import cast_floating, tree_paths, unflatten_paths

Params = Any


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 1e-4
    warmup_steps: int = 500
    total_steps: int = 100_000
    schedule: str = "linear"        # constant_with_warmup | linear
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0
    max_grad_norm: Optional[float] = 1.0
    gradient_accumulation_steps: int = 1
    precision: str = "half_mixed"   # full | half_mixed | full_mixed
    frozen_prefixes: Tuple[str, ...] = ()  # e.g. ("encoder",) to freeze it

    @property
    def compute_dtype(self):
        return jnp.float32 if self.precision == "full" else jnp.bfloat16

    @property
    def param_dtype(self):
        return jnp.bfloat16 if self.precision == "full_mixed" else jnp.float32


def _decay_mask(params: Params) -> Params:
    """True where weight decay applies: kernels/embeddings, not LN/bias
    (reference run_distillation.py:1377-1407)."""
    flat = tree_paths(params)
    mask = {p: not (p.endswith(".bias") or ".ln" in p or p.endswith(".scale")
                    or "_ln." in p)
            for p in flat}
    return unflatten_paths(mask)


def _trainable_mask(params: Params, frozen_prefixes: Sequence[str]) -> Params:
    flat = tree_paths(params)
    mask = {p: not any(p.startswith(f) for f in frozen_prefixes) for p in flat}
    return unflatten_paths(mask)


def _cast_by_policy(params: Params, cfg: OptimizerConfig) -> Params:
    """Stored-param dtypes: trainable leaves get ``param_dtype`` (fp32 master
    copies under half_mixed), FROZEN leaves stay in compute dtype — a frozen
    large-v3 encoder otherwise carries ~1.3 GB of pointless fp32 masters."""
    if not cfg.frozen_prefixes or cfg.param_dtype == cfg.compute_dtype:
        return cast_floating(params, cfg.param_dtype)
    trainable = _trainable_mask(params, cfg.frozen_prefixes)
    return jax.tree.map(
        lambda p, t: cast_floating(p, cfg.param_dtype if t
                                   else cfg.compute_dtype),
        params, trainable)


def make_schedule(cfg: OptimizerConfig):
    warmup = optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
    if cfg.schedule == "constant_with_warmup":
        rest = optax.constant_schedule(cfg.learning_rate)
    else:
        rest = optax.linear_schedule(cfg.learning_rate, 0.0,
                                     max(cfg.total_steps - cfg.warmup_steps, 1))
    return optax.join_schedules([warmup, rest], [cfg.warmup_steps])


def make_optimizer(cfg: OptimizerConfig, params: Params) -> optax.GradientTransformation:
    chain = []
    if cfg.max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    adamw = optax.adamw(
        make_schedule(cfg), b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
        weight_decay=cfg.weight_decay, mask=_decay_mask(params))
    if cfg.frozen_prefixes:
        trainable = _trainable_mask(params, cfg.frozen_prefixes)
        # adamw wrapped in masked => NO mu/nu allocated for frozen params
        # (a frozen large-v3 encoder otherwise wastes ~5 GB of fp32 moments
        # per chip); the trailing set_to_zero guards partially-frozen setups
        # (freeze_decoder) where frozen grads are nonzero and masked() would
        # pass them through as updates.
        chain.append(optax.masked(adamw, trainable))
        chain.append(optax.masked(
            optax.set_to_zero(),
            jax.tree.map(lambda t: not t, trainable)))
    else:
        chain.append(adamw)
    tx = optax.chain(*chain)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


def place_state(state: "TrainState", tx: optax.GradientTransformation,
                mesh, param_shardings: Any) -> "TrainState":
    """Place a TrainState on a mesh (the single placement point shared by the
    drivers, tests and the multi-chip dryrun).

    Params follow ``param_shardings``; the optimizer's param-shaped leaves
    (AdamW mu/nu, MultiSteps accumulated grads) are sharded *identically* —
    the reference replicates optimizer state (flax/run_distillation.py:
    1905-1908), which for a 756 M student wastes ~6 GB/chip of fp32 moments;
    under GSPMD sharding them costs nothing.  Scalars (step counts, schedule
    state) are replicated.

    Param-shaped opt-state leaves are recognised by their trailing dict-key
    path (mu['decoder']['fc1']['kernel'] ends with the param path), which is
    robust to any optax wrapper nesting (chain/masked/MultiSteps/MaskedNode).
    """
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    flat_sh = {
        tuple(k.key for k in path): sh
        for path, sh in
        jax.tree_util.tree_flatten_with_path(param_shardings)[0]}

    def put(path, leaf):
        keys = tuple(k.key for k in path
                     if isinstance(k, jax.tree_util.DictKey))
        for start in range(len(keys)):
            sh = flat_sh.get(keys[start:])
            if sh is not None:
                return jax.device_put(leaf, sh)
        return jax.device_put(leaf, rep)

    return TrainState(
        step=jax.device_put(state.step, rep),
        params=jax.tree.map(jax.device_put, state.params, param_shardings),
        opt_state=jax.tree_util.tree_map_with_path(put, state.opt_state))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Params          # stored in param_dtype
    opt_state: Any          # fp32

    @classmethod
    def create(cls, params: Params, cfg: OptimizerConfig,
               tx: Optional[optax.GradientTransformation] = None
               ) -> Tuple["TrainState", optax.GradientTransformation]:
        tx = tx or make_optimizer(cfg, params)
        params32 = cast_floating(params, jnp.float32)
        state = cls(step=jnp.zeros((), jnp.int32),
                    params=_cast_by_policy(params, cfg),
                    opt_state=tx.init(params32))
        return state, tx

    def apply_gradients(self, grads: Params, tx, cfg: OptimizerConfig
                        ) -> "TrainState":
        """Upcast -> clip+update (inside tx) -> downcast (reference
        TrainState.apply_gradients, flax/run_distillation.py:661-698)."""
        params32 = cast_floating(self.params, jnp.float32)
        grads32 = cast_floating(grads, jnp.float32)
        updates, new_opt = tx.update(grads32, self.opt_state, params32)
        new_params = optax.apply_updates(params32, updates)
        return TrainState(step=self.step + 1,
                          params=_cast_by_policy(new_params, cfg),
                          opt_state=new_opt)
