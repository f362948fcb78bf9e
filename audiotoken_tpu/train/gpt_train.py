"""Sharded trainer for the semantic->acoustic GPT.

The reference ships this model's training leftovers
(gpt2_model.py:172-196 configure_optimizers: AdamW, decay on >=2D params)
but no distributed support. Here the train step is jitted over a
('dp', 'tp') Mesh: batch data-parallel, Megatron tensor-parallel kernels
(parallel/shard.py), sequence-parallel activation sharding between blocks
(with_sharding_constraint over 'tp'), optimizer state sharded like params.
XLA inserts all collectives from the sharding annotations.
"""

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.gpt import GPTConfig, gpt_logits
from ..parallel.shard import gpt_param_spec, named_sharding_tree


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 3e-4
    weight_decay: float = 0.1
    b1: float = 0.9
    b2: float = 0.95
    grad_clip: float = 1.0


def make_optimizer(tc: TrainConfig):
    """AdamW with weight decay only on >=2D params (reference
    gpt2_model.py:176-186 decay/no-decay split)."""
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(
            tc.learning_rate,
            b1=tc.b1,
            b2=tc.b2,
            weight_decay=tc.weight_decay,
            mask=lambda params: jax.tree_util.tree_map(
                lambda p: p is not None and getattr(p, "ndim", 0) >= 2,
                params,
                is_leaf=lambda x: x is None,
            ),
        ),
    )


def _loss_fn(params, idx, targets, cfg: GPTConfig, mesh: Optional[Mesh]):
    def constrain(x):
        if mesh is None:
            return x
        # sequence-parallel activation sharding: batch on dp, seq on tp
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("dp", "tp", None))
        )

    logits = gpt_logits(
        params, idx, cfg,
        precision=jax.lax.Precision.DEFAULT,
        activation_constraint=constrain,
    ).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = targets >= 0
    tgt = jnp.where(valid, targets, 0)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


class TrainStep:
    """Callable train step with a uniform interface, mesh or not.

    ``step(params, opt_state, idx, targets) -> (params, opt_state, loss)``;
    ``step.optimizer`` is the optax optimizer; ``step.place(...)`` shards
    params/data onto the mesh (identity when no mesh — callers never need
    to know which case they got, fixing the round-1 2-tuple/3-tuple wart).
    """

    def __init__(self, fn, optimizer, place, mesh):
        self._fn = fn
        self.optimizer = optimizer
        self.place = place
        self.mesh = mesh

    def __call__(self, params, opt_state, idx, targets):
        return self._fn(params, opt_state, idx, targets)

    def __iter__(self):
        # backward compat with the round-1 tuple returns
        yield self._fn
        yield self.optimizer
        if self.mesh is not None:
            yield self.place


def make_train_step(cfg: GPTConfig, tc: TrainConfig, mesh: Optional[Mesh] = None) -> TrainStep:
    """Build the jitted train step. Always returns a :class:`TrainStep`
    (callable, with ``.optimizer`` and ``.place``), regardless of mesh."""
    optimizer = make_optimizer(tc)

    def train_step(params, opt_state, idx, targets):
        loss, grads = jax.value_and_grad(_loss_fn)(params, idx, targets, cfg, mesh)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        def place(params, opt_state, idx, targets):
            return params, opt_state, idx, targets

        return TrainStep(jax.jit(train_step), optimizer, place, None)

    data_sharding = NamedSharding(mesh, P("dp", None))

    def place(params, opt_state, idx, targets):
        shardings = named_sharding_tree(gpt_param_spec(params), mesh)
        params = jax.device_put(params, shardings)
        # optimizer state mirrors param shardings automatically via jit's
        # propagation; place data batch-parallel
        idx = jax.device_put(idx, data_sharding)
        targets = jax.device_put(targets, data_sharding)
        return params, opt_state, idx, targets

    return TrainStep(jax.jit(train_step, donate_argnums=(0, 1)), optimizer, place, mesh)
