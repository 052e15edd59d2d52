"""Data-parallel training step over a device mesh.

Replaces Lightning's DDP strategy (``celldetection/models/lightning_base.py``)
with jit + NamedSharding: the batch shards over the mesh's ``data`` axis,
parameters are replicated, and XLA inserts the gradient all-reduce over ICI.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ['make_train_step', 'TrainState']

from jax.sharding import NamedSharding, PartitionSpec as P


class TrainState:
    """Minimal mutable training state (params, model_state, opt_state, step)."""

    def __init__(self, params, model_state, opt_state, step=0):
        self.params = params
        self.model_state = model_state
        self.opt_state = opt_state
        self.step = step

    @classmethod
    def create(cls, model, tx):
        assert model.variables is not None, 'Call model.init(...) first.'
        params = model.variables['params']
        model_state = {k: v for k, v in model.variables.items() if k != 'params'}
        return cls(params, model_state, tx.init(params))

    def variables(self):
        return {'params': self.params, **self.model_state}


def make_train_step(model, tx: optax.GradientTransformation, mesh=None,
                    loss_scale: float = 1.0):
    """Build a jitted (optionally mesh-sharded) CPN training step.

    Returns ``step_fn(state: TrainState, batch: dict, rng) -> (TrainState, metrics)``
    where batch has ``image [B,H,W,C]`` + target keys. With a mesh, ``B`` must
    be divisible by the data-axis size.
    """

    def _step(params, model_state, opt_state, batch, rng):
        image = batch['image']
        targets = {k: v for k, v in batch.items() if k != 'image'}

        def loss_fn(p):
            out, new_state = model.forward_padded(
                {'params': p, **model_state}, image, train=True, targets=targets,
                selection_rng=rng, mutable=True)
            return out['loss'] * loss_scale, (new_state, out['losses'])

        (loss, (new_state, losses)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if loss_scale != 1.0:
            # unscale before the optimizer sees them (the scale only protects
            # the backward pass from underflow)
            grads = jax.tree_util.tree_map(lambda g: g / loss_scale, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {'loss': loss / loss_scale,
                   **{f'loss_{k}': v for k, v in losses.items() if v is not None}}
        return params, new_state, opt_state, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P('data'))
        # A single NamedSharding for the batch arg applies to every leaf:
        # leading (batch) dim sharded over 'data', the rest replicated.
        jit_step = jax.jit(_step, in_shardings=(repl, repl, repl, shard, repl),
                           out_shardings=(repl, repl, repl, repl))
    else:
        jit_step = jax.jit(_step)

    def step_fn(state: TrainState, batch: dict, rng):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        params, model_state, opt_state, metrics = jit_step(
            state.params, state.model_state, state.opt_state, batch, rng)
        state.params, state.model_state, state.opt_state = params, model_state, opt_state
        state.step += 1
        return state, metrics

    return step_fn
