"""Data-parallel training step over a device mesh.

Replaces Lightning's DDP strategy (``celldetection/models/lightning_base.py``)
with jit + NamedSharding: the batch shards over the mesh's ``data`` axis,
parameters are replicated, and XLA inserts the gradient all-reduce over ICI
(single host) or ICI+DCN (multi-host, when the mesh spans processes).
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ['make_train_step', 'TrainState', 'mesh_spans_processes']

from jax.sharding import NamedSharding, PartitionSpec as P


def mesh_spans_processes(mesh) -> bool:
    """True when the mesh contains devices from more than one JAX process.

    In that regime a jit over the mesh is a true multi-host SPMD program
    (the reference reaches the same regime through Lightning's multi-node DDP
    strategies, ``celldetection_scripts/cpn_inference.py:504-511``): every
    process feeds only its addressable shard of the batch, and inputs must be
    assembled into global ``jax.Array``s before the call.
    """
    if mesh is None:
        return False
    pid = jax.process_index()
    return any(d.process_index != pid for d in mesh.devices.flat)


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

    When the mesh spans multiple processes (a pod: ICI inside each host, DCN
    across hosts), every process passes only its **process-local** slice of the
    global batch; the step assembles them into global arrays with
    ``jax.make_array_from_process_local_data`` and keeps params/opt-state as
    replicated global arrays. Gradient all-reduce then rides ICI within a host
    and DCN across hosts — the TPU-native equivalent of the reference's
    multi-node DDP training (``lightning_base.py:397-440``; strategy wiring
    ``celldetection_scripts/cpn_inference.py:504-511``).
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

    multiprocess = mesh_spans_processes(mesh)
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P('data'))
        # A single NamedSharding for the batch arg applies to every leaf:
        # leading (batch) dim sharded over 'data', the rest replicated.
        jit_step = jax.jit(_step, in_shardings=(repl, repl, repl, shard, repl),
                           out_shardings=(repl, repl, repl, repl))
    else:
        jit_step = jax.jit(_step)

    def _to_global(tree, sharding):
        # Host-local leaves -> global jax.Arrays on the multi-process mesh.
        # For the replicated spec every process supplies the identical full
        # value (params/opt-state/rng agree by same-seed init); for the batch
        # spec each process supplies its local slice of the global batch.
        def one(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x  # already global (fed back from the previous step)
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.tree_util.tree_map(one, tree)

    def step_fn(state: TrainState, batch: dict, rng):
        if multiprocess:
            batch = _to_global(batch, shard)
            state.params = _to_global(state.params, repl)
            state.model_state = _to_global(state.model_state, repl)
            state.opt_state = _to_global(state.opt_state, repl)
            rng = _to_global(rng, repl)
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        params, model_state, opt_state, metrics = jit_step(
            state.params, state.model_state, state.opt_state, batch, rng)
        state.params, state.model_state, state.opt_state = params, model_state, opt_state
        state.step += 1
        return state, metrics

    return step_fn
