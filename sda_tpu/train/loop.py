r"""Training runtime: jitted epochs, optax AdamW, LR schedules.

TPU-native re-design of reference ``sda/utils.py:89-165``. The reference runs
a torch DataLoader + per-batch host->device copies + Python-level optimizer
steps; here one **entire epoch** (shuffle, random window crops, forward,
backward, optimizer update, and the validation pass) is a single jitted
``lax.scan`` program over device-resident data. Data-parallel sharding over a
mesh is a constraint annotation away.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import optax

from ..diffusion.sde import VPSDE
from ..parallel.mesh import batch_constraint
from .data import TrajectoryDataset

Array = jax.Array


#: Per-epoch LR decay factors (reference ``sda/utils.py:117-124``); written
#: in jnp so the same function serves the traced optax schedule and host-side
#: reporting.
SCHEDULES: Dict[str, Callable[[float, int], float]] = {
    'linear': lambda t, epochs: 1 - (t / epochs),
    'cosine': lambda t, epochs: (1 + jnp.cos(jnp.pi * t / epochs)) / 2,
    'exponential': lambda t, epochs: jnp.exp(-7 * (t / epochs) ** 2),
    'constant': lambda t, epochs: 1.0,
}


class Trainer:
    r"""Denoising score-matching trainer.

    Training semantics match the reference loop (``sda/utils.py:89-165``):
    AdamW with decoupled weight decay on all parameters, a per-epoch LR decay
    factor, shuffled batches with random temporal crops, and a full validation
    pass per epoch.

    Arguments:
        sde: The noise schedule (supplies the loss).
        module: The flax score module (its ``apply`` is the eps function).
        params: The initial parameter pytree.
        trainset / validset: Device-resident datasets.
        epochs: The total number of epochs (drives the LR schedule).
        batch_size: The batch size.
        learning_rate: The base AdamW learning rate.
        weight_decay: The AdamW weight decay.
        scheduler: The LR decay schedule name.
        key: The PRNG key for the whole run.
        mesh: An optional device mesh; batches are sharded over its ``'dp'``
            axis (data parallelism).
    """

    def __init__(
        self,
        sde: VPSDE,
        module,
        params,
        trainset: TrajectoryDataset,
        validset: TrajectoryDataset,
        epochs: int = 256,
        batch_size: int = 64,
        optimizer: str = 'AdamW',
        learning_rate: float = 1e-3,
        weight_decay: float = 1e-3,
        scheduler: str = 'linear',
        key: Optional[Array] = None,
        mesh=None,
        eps_wrapper: Optional[Callable] = None,
        **absorb,
    ):
        if optimizer != 'AdamW':
            raise ValueError(f"unknown optimizer '{optimizer}'")
        if scheduler not in SCHEDULES:
            raise ValueError(f"unknown scheduler '{scheduler}'")

        self.sde = sde
        self.module = module
        self.params = params
        self.trainset = trainset
        self.validset = validset
        self.epochs = epochs
        self.batch_size = batch_size
        self.mesh = mesh
        self.eps_wrapper = eps_wrapper
        self.key = jax.random.key(0) if key is None else key
        self.epoch = 0

        steps_per_epoch = max(len(trainset) // batch_size, 1)
        factor = SCHEDULES[scheduler]

        # Single source of truth for the LR: optax consumes it per step
        # (traced), step_epoch reports it per epoch (host).
        def lr_schedule(count):
            return learning_rate * factor(count // steps_per_epoch, epochs)

        self._lr_schedule = lr_schedule
        self._steps_per_epoch = steps_per_epoch

        self.optimizer = optax.adamw(
            learning_rate=lr_schedule, weight_decay=weight_decay
        )
        self.opt_state = self.optimizer.init(params)

        self._epoch_fn = self._build_epoch_fn()

    # -- Jitted epoch ------------------------------------------------------

    def _eps(self, params):
        def eps(x, t, c=None):
            return self.module.apply({'params': params}, x, t, c)

        if self.eps_wrapper is not None:
            return self.eps_wrapper(eps)

        return eps

    def _build_epoch_fn(self):
        sde = self.sde
        trainset = self.trainset
        validset = self.validset
        batch_size = self.batch_size
        optimizer = self.optimizer
        mesh = self.mesh

        # NOTE: the data arrays are explicit *arguments*, not closure
        # captures — captured arrays would be baked into the program as
        # multi-GB HLO constants (which also breaks remote-compile services).
        def run_epoch(params, opt_state, key, train_data, valid_data):
            k_perm, k_train, k_vperm, k_valid = jax.random.split(key, 4)

            # Train pass
            idx, nb = trainset.epoch_batches(k_perm, batch_size)
            keys = jax.random.split(k_train, nb)

            def train_body(carry, inp):
                params, opt_state = carry
                rows, k = inp
                k_crop, k_loss = jax.random.split(k)

                x = trainset.crop(k_crop, train_data[rows])
                if mesh is not None:
                    x = batch_constraint(x, mesh)

                loss, grads = jax.value_and_grad(
                    lambda p: sde.loss(k_loss, x, eps=self._eps(p))
                )(params)

                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)

                return (params, opt_state), loss

            (params, opt_state), train_losses = jax.lax.scan(
                train_body, (params, opt_state), (idx, keys)
            )

            # Valid pass
            vidx, vnb = validset.epoch_batches(k_vperm, batch_size)
            vkeys = jax.random.split(k_valid, vnb)

            def valid_body(_, inp):
                rows, k = inp
                k_crop, k_loss = jax.random.split(k)

                x = validset.crop(k_crop, valid_data[rows])
                if mesh is not None:
                    x = batch_constraint(x, mesh)

                return None, sde.loss(k_loss, x, eps=self._eps(params))

            _, valid_losses = jax.lax.scan(valid_body, None, (vidx, vkeys))

            return (
                params,
                opt_state,
                jnp.mean(train_losses),
                jnp.mean(valid_losses),
            )

        return jax.jit(run_epoch, donate_argnums=(0, 1))

    # -- Iteration ---------------------------------------------------------

    def step_epoch(self) -> Dict[str, float]:
        r"""Runs one epoch; returns ``{'loss_train', 'loss_valid', 'lr'}``."""

        lr = float(self._lr_schedule(self.epoch * self._steps_per_epoch))

        self.key, sub = jax.random.split(self.key)
        self.params, self.opt_state, lt, lv = self._epoch_fn(
            self.params, self.opt_state, sub,
            self.trainset.data, self.validset.data,
        )

        self.epoch += 1

        return {
            'loss_train': float(lt),
            'loss_valid': float(lv),
            'lr': lr,
        }

    def __iter__(self) -> Iterator[Dict[str, float]]:
        while self.epoch < self.epochs:
            yield self.step_epoch()


def loop(
    sde: VPSDE,
    module,
    params,
    trainset: TrajectoryDataset,
    validset: TrajectoryDataset,
    **kwargs,
) -> Trainer:
    r"""Builds a :class:`Trainer`; iterating it yields per-epoch stats
    (generator parity with reference ``sda/utils.py:89-165``)."""

    return Trainer(sde, module, params, trainset, validset, **kwargs)
