"""Device helpers.

On remote-dispatch backends (the axon TPU tunnel) every eager op is a network
round trip, so parameter initialisation — thousands of tiny RNG ops — must run
on the host CPU backend and transfer once.
"""
from __future__ import annotations

import jax


def init_on_cpu(init_fn, *args, **kwargs):
    """Run an init function on the CPU backend, return host-resident pytree.

    Array arguments (PRNG keys) are moved to CPU first: JAX places ops where
    their operands live, so a device-resident key would drag the whole init
    back onto the accelerator regardless of default_device.
    """
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return init_fn(*args, **kwargs)

    def to_cpu(x):
        return jax.device_put(x, cpu) if isinstance(x, jax.Array) else x

    args = jax.tree.map(to_cpu, args)
    kwargs = jax.tree.map(to_cpu, kwargs)
    with jax.default_device(cpu):
        return init_fn(*args, **kwargs)


def to_default_device(tree):
    """Move a pytree to the default (accelerator) device."""
    dev = jax.devices()[0]
    return jax.device_put(tree, dev)
