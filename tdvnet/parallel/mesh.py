"""Mesh construction helpers."""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axes: Tuple[str, ...] = ("data",),
              shape: Optional[Tuple[int, ...]] = None,
              devices=None) -> Mesh:
    """Build a Mesh over the available devices.

    Default: 1-D 'data' mesh over all devices.  A 2-D ('data', 'space') mesh
    shards scenes over 'data' and scene-volume x-blocks over 'space'.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def initialize_distributed():
    """Multi-host init hook (`jax.distributed.initialize`); no-op when
    single-process.  Call before any backend use on pods.

    Cluster schedulers jax auto-detects (SLURM/OMPI/TPU pods) need only
    JAX_COORDINATOR_ADDRESS; elsewhere set JAX_NUM_PROCESSES and
    JAX_PROCESS_ID explicitly (exercised by tests/test_multiprocess.py)."""
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kwargs = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
