"""Device mesh construction and multi-host initialization."""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(shape: tuple[int, ...] | int | None = None, axis_names: tuple[str, ...] = ("shard",)) -> Mesh:
    """Build a Mesh over the available devices.

    ``shape=None`` uses all devices on one axis. On a pod slice the
    device order from ``mesh_utils`` keeps neighboring mesh coordinates on
    neighboring ICI links, so `ppermute` halo exchange and `all_to_all`
    transposes ride ICI rather than DCN.
    """
    if shape is None:
        shape = (len(jax.devices()),)
    elif isinstance(shape, int):
        shape = (shape,)
    try:
        from jax.experimental import mesh_utils

        devices = mesh_utils.create_device_mesh(shape)
    except Exception:
        devices = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    if len(axis_names) != len(shape):
        axis_names = tuple(f"ax{i}" for i in range(len(shape)))
    return Mesh(devices, axis_names)


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Multi-host runtime bring-up (`jax.distributed.initialize`).

    The reference is single-JVM (SURVEY.md §5.8); this is the multi-host
    entry the TPU build adds. No-ops when already initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized
    except ValueError:
        pass  # single-process environment without auto-detectable cluster
    return jax.process_index(), jax.process_count()
