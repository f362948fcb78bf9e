"""Mesh construction and multi-host work assignment.

SURVEY.md §2.3 "TPU-native equivalents": data-parallel sharding over the
ICI mesh; DCN only carries host-level file-shard assignment
(jax.process_index-based), since inference needs no parameter
communication (weights replicated).
"""

from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_names: Tuple[str, ...] = ("dp", "tp"),
    shape: Optional[Tuple[int, ...]] = None,
    devices=None,
) -> Mesh:
    """Build a Mesh over all (or given) devices.

    Without an explicit ``shape``, devices are factored with the largest
    power-of-two tp that divides the device count, capped at 4 — a sensible
    default for the <=1B-param models in this framework (tp rides the
    faster ICI axis; dp takes the rest).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        else:
            tp = 1
            while tp < 4 and n % (tp * 2) == 0:
                tp *= 2
            shape = (n // tp, tp) + (1,) * (len(axis_names) - 2)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(devices.reshape(shape), axis_names)


def shard_files_for_host(
    files: Sequence[str],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[str]:
    """Deterministic per-host file assignment for multi-host corpus jobs."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [f for i, f in enumerate(sorted(files)) if i % pc == pi]
