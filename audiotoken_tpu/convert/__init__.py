"""One-time torch -> JAX weight converters (SURVEY.md §7: convert/).

Each converter takes a torch state dict (as numpy arrays) and emits the
pure-pytree params consumed by audiotoken_tpu.nn. Weight-norm is folded,
Conv1D-style transposes applied, and compile prefixes stripped here — the
device code never sees parametrizations.
"""

from .store import load_params, save_params, state_dict_to_numpy

__all__ = ["load_params", "save_params", "state_dict_to_numpy"]
