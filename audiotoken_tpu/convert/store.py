"""Converted-weight store: flat .npz serialization of parameter pytrees.

Replaces the reference's scattered artifact formats (torch .pt with
``_orig_mod.`` prefixes, joblib k-means pickles, safetensors — see
SURVEY.md §5 "Checkpoint / resume") with one canonical on-disk form:
a flat ``{path/to/leaf: array}`` npz per model, loadable without torch.
"""

import io
import os
from typing import Any, Dict

import jax
import numpy as np


#: reserved npz key listing pytree paths whose leaf is None (bias=False
#: models: nanoGPT GPT, w2v-BERT pointwise convs, HuBERT extractor, Bark)
_NONE_KEYS = "__none_keys__"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}#/"))
    elif tree is None:
        out[prefix[:-1]] = None
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def fix(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.endswith("#") for k in node):
            items = sorted(node.items(), key=lambda kv: int(kv[0][:-1]))
            return [fix(v) for _, v in items]
        return {k: fix(v) for k, v in node.items()}

    return fix(root)


def save_params(path: str, params: Any) -> None:
    # tree_map treats None as structure (skipped), so _flatten sees the raw
    # Nones and records their paths; they round-trip via _NONE_KEYS.
    flat = _flatten(params)
    none_keys = sorted(k for k, v in flat.items() if v is None)
    arrays = {k: np.asarray(v) for k, v in flat.items() if v is not None}
    if none_keys:
        arrays[_NONE_KEYS] = np.asarray(none_keys)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def load_params(path: str) -> Any:
    with np.load(path) as z:
        flat: Dict[str, Any] = {k: z[k] for k in z.files if k != _NONE_KEYS}
        if _NONE_KEYS in z.files:
            for k in z[_NONE_KEYS]:
                flat[str(k)] = None
    return _unflatten(flat)


def save_params_orbax(path: str, params: Any) -> None:
    """Write a param pytree as an orbax checkpoint directory (the
    orbax-style store SURVEY.md §5 calls for; .npz remains the default
    light-weight format)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(path),
            jax.tree_util.tree_map(np.asarray, params),
        )


def load_params_orbax(path: str) -> Any:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


def state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """torch state dict -> plain numpy dict (accepts tensors or arrays)."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out
