"""Sharding rules (PartitionSpec trees) for the model families.

Megatron-style tensor parallelism for the GPT trainer: column-parallel
qkv/mlp-in kernels (output dim on 'tp'), row-parallel out/mlp-out kernels
(input dim on 'tp'), vocab-parallel embeddings; LayerNorms replicated.
XLA inserts the all-reduce/all-gather collectives from these annotations
(jit + NamedSharding) — no hand-written comms.
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _gpt_leaf_spec(name: str):
    """Megatron TP rule for one nn/gpt.py leaf (None = replicate)."""
    if "wte" in name:
        return P("tp", None)  # vocab-parallel embedding
    if "wpe" in name:
        return P(None, None)
    if "attn/qkv/kernel" in name or "mlp/in/kernel" in name:
        return P(None, "tp")  # column parallel
    if "attn/qkv/bias" in name or "mlp/in/bias" in name:
        return P("tp")
    if "attn/out/kernel" in name or "mlp/out/kernel" in name:
        return P("tp", None)  # row parallel
    return None


def gpt_param_spec(params: Any) -> Any:
    """PartitionSpec tree matching an nn/gpt.py param tree."""

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        name = "/".join(str(k) for k in keys)
        if leaf is None:
            return None
        spec = _gpt_leaf_spec(name)
        if spec is not None:
            return spec
        return P(*([None] * getattr(leaf, "ndim", 0)))

    return jax.tree_util.tree_map_with_path(spec_for, params, is_leaf=lambda x: x is None)


def gpt_sampler_param_spec(params: Any) -> Any:
    """PartitionSpec tree for a GPTSampler param tree (nn/gpt.py).

    Same Megatron rules as :func:`gpt_param_spec`, but the sampler holds
    the per-layer trees STACKED under ``layers_stacked`` with a leading
    [L] axis (nn/gpt.py:_stack_layers) — that axis replicates, so each
    stacked leaf's spec is the per-layer spec with a prepended None.
    SURVEY.md §2.3: TP inference is a config change — this makes it one
    for the GPT decode path too, not just the conformer.
    """

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        name = "/".join(str(k) for k in keys)
        if leaf is None:
            return None
        spec = _gpt_leaf_spec(name)
        if spec is None:
            return P(*([None] * getattr(leaf, "ndim", 0)))
        if name.startswith("layers_stacked"):
            return P(None, *spec)
        return spec

    return jax.tree_util.tree_map_with_path(spec_for, params, is_leaf=lambda x: x is None)


def named_sharding_tree(spec_tree: Any, mesh: Mesh) -> Any:
    """PartitionSpec tree -> NamedSharding tree (None leaves pass through)."""
    return jax.tree_util.tree_map(
        lambda s: None if s is None else NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: x is None or isinstance(x, P),
    )


def conformer_param_spec(params: Any) -> Any:
    """Tensor-parallel PartitionSpecs for nn/conformer.py param trees.

    SURVEY.md §2.3: the conformer should be shard-annotation-ready so TP
    inference is a config change. Column-parallel: attention q/k/v and
    ffn intermediate (output dim on 'tp'); row-parallel: attention out and
    ffn output (input dim on 'tp'); the depthwise conv and pointwise convs
    shard over channels; norms and the 73-bin distance embeddings
    replicate.
    """

    def spec_for(path, leaf):
        keys = "/".join(str(getattr(p, "key", getattr(p, "name", ""))) for p in path)
        if leaf is None:
            return None
        ndim = getattr(leaf, "ndim", 0)
        if "/attn/" in keys and "/kernel" in keys:
            if "/out/" in keys:
                return P("tp", None)
            if any(f"/{q}/" in keys for q in ("q", "k", "v")):
                return P(None, "tp")
        if "/attn/" in keys and "/bias" in keys and "/out/" not in keys:
            return P("tp")
        if ("ffn1/" in keys or "ffn2/" in keys) and "/kernel" in keys:
            return P(None, "tp") if "/in/" in keys else P("tp", None)
        if ("ffn1/" in keys or "ffn2/" in keys) and "/bias" in keys and "/in/" in keys:
            return P("tp")
        if "conv/pw1/kernel" in keys:
            return P(None, "tp")
        if "conv/pw2/kernel" in keys:
            return P("tp", None)
        if "conv/dw_kernel" in keys:
            return P(None, None, "tp")  # depthwise channels on tp
        return P(*([None] * ndim))

    return jax.tree_util.tree_map_with_path(spec_for, params, is_leaf=lambda x: x is None)


def data_parallel_shardings(mesh: Mesh, axis: str = "dp"):
    """(replicated-params sharding, batch-sharded-input sharding) for
    data-parallel inference over a mesh."""
    return NamedSharding(mesh, P()), NamedSharding(mesh, P(axis))


def replicated_spec(params: Any) -> Any:
    """Fully-replicated spec tree (data-parallel inference weights)."""
    return jax.tree_util.tree_map(
        lambda leaf: None if leaf is None else P(*([None] * getattr(leaf, "ndim", 0))),
        params,
        is_leaf=lambda x: x is None,
    )
