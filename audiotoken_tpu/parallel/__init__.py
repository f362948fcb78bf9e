"""Device-mesh parallelism: mesh construction, sharding rules, collectives.

The reference has no multi-device support at all (SURVEY.md §2.3); this
package is the TPU-native scale-out layer: data-parallel corpus encoding
over an ICI mesh, tensor/sequence-parallel shardings for the GPT trainer,
and host-level file-shard assignment for multi-host runs.
"""

from .mesh import make_mesh, shard_files_for_host
from .shard import gpt_param_spec, named_sharding_tree

__all__ = ["make_mesh", "shard_files_for_host", "gpt_param_spec", "named_sharding_tree"]
