"""Multi-chip parallelism: meshes, shardings, distributed kernels.

The reference is single-threaded (no parallelism of any kind — SURVEY §2.4);
this layer is where the TPU build scales:

- lane/data parallelism: interpreter lanes sharded over the mesh;
- trace-row sharding: commitment rows partitioned across chips;
- distributed four-step NTT: local column NTTs + twiddle + an
  ``all_to_all`` transpose over ICI + local row NTTs;
- distributed Merkle: per-shard subtrees, ``all_gather`` of subtree roots,
  replicated top levels.
"""

from .mesh import make_mesh
from .distributed import (
    dist_lde,
    dist_ntt,
    dist_ntt_natural,
    dist_merkle_root,
    sharded_interpreter_state,
    prove_step_sharded,
)
