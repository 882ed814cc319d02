"""Multi-chip parallelism: mesh-sharded training and encode scaling.

The reference's only parallelism is shared-memory rayon threads
(`tokenizers/src/utils/parallelism.rs`); here parallelism is SPMD over a
`jax.sharding.Mesh` — data-parallel corpus shards with `psum` collectives
over ICI, replicated deterministic selection (see SURVEY.md §2.9).
"""

from .bpe_train import DistributedBpeTrainer  # noqa: F401
from .encode import shard_encode_batch, shard_encode_batch_arrays  # noqa: F401
