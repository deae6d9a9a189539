"""Device-mesh scale-out (no reference analog; SURVEY.md section 2.11)."""

from .mesh import (batch_sharding, fleet_stats, make_mesh, replicate,
                   shard_problems)

__all__ = ["make_mesh", "shard_problems", "batch_sharding", "replicate",
           "fleet_stats"]
