from abcsmc_tpu.parallel.mesh import particle_mesh
from abcsmc_tpu.parallel.generation import ShardedGeneration

__all__ = ["particle_mesh", "ShardedGeneration"]
