from aqp_tpu.parallel.mesh import make_mesh, shard_relation
from aqp_tpu.parallel.dist_join import dist_join_count

__all__ = ["make_mesh", "shard_relation", "dist_join_count"]
