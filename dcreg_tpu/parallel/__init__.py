"""Multi-chip scale-out: mesh construction + sharded registration.

See ``sharded.py`` for the SPMD design (data axis = source points, map axis
= target map blocks; psum'd 6x6 GN reduction).
"""
from .sharded import (ShardedICPResult, factor_mesh, make_mesh,
                      pad_for_mesh, shard_points, sharded_icp_register)

__all__ = ["ShardedICPResult", "factor_mesh", "make_mesh", "pad_for_mesh",
           "shard_points", "sharded_icp_register"]
