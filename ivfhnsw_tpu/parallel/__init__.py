from ivfhnsw_tpu.parallel.mesh import make_mesh  # noqa: F401
from ivfhnsw_tpu.parallel.sharded import ShardedIVFADC  # noqa: F401
from ivfhnsw_tpu.parallel.sharded_grouping import ShardedGrouping  # noqa: F401
