from .batch import TrajectoryBatch, BatchResults, stack_trajectories, sample_batch  # noqa: F401
from .mesh import make_mesh, shard_batch  # noqa: F401
