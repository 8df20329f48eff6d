from orca_tpu.parallel.mesh import make_mesh  # noqa: F401
from orca_tpu.parallel.sequence import sharded_encoder_tower  # noqa: F401
