from orca_tpu.nn.core import Unit, Block, init_block, apply_block, BNUpdates  # noqa: F401
from orca_tpu.nn import encoders, decoders  # noqa: F401
