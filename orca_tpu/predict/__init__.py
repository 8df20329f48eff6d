from orca_tpu.predict.multiscale import genomepredict, genomepredict_256mb  # noqa: F401
from orca_tpu.predict.structural import StructuralChange  # noqa: F401
