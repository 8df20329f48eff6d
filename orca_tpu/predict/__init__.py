"""User-facing prediction API — the orca_tpu equivalent of the reference's
`orca_predict` module surface (orca_predict.py): `load_resources`, the
multiscale predictors, and the `process_*` variant pipelines.

    from orca_tpu import predict
    predict.load_resources(models=["32M"])
    predict.process_region("chr9", 94904000, 126904000, ...)
"""

from orca_tpu.predict.multiscale import (  # noqa: F401
    genomepredict,
    genomepredict_256mb,
)
from orca_tpu.predict.pipelines import (  # noqa: F401
    process_anno,
    process_custom,
    process_del,
    process_dup,
    process_ins,
    process_inv,
    process_region,
    process_seqstr,
    process_single_breakpoint,
)
from orca_tpu.predict.resources import load_resources  # noqa: F401
from orca_tpu.predict.structural import StructuralChange  # noqa: F401
