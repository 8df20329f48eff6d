from orca_tpu.data.genome import (  # noqa: F401
    CodeGenome,
    FastaGenome,
    MemmapGenome,
    sequence_to_encoding,
    encoding_to_codes,
)
