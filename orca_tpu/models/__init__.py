from orca_tpu.models import convert, zoo  # noqa: F401
