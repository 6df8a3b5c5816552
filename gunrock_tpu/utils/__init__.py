from gunrock_tpu.utils.limits import (  # noqa: F401
    invalid,
    is_valid,
    INVALID_VERTEX,
    INVALID_EDGE,
)
