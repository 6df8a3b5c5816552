from gunrock_tpu.framework.frontier import (  # noqa: F401
    DenseFrontier,
    QueueFrontier,
    mask_to_queue,
    queue_to_mask,
)
from gunrock_tpu.framework.enactor import Enactor  # noqa: F401
from gunrock_tpu.framework.problem import Problem  # noqa: F401
