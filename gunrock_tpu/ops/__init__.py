from gunrock_tpu.ops.configs import (  # noqa: F401
    LoadBalance,
    AdvanceDirection,
    AdvanceIO,
    FilterAlgorithm,
    UniquifyAlgorithm,
)
from gunrock_tpu.ops.advance import advance, edge_map_reduce  # noqa: F401
from gunrock_tpu.ops.filter import filter_mask, filter_queue  # noqa: F401
from gunrock_tpu.ops.parallel_for import for_each_vertex, for_each_edge  # noqa: F401
from gunrock_tpu.ops.uniquify import uniquify  # noqa: F401
from gunrock_tpu.ops.neighbor_reduce import neighbor_reduce  # noqa: F401
from gunrock_tpu.ops.batch import batch  # noqa: F401
