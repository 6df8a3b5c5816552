"""The 14 graph primitives (role of reference include/gunrock/algorithms/).

Each module exposes the reference's per-algorithm API shape
(algorithms/bfs.hxx:162-215): a ``Param``/``Result`` pair and a
``run(graph, ...) -> Result`` entry point returning elapsed milliseconds,
plus pure jit/vmap-friendly kernels for composition.
"""

from gunrock_tpu.algorithms import bfs  # noqa: F401
from gunrock_tpu.algorithms import sssp  # noqa: F401
from gunrock_tpu.algorithms import pr  # noqa: F401
from gunrock_tpu.algorithms import spmv  # noqa: F401
from gunrock_tpu.algorithms import hits  # noqa: F401
from gunrock_tpu.algorithms import color  # noqa: F401
from gunrock_tpu.algorithms import kcore  # noqa: F401
from gunrock_tpu.algorithms import tc  # noqa: F401
from gunrock_tpu.algorithms import bc  # noqa: F401
from gunrock_tpu.algorithms import ppr  # noqa: F401
from gunrock_tpu.algorithms import mst  # noqa: F401
from gunrock_tpu.algorithms import geo  # noqa: F401
from gunrock_tpu.algorithms import spgemm  # noqa: F401
