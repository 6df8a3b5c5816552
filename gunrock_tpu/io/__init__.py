from gunrock_tpu.io.matrix_market import load_matrix_market  # noqa: F401
from gunrock_tpu.io.smtx import load_smtx  # noqa: F401
from gunrock_tpu.io import sample  # noqa: F401
from gunrock_tpu.io.loader import load_graph_file  # noqa: F401
