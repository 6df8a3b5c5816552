"""Per-algorithm CLI drivers (role of reference examples/algorithms/).

Run as modules, mirroring the reference example binaries::

    python -m gunrock_tpu.examples.bfs --market graph.mtx --src 0 --validate
    python -m gunrock_tpu.examples.pr --market graph.mtx --export_metrics
"""
