"""CLI parameter system for example drivers.

Role of reference ``io::cli::parameters_t`` (include/gunrock/io/
parameters.hxx:16-295): the flag set every example binary accepts —
``--market/--src/--num_runs/--validate/--export_metrics/--json_dir/
--json_file/--tag`` plus the operator-selection flags
(``--advance_load_balance/--filter_algorithm/--enable_filter/
--enable_uniquify/--uniquify_algorithm/--best_effort_uniquify/
--uniquify_percent``) — with string->enum parsing into ``Options``,
random-source generation when ``--src`` is omitted
(parameters.hxx:188-215), and comma-separated source/tag lists.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

import numpy as np

from gunrock_tpu.ops.configs import (
    AdvanceDirection,
    FilterAlgorithm,
    LoadBalance,
    Options,
    UniquifyAlgorithm,
)

_SOURCED = ("bfs", "sssp", "bc", "ppr")
_VALIDATED = ("bfs", "sssp", "pr", "spmv", "tc", "kcore", "color", "mst", "hits", "spgemm")


@dataclasses.dataclass
class Parameters:
    filename: str
    sources: list
    num_runs: int
    validate: bool
    export_metrics: bool
    json_dir: str
    json_file: str
    tags: list
    options: Options
    binary: bool
    extra: argparse.Namespace
    # set by examples.runner.load when --reorder is active
    # (graph/reorder.py Reordering); drivers map sources/results with
    # runner.map_sources / runner.to_original
    reordering: object = None


def build_parser(algorithm: str, extra_args=None) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog=f"gunrock_tpu {algorithm}",
        description=f"{algorithm} example (TPU-native gunrock)",
    )
    p.add_argument("-m", "--market", required=True, help="Matrix file (.mtx/.csr/.smtx)")
    p.add_argument("--export_metrics", action="store_true",
                   help="export performance analysis metrics")
    p.add_argument("-d", "--json_dir", default=".", help="JSON output directory")
    p.add_argument("-f", "--json_file", default="", help="JSON output file")
    p.add_argument("-t", "--tag", default="",
                   help="comma-separated tags for the JSON output")
    p.add_argument("--advance_load_balance", default="default",
                   help="advance strategy (thread_mapped, block_mapped, "
                   "merge_path, xla_segment, pallas_merge_path, bucketing; "
                   "'default' picks the backend-tuned strategy)")
    p.add_argument("--advance_direction", default="default",
                   help="advance direction (forward, backward, optimized; "
                   "'default' picks per backend)")
    p.add_argument("--filter_algorithm", default="bypass",
                   help="filter algorithm (remove, predicated, compact, bypass)")
    p.add_argument("--enable_filter", action="store_true")
    p.add_argument("--enable_uniquify", action="store_true")
    p.add_argument("--uniquify_algorithm", default="scatter",
                   help="uniquify algorithm (unique, unique_copy, scatter)")
    p.add_argument("--best_effort_uniquify", action="store_true")
    p.add_argument("--uniquify_percent", type=float, default=100.0)
    p.add_argument("-n", "--num_runs", type=int, default=1)
    p.add_argument("--reorder", default="none", choices=("none", "degree"),
                   help="vertex relabeling before execution (degree = "
                   "hub-first degree sort, graph/reorder.py — concentrates "
                   "edges into dense bucket windows for the TPU Pallas "
                   "kernels; --src ids and printed results stay in the "
                   "input id space). No reference counterpart.")
    p.add_argument("--devices", type=int, default=0,
                   help="run distributed over an N-device mesh "
                   "(vertex-sharded shard_map path); 0/1 = single chip. "
                   "The capability the reference scaffolds but rejects "
                   "(advance.hxx:129-132 throws on multi-GPU)")
    if algorithm in _SOURCED:
        p.add_argument("-s", "--src", default="",
                       help="source(s), comma-separated; random if omitted")
    p.add_argument("--validate", action="store_true", help="CPU validation")
    for args, kwargs in (extra_args or []):
        p.add_argument(*args, **kwargs)
    return p


def parse_source_string(source_str: str, n_vertices: int, n_runs: int) -> list[int]:
    """Reference parameters.hxx:188-215 semantics."""
    if not source_str:
        rng = np.random.default_rng()
        return [int(rng.integers(0, n_vertices)) for _ in range(n_runs)]
    sources = []
    for tok in source_str.split(","):
        try:
            s = int(tok)
        except ValueError:
            print("Error: Invalid source")
            sys.exit(1)
        if not 0 <= s < n_vertices:
            print("Error: Invalid source")
            sys.exit(1)
        sources.append(s)
    if len(sources) == 1:
        sources = sources * n_runs
    return sources


def parse_tag_string(tag_str: str) -> list[str]:
    return [t for t in tag_str.split(",") if t]


def parse(algorithm: str, argv=None, extra_args=None) -> Parameters:
    parser = build_parser(algorithm, extra_args)
    ns = parser.parse_args(argv)
    from gunrock_tpu.ops.configs import default_options

    auto = default_options()
    options = Options(
        load_balance=auto.load_balance
        if ns.advance_load_balance == "default"
        else LoadBalance.parse(ns.advance_load_balance),
        advance_direction=auto.advance_direction
        if ns.advance_direction == "default"
        else AdvanceDirection(ns.advance_direction),
        filter_algorithm=FilterAlgorithm.parse(ns.filter_algorithm),
        uniquify_algorithm=UniquifyAlgorithm(ns.uniquify_algorithm)
        if ns.uniquify_algorithm in [u.value for u in UniquifyAlgorithm]
        else UniquifyAlgorithm.SCATTER,
        enable_filter=ns.enable_filter,
        enable_uniquify=ns.enable_uniquify,
        best_effort_uniquify=ns.best_effort_uniquify,
        uniquify_percent=ns.uniquify_percent,
    )
    from gunrock_tpu.io.loader import is_binary_csr

    return Parameters(
        filename=ns.market,
        sources=getattr(ns, "src", ""),
        num_runs=ns.num_runs,
        validate=ns.validate,
        export_metrics=ns.export_metrics,
        json_dir=ns.json_dir,
        json_file=ns.json_file,
        tags=parse_tag_string(ns.tag),
        options=options,
        binary=is_binary_csr(ns.market),
        extra=ns,
    )
