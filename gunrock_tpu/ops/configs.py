"""Operator configuration enums.

Role of reference include/gunrock/framework/operators/configs.hxx:52-112 —
operator strategy is a *runtime-configurable axis of the public API*
(selected by CLI flags and threaded through every algorithm via
``Options``), not just an implementation detail.

TPU mapping of the reference's load-balancing strategies:

- ``thread_mapped``/``block_mapped``/``merge_path`` GPU kernels collapse
  into two TPU strategies: ``XLA_SEGMENT`` (vectorized gather + sorted
  segmented reduction — XLA schedules the irregularity) and
  ``PALLAS_MERGE_PATH`` (explicit fixed-work-per-tile Pallas kernel over
  HBM-resident CSR, the analog of merge_path_v2.hxx).
"""

from __future__ import annotations

import dataclasses
import enum


class LoadBalance(enum.Enum):
    XLA_SEGMENT = "xla_segment"  # default: gather + sorted segment reduce
    PALLAS_MERGE_PATH = "pallas_merge_path"  # Pallas fixed-work tiles
    BUCKETING = "bucketing"  # delta-stepping buckets (Davidson SSSP —
    # the strategy the reference stubs at advance/bucketing.hxx)
    # Aliases accepted for CLI parity with the reference flag values
    # (io/parameters.hxx:244-291):
    THREAD_MAPPED = "thread_mapped"
    BLOCK_MAPPED = "block_mapped"
    MERGE_PATH = "merge_path"

    @staticmethod
    def parse(name: str) -> "LoadBalance":
        name = name.strip().lower()
        aliases = {
            "thread_mapped": LoadBalance.XLA_SEGMENT,
            "block_mapped": LoadBalance.XLA_SEGMENT,
            "merge_path": LoadBalance.PALLAS_MERGE_PATH,
            "merge_path_v2": LoadBalance.PALLAS_MERGE_PATH,
            "xla_segment": LoadBalance.XLA_SEGMENT,
            "pallas_merge_path": LoadBalance.PALLAS_MERGE_PATH,
            "bucketing": LoadBalance.BUCKETING,
        }
        if name not in aliases:
            raise ValueError(f"unknown load balance strategy {name!r}")
        return aliases[name]


class AdvanceDirection(enum.Enum):
    """Reference advance_direction_t (configs.hxx:78-82)."""

    FORWARD = "forward"  # expand along out-edges, reduce at destinations
    BACKWARD = "backward"  # pull along out-edges from frontier, reduce at sources
    OPTIMIZED = "optimized"  # direction-optimizing (choose per iteration)


class AdvanceIO(enum.Enum):
    """Reference advance_io_type_t (configs.hxx:66-71)."""

    GRAPH = "graph"  # input = all vertices
    VERTICES = "vertices"
    EDGES = "edges"
    NONE = "none"  # no output frontier


class FilterAlgorithm(enum.Enum):
    """Reference filter_algorithm_t (configs.hxx:85-92)."""

    BYPASS = "bypass"  # mark-invalid in place, no compaction
    PREDICATED = "predicated"  # compaction (copy_if analog)
    REMOVE = "remove"  # remove_copy_if analog (same as predicated here)

    @staticmethod
    def parse(name: str) -> "FilterAlgorithm":
        name = name.strip().lower()
        aliases = {
            "bypass": FilterAlgorithm.BYPASS,
            "predicated": FilterAlgorithm.PREDICATED,
            "remove": FilterAlgorithm.REMOVE,
            "compact": FilterAlgorithm.PREDICATED,  # dead in reference too
        }
        if name not in aliases:
            raise ValueError(f"unknown filter algorithm {name!r}")
        return aliases[name]


class UniquifyAlgorithm(enum.Enum):
    """Reference uniquify_algorithm_t (configs.hxx:95-99)."""

    UNIQUE = "unique"  # sort + adjacent dedup (exact)
    UNIQUE_COPY = "unique_copy"
    SCATTER = "scatter"  # mask round-trip dedup (exact, TPU-preferred)


def default_options() -> "Options":
    """Best-measured strategy defaults for the attached backend: on TPU
    the Pallas bucketed kernels and direction-optimized traversal win by
    2-4.5x (see CLAUDE.md measurements); on CPU the XLA segment path wins
    (Pallas would run interpreted). The reference's analog is the user
    picking per-GPU operator flags; here the launch-table layer picks."""
    import jax

    if jax.default_backend() in ("cpu", "gpu"):
        return Options()
    return Options(
        load_balance=LoadBalance.PALLAS_MERGE_PATH,
        advance_direction=AdvanceDirection.OPTIMIZED,
    )


@dataclasses.dataclass
class Options:
    """Runtime operator-strategy configuration threaded through every
    algorithm's ``run()`` (role of reference algorithms/algorithms.hxx:27-72
    ``options_t``)."""

    load_balance: LoadBalance = LoadBalance.XLA_SEGMENT
    advance_direction: AdvanceDirection = AdvanceDirection.FORWARD
    filter_algorithm: FilterAlgorithm = FilterAlgorithm.BYPASS
    uniquify_algorithm: UniquifyAlgorithm = UniquifyAlgorithm.SCATTER
    enable_filter: bool = True
    enable_uniquify: bool = False
    best_effort_uniquify: bool = False
    uniquify_percent: float = 100.0
    max_iterations: int = 0  # 0 = algorithm default
