"""Graph properties and view flags.

Role of reference include/gunrock/graph/properties.hxx:14-31:
``graph_properties_t`` {directed, weighted, symmetric} plus the ``view_t``
bitflag enum selecting which format views a graph carries.
"""

from __future__ import annotations

import dataclasses
import enum


class View(enum.Flag):
    """Which format views the graph materializes (reference view_t,
    graph/properties.hxx:26-31)."""

    CSR = enum.auto()
    CSC = enum.auto()
    COO = enum.auto()


@dataclasses.dataclass(frozen=True, eq=True)
class GraphProperties:
    directed: bool = True
    weighted: bool = False
    symmetric: bool = False
    # Hub-first vertex order (graph/reorder.degree_sort). No reference
    # counterpart: tunes the direction-optimized edge-budget defaults —
    # with hub locality the doubly-masked Pallas pull is cheap enough
    # that a much smaller push budget wins (s18 degsort sweep: E/256
    # 53.3 ms vs E/64 66.7 ms).
    hub_ordered: bool = False
