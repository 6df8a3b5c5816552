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
