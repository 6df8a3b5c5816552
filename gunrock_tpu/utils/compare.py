"""Device vs host result comparison.

Role of reference ``util::compare`` (include/gunrock/util/compare.hxx:38-57):
count mismatches between a computed device array and a host reference,
under an optional custom error predicate — the workhorse of every
``--validate`` path.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def compare(
    result,
    reference,
    error_op: Callable | None = None,
    verbose: bool = False,
    atol: float = 1e-4,
) -> int:
    """Return the number of mismatching positions.

    ``error_op(computed, reference) -> bool ndarray`` marks errors; the
    default treats NaN==NaN as equal and floats within ``atol``/1e-4
    relative as equal (the tolerance-based comparison the reference uses
    for nondeterministic float accumulations, SURVEY.md section 5).
    """
    a = np.asarray(result)
    b = np.asarray(reference)
    if error_op is not None:
        errors = error_op(a, b)
    elif np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
        both_nan = np.isnan(a.astype(float)) & np.isnan(b.astype(float))
        both_inf = np.isinf(a.astype(float)) & np.isinf(b.astype(float))
        close = np.isclose(a, b, rtol=1e-4, atol=atol)
        errors = ~(close | both_nan | both_inf)
    else:
        errors = a != b
    n = int(np.sum(errors))
    if verbose and n:
        idx = np.nonzero(errors)[0][:10]
        for i in idx:
            print(f"  mismatch at {i}: computed={a[i]} reference={b[i]}")
    return n
