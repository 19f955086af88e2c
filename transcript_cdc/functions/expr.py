"""Expression-level helpers shared by the vectorized text/vector functions.

Higher-order array functions (transform/filter/aggregate) run outside
whole-stage codegen, so Catalyst's subexpression elimination does NOT dedup
a subtree referenced from several lambda bodies — each reference re-evaluates
it. For expressions like a minhash signature (K permutations over one shingle
array) that turns O(shingles) into O(K·shingles·cost(shingles)). The fix is a
let-binding: wrap the shared subtree in a 1-element array and bind it to a
lambda variable, which Spark evaluates exactly once per row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(expr: Column, body: Callable[[Column], Column]) -> Column:
    """``let x = expr in body(x)`` for Spark expressions.

    ``transform`` evaluates its input array once, then evaluates the lambda
    with the element bound to a variable — so every reference to ``x``
    inside ``body`` reuses the single evaluation instead of re-evaluating
    ``expr``. Cost: one 1-element array allocation per row.
    """
    return F.element_at(F.transform(F.array(expr), body), 1)
