"""Hypothesis example budget for the property layers.

The driver's verify gate runs the WHOLE suite inside a fixed budget;
the round-9 run was truncated at ~68% with zero failures (the full
suite had grown to ~44 min, mostly hypothesis examples that each pay
Spark job round-trips). The default profile scales every authored
``max_examples`` down 4x (floor 3) so the gate completes; the authored
counts stay available for thorough pre-commit runs via::

    SPARK_GRAFT_HYPOTHESIS=full python -m pytest tests/

Scaling the authored numbers (instead of a global hypothesis profile)
keeps each test's RELATIVE budget — tests the authors gave 30 examples
still get proportionally more exploration than tests given 8.
"""

import os

HYPOTHESIS_FULL = os.environ.get("SPARK_GRAFT_HYPOTHESIS", "fast") == "full"


def hypo_examples(n: int) -> int:
    """Effective max_examples for an authored budget of ``n``."""
    return n if HYPOTHESIS_FULL else max(3, n // 4)
