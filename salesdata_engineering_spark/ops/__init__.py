"""Operator library — one module per SURVEY §2 category.

Every operator is a pure ``DataFrame -> DataFrame`` (or Column) function:
no hidden session state, no actions, fully lazy so Catalyst sees the whole
plan and can push filters/prune columns across operator boundaries.
"""

from . import aggregations, joins, projections, setops, sorts, windows  # noqa: F401
