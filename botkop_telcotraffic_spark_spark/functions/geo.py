"""Geospatial predicates as pure JVM column expressions.

The reference calls an external library for point-in-polygon
(``GeoUtil.containsLocation`` at
``/root/reference/src/main/scala/traffic/process/Geofencer.scala:30``).
Here the standard even-odd ray-casting test is expressed with Catalyst
higher-order functions (``filter`` over the polygon's edge indices),
so the spatial theta-join J3 runs entirely inside whole-stage codegen
— no Python, no UDF, broadcast-friendly.

Edge cases: horizontal edges (y_i == y_j) make the crossing test's
first conjunct false, so the division-by-zero branch is never *used*;
Spark yields ±Infinity and DuckDB yields NULL for x/0.0, and both
collapse to false under ``AND false`` — semantics agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def point_in_polygon(
    px: Column,
    py: Column,
    polygon: Column,
    x_field: str = "lng",
    y_field: str = "lat",
) -> Column:
    """Even-odd ray-casting containment.

    ``polygon`` is ``array<struct<lat:double, lng:double>>`` (field
    names configurable).  Returns a boolean column: true iff point
    (px, py) is inside.  Vertices are not required to repeat the first
    point; edges wrap around via modular indexing.
    """
    n = F.size(polygon)

    def crossing(i: Column) -> Column:
        vi = F.element_at(polygon, i + 1)
        vj = F.element_at(polygon, F.pmod(i + 1, n) + 1)
        xi, yi = vi[x_field], vi[y_field]
        xj, yj = vj[x_field], vj[y_field]
        return ((yi > py) != (yj > py)) & (
            px < (xj - xi) * (py - yi) / (yj - yi) + xi
        )

    crossings = F.filter(F.sequence(F.lit(0), n - 1), crossing)
    return F.size(crossings) % 2 == 1
