"""Postal-code boundary ingestion: Overpass elements → centroid table.

Re-expresses the reference's S2 source (`scripts/load_postal_codes_berlin.py:
19-62`) Spark-first. The reference fetches Overpass JSON, then per `way`
element: requires a `postal_code` tag and >= 3 geometry vertices, CLOSES an
open ring (first vertex appended when first != last, lines 45-46), wraps it
as a GeoJSON MultiPolygon, and inserts with `ON CONFLICT (postal_code) DO
NOTHING` (first element wins). `relation` elements are skipped (lines
55-60). Downstream the geometry is only ever used via `ST_Centroid`
(`src/transformation/aggregation.py:94-107`), so our engine stores the
centroid directly (SURVEY §1.1).

Spark-first split of responsibilities:
- the HTTP fetch stays driver-side (wrap it in ``sources.retry.with_retry``
  — the reference uses requests without retry here; we give it the same
  schedule as the weather fetch)
- everything from the raw elements onward is a DataFrame plan: ring
  closing, validity filter, first-wins dedup, and the area-weighted
  (shoelace) centroid are all JVM-side higher-order-function expressions,
  so a planet-scale Overpass extract distributes instead of looping on the
  driver.

Centroid semantics: ST_Centroid of a polygon is the area-weighted centroid
(shoelace formula), NOT the vertex mean — for a ring with a dense vertex
run along one edge the two differ materially. Degenerate rings (zero
area: collinear vertices) fall back to the vertex mean of the distinct
vertices, matching PostGIS's point-collapse behavior closely enough for
centroid-distance use.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_RING_SCHEMA = T.StructType(
    [
        T.StructField("element_idx", T.LongType()),
        T.StructField("element_type", T.StringType()),
        T.StructField("postal_code", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField(
            "ring",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("lon", T.DoubleType()),
                        T.StructField("lat", T.DoubleType()),
                    ]
                )
            ),
        ),
    ]
)


def overpass_elements_df(spark: SparkSession, elements: list[dict[str, Any]]) -> DataFrame:
    """Raw Overpass `elements` (parsed JSON, driver-side — the fetch result)
    → one row per element with its vertex ring, untouched. Index preserves
    input order for the first-wins conflict rule."""
    rows = []
    for i, el in enumerate(elements):
        tags = el.get("tags", {}) or {}
        geom = el.get("geometry") or []
        rows.append(
            (
                i,
                el.get("type"),
                tags.get("postal_code"),
                tags.get("name", ""),
                tags.get("state", ""),
                [(float(c["lon"]), float(c["lat"])) for c in geom],
            )
        )
    return spark.createDataFrame(rows, RAW_RING_SCHEMA)


def close_rings(df: DataFrame, ring_col: str = "ring") -> DataFrame:
    """Ring repair (reference lines 45-46): append the first vertex when the
    ring is open (first != last). Well-formed rings pass through unchanged."""
    r = F.col(ring_col)
    closed = F.when(
        (F.size(r) >= 3) & (F.element_at(r, 1) != F.element_at(r, -1)),
        F.concat(r, F.array(F.element_at(r, 1))),
    ).otherwise(r)
    return df.withColumn(ring_col, closed)


def _shoelace_centroid(ring):
    """(centroid_lon, centroid_lat) struct for a CLOSED ring via the
    shoelace formula; zero-area rings fall back to the distinct-vertex mean.

    cross_i = x_i * y_{i+1} - x_{i+1} * y_i summed over consecutive vertex
    pairs; area = cross/2; C = Σ (v_i + v_{i+1}) * cross_i / (6 * area).
    All arithmetic is JVM-side fold expressions — no UDFs."""
    n = F.size(ring)
    idx = F.sequence(F.lit(1), n - 1)  # pairs (i, i+1), 1-based

    def cross(i):
        a, b = F.element_at(ring, i), F.element_at(ring, i + 1)
        return a["lon"] * b["lat"] - b["lon"] * a["lat"]

    def wsum(coord):
        return F.aggregate(
            idx,
            F.lit(0.0),
            lambda acc, i: acc
            + (
                F.element_at(ring, i)[coord]
                + F.element_at(ring, i + F.lit(1))[coord]
            )
            * (
                F.element_at(ring, i)["lon"]
                * F.element_at(ring, i + F.lit(1))["lat"]
                - F.element_at(ring, i + F.lit(1))["lon"]
                * F.element_at(ring, i)["lat"]
            ),
        )

    cross2 = F.aggregate(idx, F.lit(0.0), lambda acc, i: acc + cross(i))
    # distinct vertices (drop the duplicated closing vertex) for the
    # degenerate fallback
    distinct = F.array_distinct(ring)
    mean = lambda coord: (  # noqa: E731
        F.aggregate(
            distinct, F.lit(0.0), lambda acc, v: acc + v[coord]
        )
        / F.size(distinct)
    )
    degenerate = F.abs(cross2) < 1e-12
    clon = F.when(degenerate, mean("lon")).otherwise(wsum("lon") / (3.0 * cross2))
    clat = F.when(degenerate, mean("lat")).otherwise(wsum("lat") / (3.0 * cross2))
    return clon.alias("centroid_lon"), clat.alias("centroid_lat")


def postal_centroids_from_overpass(
    spark: SparkSession, elements: list[dict[str, Any]]
) -> DataFrame:
    """Full S2 hop: Overpass elements → (postal_code, city, state,
    centroid_lat, centroid_lon), one row per postal code.

    Filters exactly as the reference does: `way` elements only (relations
    skipped), `postal_code` tag present, >= 3 vertices; open rings are
    closed; duplicate postal codes resolve first-element-wins
    (ON CONFLICT DO NOTHING under insertion order)."""
    raw = overpass_elements_df(spark, elements)
    valid = raw.filter(
        (F.col("element_type") == "way")
        & F.col("postal_code").isNotNull()
        & (F.size("ring") >= 3)
    )
    closed = close_rings(valid)
    clon, clat = _shoelace_centroid(F.col("ring"))
    with_cent = closed.select(
        "element_idx", "postal_code", "city", "state", clat, clon
    )
    w = Window.partitionBy("postal_code").orderBy("element_idx")
    return (
        with_cent.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("postal_code", "city", "state", "centroid_lat", "centroid_lon")
    )
