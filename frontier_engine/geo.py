"""Geo operators: haversine, GeoJSON points, geo-hierarchy flattening,
nearest-store top-k.

The reference *planned* haversine/nearest-store (0-byte placeholder files
geo/haversine.py, geo/nearest_store.py — SURVEY.md C16) and ships GeoJSON
conversion (db/__init__.py:66-74, update_stores_geocode.py:20-31) and the
3-level city→district→ward merge (cooponline.py:362-378,
fetch_branches.py:9-24). All built-in trig / joins — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km, JVM-side trig (whole-stage codegen)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geojson_point(lng: Column, lat: Column) -> Column:
    """K2: {type: "Point", coordinates: [lng, lat]} (db/__init__.py:68-71)."""
    return F.struct(
        F.lit("Point").alias("type"),
        F.array(lng.cast("double"), lat.cast("double")).alias("coordinates"),
    )


def flatten_geo_hierarchy(
    cities: DataFrame, districts: DataFrame, wards: DataFrame
) -> DataFrame:
    """J2: city ⋈ district ⋈ ward with left-outer ward semantics (missing
    districts → empty wards, cooponline.py:362-378). Small dims → broadcast.
    """
    return (
        cities.join(F.broadcast(districts), "city_id", "inner")
        .join(F.broadcast(wards), "district_id", "left")
    )


def nest_geo_hierarchy(flat: DataFrame) -> DataFrame:
    """E5 nested form: one row per city with a ``map<district_name,
    array<ward_name>>`` column — the document shape the reference stores in
    Mongo (cooponline.py:362-378 builds exactly this dict-of-lists).

    Input: the flattened join from :func:`flatten_geo_hierarchy` with
    columns (city_id, district, ward). Missing wards (left-outer nulls)
    become empty arrays, preserving the reference's empty-district
    semantics.
    """
    per_district = flat.groupBy("city_id", "district").agg(
        F.sort_array(
            F.collect_list(F.col("ward"))
        ).alias("wards")  # collect_list drops nulls → ward-less district = []
    )
    return per_district.groupBy("city_id").agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(F.struct(F.col("district"), F.col("wards")))
            )
        ).alias("districts")
    )


def unnest_geo_hierarchy(nested: DataFrame) -> DataFrame:
    """Inverse of :func:`nest_geo_hierarchy`: explode the map back to flat
    (city_id, district, ward) rows; empty ward arrays round-trip
    to a single null-ward row (the left-outer shape)."""
    d = nested.select(
        "city_id", F.explode(F.col("districts")).alias("district", "wards")
    )
    return d.select(
        "city_id",
        "district",
        F.explode_outer(F.col("wards")).alias("ward"),
    )


def nearest_stores(
    points: DataFrame, stores: DataFrame, k: int = 1,
    point_key: str = "point_id",
) -> DataFrame:
    """C16: top-k nearest stores per point. Broadcast the store dimension
    (it is small — 146 rows in the reference corpus), compute haversine on
    the crossed pairs, window top-k. No shuffle of the big side beyond the
    final per-point window."""
    crossed = points.crossJoin(
        F.broadcast(
            stores.select(
                F.col("store_id"),
                F.col("lat").alias("_s_lat"),
                F.col("lon").alias("_s_lon"),
            )
        )
    ).withColumn(
        "distance_km",
        haversine_km(F.col("lat"), F.col("lon"), F.col("_s_lat"), F.col("_s_lon")),
    )
    w = Window.partitionBy(point_key).orderBy(
        F.col("distance_km").asc(), F.col("store_id").asc()
    )
    return (
        crossed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("_s_lat", "_s_lon")
    )
