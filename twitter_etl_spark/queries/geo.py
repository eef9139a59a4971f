"""Geospatial operators via grid blocking (SURVEY.md §2 [EXT]).

The fixture has no coordinates, so both engines derive
deterministic synthetic lat/lon from entity keys with the same
integer LCG-style expression (exact in int64, identical
cross-engine; the float division by 100 is exact for these
magnitudes).

- **grid-blocked distance join** (``q_geo_grid_join``): customers
  ("stores", a keyed subset) × suppliers ("warehouses") within
  ~111 km. The classic spatial-join-without-an-index shape: each
  store EXPLODES to its 3×3 neighborhood of 1°-grid cells, the join
  is EQUI on the cell id, and the exact haversine predicate runs
  only on co-celled candidates. At 100 TB this is the same plan —
  comparisons scale with local density, never |A|×|B| (a theta-join
  on raw distance is a cartesian product). The lon neighborhood
  wraps across the ±180° antimeridian (cell −181 ≡ 179) on both
  engines, so straddling pairs are candidates. Remaining caveat,
  shared by the oracle (both engines define the SAME blocked
  semantics): 1° of longitude is narrower than 111 km at high
  latitude, so east-west neighbors beyond the ±1-cell band are not
  candidates; production grids widen the lon neighborhood by
  ``ceil(1/cos(lat))`` cells (the brute-force-equality test shows
  the fixture has no such pair). Distances rounded at 4
  (`transcendental maths: sin/cos/asin differ in the last ulp
  across libm implementations; 1e-4 km = 10 cm absorbs that).
- **cell density** (``q_geo_cell_density``): top-20 densest cells —
  the heat-map / partition-sizing aggregate, pure integer exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table

EARTH_R_KM = 6371.0

#: radius for the distance join (about one grid degree at equator).
RADIUS_KM = 111.0


def _lat(key) -> F.Column:
    return ((key * 9301 + 49297) % 17000) / 100.0 - 85.0


def _lon(key) -> F.Column:
    return ((key * 7927 + 12345) % 36000) / 100.0 - 180.0


_SQL_LAT = "(((%(k)s * 9301 + 49297) %% 17000) / 100.0 - 85.0)"
_SQL_LON = "(((%(k)s * 7927 + 12345) %% 36000) / 100.0 - 180.0)"


def _haversine_km(lat1, lon1, lat2, lon2) -> F.Column:
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    return 2 * EARTH_R_KM * F.asin(F.sqrt(a))


def _stores(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").where(F.col("c_custkey") % 50 == 0)
    k = F.col("c_custkey")
    return c.select(
        F.col("c_custkey").alias("store_id"),
        _lat(k).alias("lat"),
        _lon(k).alias("lon"),
    )


def _warehouses(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    return s.select(
        F.col("s_suppkey").alias("wh_id"),
        _lat(k).alias("lat"),
        _lon(k).alias("lon"),
    )


def q_geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stores × warehouses within RADIUS_KM, via 1°-grid blocking."""
    st = _stores(spark, sf_dir)
    wh = _warehouses(spark, sf_dir)
    # store side explodes to its 3x3 cell neighborhood; warehouse
    # side keeps its own cell -> equi join on (cx, cy)
    st = st.select(
        "store_id",
        "lat",
        "lon",
        F.explode(
            F.sequence(
                F.floor("lat").cast("int") - 1,
                F.floor("lat").cast("int") + 1,
            )
        ).alias("cx"),
    ).select(
        "store_id",
        "lat",
        "lon",
        "cx",
        # wrap the lon neighborhood across the antimeridian: cell
        # -181 is cell 179 (and 180 is -180), so ±180°-straddling
        # pairs are join candidates; sin²(Δlon/2) is 360°-periodic,
        # so the haversine below needs no companion fix
        F.explode(
            F.transform(
                F.sequence(
                    F.floor("lon").cast("int") - 1,
                    F.floor("lon").cast("int") + 1,
                ),
                lambda c: F.pmod(c + 180, 360) - 180,
            )
        ).alias("cy"),
    )
    wh = wh.select(
        F.col("wh_id"),
        F.col("lat").alias("wlat"),
        F.col("lon").alias("wlon"),
        F.floor("lat").cast("int").alias("cx"),
        F.floor("lon").cast("int").alias("cy"),
    )
    d = _haversine_km(
        F.col("lat"), F.col("lon"), F.col("wlat"), F.col("wlon")
    )
    return (
        st.join(wh, ["cx", "cy"])
        .select(
            "store_id", "wh_id", F.round(d, 4).alias("dist_km")
        )
        .where(F.col("dist_km") <= RADIUS_KM)
    )


def q_geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 densest 1° cells over ALL customers (not the store
    subset): one projection + hash agg + TakeOrderedAndProject."""
    c = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    cells = c.select(
        F.floor(_lat(k)).cast("bigint").alias("cx"),
        F.floor(_lon(k)).cast("bigint").alias("cy"),
    )
    return (
        cells.groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "cx", "cy")
        .limit(20)
    )


QUERIES = {
    "q_geo_grid_join": q_geo_grid_join,
    "q_geo_cell_density": q_geo_cell_density,
}

_ST_LAT = _SQL_LAT % {"k": "c_custkey"}
_ST_LON = _SQL_LON % {"k": "c_custkey"}
_WH_LAT = _SQL_LAT % {"k": "s_suppkey"}
_WH_LON = _SQL_LON % {"k": "s_suppkey"}

_HAV = (
    "2 * {r} * asin(sqrt("
    "sin(radians(wlat - lat) / 2) * sin(radians(wlat - lat) / 2) "
    "+ cos(radians(lat)) * cos(radians(wlat)) "
    "* sin(radians(wlon - lon) / 2) * sin(radians(wlon - lon) / 2)))"
).format(r=EARTH_R_KM)

ORACLE = {
    "q_geo_grid_join": (
        "WITH st AS (SELECT c_custkey AS store_id, "
        + _ST_LAT + " AS lat, " + _ST_LON + " AS lon "
        "FROM customer WHERE c_custkey % 50 = 0), "
        "wh AS (SELECT s_suppkey AS wh_id, "
        + _WH_LAT + " AS wlat, " + _WH_LON + " AS wlon "
        "FROM supplier) "
        "SELECT store_id, wh_id, round(" + _HAV + ", 4) AS dist_km "
        "FROM st JOIN wh ON floor(wlat) BETWEEN floor(lat) - 1 "
        "AND floor(lat) + 1 "
        # modular cell difference: 0/1/359 = same/east/west neighbor,
        # wrapping across the antimeridian like the Spark pmod cell
        "AND (floor(wlon)::INT - floor(lon)::INT + 720) % 360 IN (0, 1, 359) "
        "WHERE round(" + _HAV + ", 4) <= %s" % RADIUS_KM
    ),
    "q_geo_cell_density": (
        "SELECT floor(" + _ST_LAT + ")::BIGINT AS cx, "
        "floor(" + _ST_LON + ")::BIGINT AS cy, "
        "count(*) AS n FROM customer GROUP BY cx, cy "
        "ORDER BY n DESC, cx, cy LIMIT 20"
    ),
}


#: neighbors returned per store by the grid-blocked kNN.
KNN_K = 3


def q_geo_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked k-nearest-neighbor join: each store's 3 nearest
    warehouses among its 3×3 cell neighborhood — the spatial
    serving-assignment primitive (nearest depot / store coverage).

    Same candidate generation as ``q_geo_grid_join`` (explode to the
    wrapped neighborhood, EQUI join on the cell — never |A|×|B|),
    then a per-store row_number over (rounded distance, wh_id): the
    rounding absorbs libm's last-ulp transcendental differences and
    the id tie-break makes the cut a total order, so both engines
    pick identical neighbors. Stores whose neighborhood holds fewer
    than k candidates return fewer rows — the stated blocked
    semantics (production systems expand rings until k; the fixture
    density makes that loop unnecessary here). The ranking window
    partitions by store_id — no global sort; cost scales with local
    density exactly like the grid join."""
    from pyspark.sql import Window

    st = _stores(spark, sf_dir)
    wh = _warehouses(spark, sf_dir)
    st = st.select(
        "store_id",
        "lat",
        "lon",
        F.explode(
            F.sequence(
                F.floor("lat").cast("int") - 1,
                F.floor("lat").cast("int") + 1,
            )
        ).alias("cx"),
    ).select(
        "store_id",
        "lat",
        "lon",
        "cx",
        F.explode(
            F.transform(
                F.sequence(
                    F.floor("lon").cast("int") - 1,
                    F.floor("lon").cast("int") + 1,
                ),
                lambda c: F.pmod(c + 180, 360) - 180,
            )
        ).alias("cy"),
    )
    wh = wh.select(
        F.col("wh_id"),
        F.col("lat").alias("wlat"),
        F.col("lon").alias("wlon"),
        F.floor("lat").cast("int").alias("cx"),
        F.floor("lon").cast("int").alias("cy"),
    )
    d = _haversine_km(F.col("lat"), F.col("lon"), F.col("wlat"), F.col("wlon"))
    cand = st.join(wh, ["cx", "cy"]).select(
        "store_id", "wh_id", F.round(d, 4).alias("dist_km")
    )
    w = Window.partitionBy("store_id").orderBy("dist_km", "wh_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KNN_K)
        .select("store_id", "wh_id", "dist_km", F.col("rn").alias("rank"))
    )


QUERIES["q_geo_knn"] = q_geo_knn
ORACLE["q_geo_knn"] = (
    "WITH st AS (SELECT c_custkey AS store_id, "
    + _ST_LAT + " AS lat, " + _ST_LON + " AS lon "
    "FROM customer WHERE c_custkey % 50 = 0), "
    "wh AS (SELECT s_suppkey AS wh_id, "
    + _WH_LAT + " AS wlat, " + _WH_LON + " AS wlon "
    "FROM supplier), "
    "cand AS (SELECT store_id, wh_id, round(" + _HAV + ", 4) AS dist_km "
    "  FROM st JOIN wh ON floor(wlat) BETWEEN floor(lat) - 1 "
    "  AND floor(lat) + 1 "
    "  AND (floor(wlon)::INT - floor(lon)::INT + 720) %% 360 IN (0, 1, 359)), "
    "r AS (SELECT *, row_number() OVER ("
    "  PARTITION BY store_id ORDER BY dist_km, wh_id) AS rn FROM cand) "
    "SELECT store_id, wh_id, dist_km, rn AS rank FROM r WHERE rn <= %d" % KNN_K
)
