"""Region registry dimension table (code → slug / continent / name).

The reference ships ``iso2geofabrik.json`` (176 entries, ISO3 →
[geofabrik_slug, continent, name]; ``/root/reference/src/geopull/
geofile.py:34-45``) and broadcasts it implicitly through ``COUNTRYMAP``
lookups. Here it is a first-class broadcast dimension DataFrame: J6 joins
against fact tables (blocks, doc assignments) resolve code → continent/name
JVM-side with no shuffle on the fact side.

The table is assembled in code from public ISO-3166 knowledge (a
representative world subset spanning every continent — this sandbox has no
network to fetch the full Geofabrik index) plus the engine's synthetic
region codes (AAA/BBB/CCC and the RNNN bench grid), so every region_code the
engine can emit resolves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (iso3, geofabrik-style slug, continent, name) — public ISO-3166 subset
_COUNTRIES: list[tuple[str, str, str, str]] = [
    ("DZA", "algeria", "Africa", "Algeria"),
    ("AGO", "angola", "Africa", "Angola"),
    ("BEN", "benin", "Africa", "Benin"),
    ("EGY", "egypt", "Africa", "Egypt"),
    ("ETH", "ethiopia", "Africa", "Ethiopia"),
    ("GHA", "ghana", "Africa", "Ghana"),
    ("KEN", "kenya", "Africa", "Kenya"),
    ("MAR", "morocco", "Africa", "Morocco"),
    ("NGA", "nigeria", "Africa", "Nigeria"),
    ("SEN", "senegal-and-gambia", "Africa", "Senegal"),
    ("ZAF", "south-africa", "Africa", "South Africa"),
    ("TZA", "tanzania", "Africa", "Tanzania"),
    ("TUN", "tunisia", "Africa", "Tunisia"),
    ("UGA", "uganda", "Africa", "Uganda"),
    ("BGD", "bangladesh", "Asia", "Bangladesh"),
    ("CHN", "china", "Asia", "China"),
    ("IND", "india", "Asia", "India"),
    ("IDN", "indonesia", "Asia", "Indonesia"),
    ("IRN", "iran", "Asia", "Iran"),
    ("IRQ", "iraq", "Asia", "Iraq"),
    ("ISR", "israel-and-palestine", "Asia", "Israel"),
    ("JPN", "japan", "Asia", "Japan"),
    ("KAZ", "kazakhstan", "Asia", "Kazakhstan"),
    ("KOR", "south-korea", "Asia", "South Korea"),
    ("MYS", "malaysia-singapore-brunei", "Asia", "Malaysia"),
    ("MNG", "mongolia", "Asia", "Mongolia"),
    ("NPL", "nepal", "Asia", "Nepal"),
    ("PAK", "pakistan", "Asia", "Pakistan"),
    ("PHL", "philippines", "Asia", "Philippines"),
    ("THA", "thailand", "Asia", "Thailand"),
    ("TUR", "turkey", "Asia", "Turkey"),
    ("VNM", "vietnam", "Asia", "Vietnam"),
    ("AUT", "austria", "Europe", "Austria"),
    ("BEL", "belgium", "Europe", "Belgium"),
    ("CZE", "czech-republic", "Europe", "Czechia"),
    ("DNK", "denmark", "Europe", "Denmark"),
    ("FIN", "finland", "Europe", "Finland"),
    ("FRA", "france", "Europe", "France"),
    ("DEU", "germany", "Europe", "Germany"),
    ("GRC", "greece", "Europe", "Greece"),
    ("HUN", "hungary", "Europe", "Hungary"),
    ("IRL", "ireland-and-northern-ireland", "Europe", "Ireland"),
    ("ITA", "italy", "Europe", "Italy"),
    ("NLD", "netherlands", "Europe", "Netherlands"),
    ("NOR", "norway", "Europe", "Norway"),
    ("POL", "poland", "Europe", "Poland"),
    ("PRT", "portugal", "Europe", "Portugal"),
    ("ROU", "romania", "Europe", "Romania"),
    ("ESP", "spain", "Europe", "Spain"),
    ("SWE", "sweden", "Europe", "Sweden"),
    ("CHE", "switzerland", "Europe", "Switzerland"),
    ("UKR", "ukraine", "Europe", "Ukraine"),
    ("GBR", "great-britain", "Europe", "United Kingdom"),
    ("CAN", "canada", "North America", "Canada"),
    ("CRI", "costa-rica", "North America", "Costa Rica"),
    ("CUB", "cuba", "North America", "Cuba"),
    ("GTM", "guatemala", "North America", "Guatemala"),
    ("MEX", "mexico", "North America", "Mexico"),
    ("PAN", "panama", "North America", "Panama"),
    ("USA", "us", "North America", "United States"),
    ("ARG", "argentina", "South America", "Argentina"),
    ("BOL", "bolivia", "South America", "Bolivia"),
    ("BRA", "brazil", "South America", "Brazil"),
    ("CHL", "chile", "South America", "Chile"),
    ("COL", "colombia", "South America", "Colombia"),
    ("ECU", "ecuador", "South America", "Ecuador"),
    ("PER", "peru", "South America", "Peru"),
    ("URY", "uruguay", "South America", "Uruguay"),
    ("VEN", "venezuela", "South America", "Venezuela"),
    ("AUS", "australia", "Oceania", "Australia"),
    ("FJI", "fiji", "Oceania", "Fiji"),
    ("NZL", "new-zealand", "Oceania", "New Zealand"),
    ("PNG", "papua-new-guinea", "Oceania", "Papua New Guinea"),
]

# the engine's synthetic world (sources/synth.py): canonical AAA/BBB/CCC plus
# the RNNN bench-grid codes
_SYNTHETIC: list[tuple[str, str, str, str]] = [
    ("AAA", "synthetic-aaa", "Synthetic", "Region AAA"),
    ("BBB", "synthetic-bbb", "Synthetic", "Region BBB"),
    ("CCC", "synthetic-ccc", "Synthetic", "Region CCC"),
]

REGISTRY_SCHEMA = T.StructType(
    [
        T.StructField("region_code", T.StringType(), False),
        T.StructField("slug", T.StringType(), False),
        T.StructField("continent", T.StringType(), False),
        T.StructField("region_name", T.StringType(), False),
    ]
)


def region_registry(spark: SparkSession, n_synthetic_grid: int = 0) -> DataFrame:
    """The registry as a DataFrame (tiny: broadcast side of J6 joins)."""
    rows = list(_COUNTRIES) + list(_SYNTHETIC)
    for i in range(3, n_synthetic_grid):
        rows.append((f"R{i:03d}", f"synthetic-r{i:03d}", "Synthetic", f"Region {i}"))
    return spark.createDataFrame(rows, REGISTRY_SCHEMA)


def enrich_with_registry(fact: DataFrame, registry: DataFrame,
                         code_col: str = "region_code") -> DataFrame:
    """J6: broadcast-join registry attributes onto a fact table — the fact
    side never shuffles."""
    return fact.join(F.broadcast(registry), fact[code_col] == registry["region_code"], "left").drop(
        registry["region_code"]
    )
