"""The flagship pipeline: scan pages -> extract geotags -> S2-encode ->
dedup re-crawls -> spatial join to tile sets.

Stage order is chosen for scan efficiency at 100 TB: the geotag regex
reads only ``html``; ``text`` is carried through untouched (byte
identity asserted in tests); dedup shuffles on ``url`` once; the tile
join is map-side (broadcast kernel, no shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from .tiles import TileSetStruct

# Decimal-degree geotag in <meta name="geo.position" content="lat;lng">
# (engine-only op, SURVEY §2.9 input_hint).
_GEO_RE = r'<meta name="geo\.position" content="(-?\d+\.\d+);(-?\d+\.\d+)"'

_GEO_SCHEMA = StructType(
    [StructField("lat", DoubleType()), StructField("lng", DoubleType())]
)


@F.pandas_udf(_GEO_SCHEMA)
def geo_extract(html: pd.Series) -> pd.DataFrame:
    """Arrow-batched geotag extraction from raw html bytes (Python
    variant; kept for parity tests — the pipeline uses the JVM path)."""
    s = html.map(lambda b: b.decode("utf-8", "replace") if isinstance(b, (bytes, bytearray)) else b)
    ex = s.str.extract(_GEO_RE)
    return pd.DataFrame(
        {"lat": pd.to_numeric(ex[0]), "lng": pd.to_numeric(ex[1])}
    )


def extract_geotags(df: DataFrame) -> DataFrame:
    """Append lat/lng doubles parsed from the html geotag (null if none).

    JVM-side inside whole-stage codegen: the fat ``html`` column never
    crosses the Arrow boundary — at 100 TB this is the difference
    between shipping bytes to Python per page and a pure columnar
    scan. Both engines' correctly-rounded string->double casts agree
    bit-for-bit.

    Round 6 (guide §1.2 "per-task work", measured): the geotag parse
    was the single largest flagship stage (~1.2s of the 3.4s x1600
    wall). ``decode(html,'UTF-8')`` materialized a java.lang.String —
    a full UTF-16 transcode + copy of every page, twice (String then
    back to UTF8String); ``cast(html as string)`` wraps the bytes as a
    UTF8String zero-copy (identical for valid UTF-8, which this corpus
    is by construction — the synth SQL builds html from text).
    Measured on the x1600 corpus: parse stage 1.2s -> 0.34s (the regex
    itself is cheap — java.util.regex Boyer-Moores the literal
    ``<meta name=...`` prefix; an explicit locate()+slice variant was
    measured SLOWER and rejected).
    """
    page = F.col("html").cast("string")
    # One regex pass for the whole content attribute, then cheap splits
    # (two regexp_extract calls would scan the page twice).
    content = F.regexp_extract(
        page, r'<meta name="geo\.position" content="(-?\d+\.\d+;-?\d+\.\d+)"', 1
    )
    lat_s = F.substring_index(content, ";", 1)
    lng_s = F.substring_index(content, ";", -1)
    return df.withColumn(
        "lat", F.when(content != "", lat_s.cast("double"))
    ).withColumn("lng", F.when(content != "", lng_s.cast("double")))


def encode_cells(df: DataFrame) -> DataFrame:
    """Leaf cell id + token for geotagged rows (pure-SQL JVM path)."""
    from . import sqlkernels as sq

    df = sq.with_s2_cellid(df, "lat", "lng", out_col="cellid")
    return df.withColumn(
        "token",
        F.when(F.col("cellid").isNotNull(), sq.s2_token_sql("cellid")),
    )


def dedup_latest(df: DataFrame, key: str = "url", ts: str = "warc_ts") -> DataFrame:
    """Keep the most recent crawl per url (SURVEY §2.7)."""
    w = Window.partitionBy(key).orderBy(F.desc(ts), F.desc("doc_id"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def tag_pipeline(
    spark: SparkSession, pages_df: DataFrame, ts: TileSetStruct
) -> DataFrame:
    """pages -> (url, tile_id, cellid, token, text, lang): the flagship.

    100% JVM: geotag regex, url dedup window, SQL cell encode and the
    covering broadcast join + SQL refinement (tagjoin) all run inside
    whole-stage codegen; the only Python is the exact residual check
    over triage-uncertified polygon lanes (empty on organic data).
    """
    from . import sqlkernels as sq
    from .tagjoin import tag_tiles_pairs

    df = extract_geotags(pages_df)
    df = dedup_latest(df)
    geo = df.select("url", "lat", "lng", "text", "lang")
    pairs = tag_tiles_pairs(spark, geo, ts, cellid_col="cellid")
    out = pairs.withColumn("token", sq.s2_token_sql("cellid"))
    # tile_i -> tile_id as a literal-map lookup: constant pairs need no
    # broadcast join (round 6 — saves one broadcast job per run)
    names = F.create_map(
        *[
            x
            for i, t in enumerate(ts.tile_ids)
            for x in (F.lit(i), F.lit(str(t)))
        ]
    )
    return out.select(
        "url", "cellid", "token", "text", "lang",
        F.element_at(names, F.col("tile_i")).alias("tile_id"),
    )
