"""s2js_spark — a PySpark-native S2 spatial-join + tiling engine.

Built from scratch against the semantics of the reference S2 geometry
library (missinglink/s2js, read-only snapshot at /root/reference).

Layers
------
- ``s2js_spark.kernels``   vectorized NumPy S2 core (encode/decode,
  hierarchy, tokens) — runs inside Arrow-batched pandas UDFs.
- ``s2js_spark.geometry``  driver-side geometry objects (Cap, Rect,
  Loop, Polygon, CellUnion, RegionCoverer, GeoJSON bridge) — used to
  build broadcast tile structures, never per-document.
- ``s2js_spark.spark``     the Spark surface: registered pandas UDFs,
  deterministic pages-table synthesis, spatial joins, dedup/text/
  similarity pipeline operators.
"""

__version__ = "0.1.0"
