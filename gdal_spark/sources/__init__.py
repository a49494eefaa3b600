"""Vector source/sink formats beyond parquet.

The reference's driver registry (ogr/ogrsf_frmts/generic/
ogrsfdriverregistrar.cpp) autodetects 200+ formats; the engine's canonical
storage is parquet/WKB, and this package supplies the interchange formats a
Spark pipeline actually ingests: GeoJSON (RFC 7946 FeatureCollection and
newline-delimited GeoJSONSeq — the scale-friendly flavor) and CSV with a
WKT geometry column. Everything parses inside Arrow batches (per line for
the ND formats -> fully distributed; whole-file for FeatureCollection ->
one task per file, the same granularity OGR's driver gets).
"""

from .csv_wkt import read_csv_wkt, write_csv_wkt      # noqa: F401
from .geojson import (read_geojson, read_geojson_seq,  # noqa: F401
                      write_geojson_seq)
