"""gdal_spark — a PySpark-native spatial-join + tiling analytics engine.

Re-expresses the capabilities of the reference GDAL/OGR engine
(/root/reference) as idiomatic Spark DataFrame pipelines with vectorized
Arrow/pandas UDFs. Not a port: the execution strategy is Catalyst's, the
geometry kernels are fresh numpy implementations, and the spatial index is a
cell-id (Z-order quadkey) data layout instead of file-level R-trees.
"""

__version__ = "0.1.0"
