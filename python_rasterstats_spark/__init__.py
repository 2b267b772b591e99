"""python_rasterstats_spark — a from-scratch PySpark-native zonal-statistics
and spatial-join engine with the query semantics of perrygeo/python-rasterstats
(reference studied read-only at /root/reference), generalized to a distributed
tile corpus of (image, caption) rows.

Layers
------
- ``geom``      : pure-python geometry model + WKB/WKT/GeoJSON codecs
- ``kernel``    : numpy kernels (affine, windows, rasterize, exact stats)
- ``codecs``    : tile payload encode/decode (npy / png16 / lossy stub) + phash
- ``sources``   : tiles/zones table builders and loaders
- ``operators`` : the distributed operators (zonal stats, point query, mosaic)
- ``functions`` : large-scale pipeline ops (dedup, similarity, text, multimodal)
- ``plans``     : plan inspection / lineage / checkpoint helpers
- ``api``       : drop-in ``zonal_stats`` / ``point_query`` parity wrappers
"""

from .version import __version__  # noqa: F401
