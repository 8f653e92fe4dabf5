"""External source readers (the spatial-join build sides)."""

from __future__ import annotations


def load_external_layer(path: str, source_columns=None,
                        attribute_function=None, layer_name: str = "",
                        index_name: str | None = None,
                        clipping_box=None) -> list[dict]:
    """Extension-dispatched loader for ``LayerDef.source``
    (options_parser semantics: shapefile vs GeoJSON chosen by file
    extension).  Returns the uniform external-layer records that
    stages/spatial_join.PolygonIndex and the emit path consume."""
    if path.lower().endswith(".shp"):
        from .shapefile import read_shapefile_layer
        return read_shapefile_layer(path, source_columns,
                                    attribute_function, layer_name,
                                    index_name, clipping_box)
    from .geojson import read_geojson_layer
    return read_geojson_layer(path, source_columns, attribute_function,
                              layer_name)
