"""Layer / engine configuration — mirrors the reference's config.json
schema (LayerDef /root/reference/include/shared_data.h:18-72, Config
:75-93, parsed shared_data.cpp:245-351).

The config is the engine's logical query plan: which layers exist,
their zoom windows, simplification / filtering / merging parameters,
and the global tiling parameters.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, asdict

DOUGLAS_PEUCKER = 0
VISVALINGAM = 1


def _parse_compress(v) -> str:
    """Normalise the JSON `settings.compress` value.

    Reference (tilemaker.cpp / config JSON): `compress` may be a boolean
    (true -> gzip, false -> none) or an explicit codec name; omitted means
    gzip.
    """
    if v is True:
        return "gzip"
    if v is False:
        return "none"
    if v in ("gzip", "deflate", "none"):
        return v
    raise ValueError(f"invalid settings.compress value: {v!r}")


@dataclass
class LayerDef:
    name: str
    minzoom: int = 0
    maxzoom: int = 14
    simplify_below: int = 0
    simplify_level: float = 0.01
    simplify_length: float = 0.0
    simplify_ratio: float = 1.0
    simplify_algo: int = DOUGLAS_PEUCKER
    filter_below: int = 0
    filter_area: float = 0.5
    combine_polygons_below: int = 0
    combine_points: bool = False
    feature_limit: int = 0
    feature_limit_below: int = 99
    z_order_ascending: bool = False
    source: str = ""            # external source layer (spatial-join build side)
    source_columns: list = field(default_factory=list)
    indexed: bool = False
    index_column: str = ""
    write_to: str = ""          # union this layer into another physical layer


@dataclass
class Config:
    layers: list[LayerDef] = field(default_factory=list)
    base_zoom: int = 14
    start_zoom: int = 0
    end_zoom: int = 14
    mvt_version: int = 2
    include_ids: bool = False
    combine_below: int = 0
    compress: str = "gzip"       # "gzip" | "deflate" | "none"
    high_resolution: bool = False
    # --bbox clipping box (minlon, minlat, maxlon, maxlat) or None:
    # restricts the generated tileset to tiles INTERSECTING the box
    # (reference --bbox, options_parser.cpp:18-46)
    bbox: tuple | None = None
    project_name: str = "tilemaker_ray"
    project_version: str = "0.1"
    project_description: str = ""

    def layer_map(self) -> dict[str, LayerDef]:
        return {l.name: l for l in self.layers}

    def physical_layer(self, name: str) -> str:
        """write_to remap (shared_data.cpp:156-171): the physical output
        layer a logical layer lands in."""
        ld = self.layer_map().get(name)
        if ld and ld.write_to:
            return ld.write_to
        return name

    def physical_layer_order(self) -> list[str]:
        """Physical layers in first-definition order; write_to targets
        keep the position of their first member."""
        seen: list[str] = []
        for l in self.layers:
            p = self.physical_layer(l.name)
            if p not in seen:
                seen.append(p)
        return seen

    @staticmethod
    def from_json(path_or_str: str) -> "Config":
        if path_or_str.lstrip().startswith("{"):
            raw = json.loads(path_or_str)
        else:
            with open(path_or_str) as f:
                raw = json.load(f)
        layers = []
        for name, ld in raw.get("layers", {}).items():
            layers.append(LayerDef(
                name=name,
                minzoom=ld.get("minzoom", 0),
                maxzoom=ld.get("maxzoom", 14),
                simplify_below=ld.get("simplify_below", 0),
                simplify_level=ld.get("simplify_level", 0.01),
                simplify_length=ld.get("simplify_length", 0.0),
                simplify_ratio=ld.get("simplify_ratio", 1.0),
                simplify_algo=VISVALINGAM if ld.get("simplify_algorithm", "") == "visvalingam" else DOUGLAS_PEUCKER,
                filter_below=ld.get("filter_below", 0),
                filter_area=ld.get("filter_area", 0.5),
                combine_polygons_below=ld.get("combine_polygons_below", 0),
                combine_points=ld.get("combine_points", False),
                feature_limit=ld.get("feature_limit", 0),
                feature_limit_below=ld.get("feature_limit_below", 99),
                z_order_ascending=ld.get("z_order_ascending", False),
                source=ld.get("source", ""),
                source_columns=ld.get("source_columns", []),
                indexed=ld.get("index", False),
                index_column=ld.get("index_column", ""),
                write_to=ld.get("write_to", ""),
            ))
        s = raw.get("settings", {})
        return Config(
            layers=layers,
            base_zoom=s.get("basezoom", 14),
            start_zoom=s.get("minzoom", 0),
            end_zoom=s.get("maxzoom", 14),
            mvt_version=s.get("mvt_version", 2),
            include_ids=s.get("include_ids", False),
            combine_below=s.get("combine_below", 0),
            compress=_parse_compress(s.get("compress", "gzip")),
            high_resolution=s.get("high_resolution", False),
        )

    def to_json(self) -> str:
        return json.dumps({"layers": {l.name: asdict(l) for l in self.layers}},
                          indent=2)


def default_config() -> Config:
    """The flagship web-page tiling schema: three layers mirroring the
    reference's typical poi/roads/landuse triple."""
    return Config(layers=[
        LayerDef(name="places", minzoom=0, maxzoom=14, feature_limit=200,
                 feature_limit_below=15, combine_points=True),
        LayerDef(name="routes", minzoom=4, maxzoom=14, simplify_below=12,
                 simplify_level=0.0003, simplify_ratio=2.0,
                 feature_limit=256, feature_limit_below=13),
        LayerDef(name="areas", minzoom=6, maxzoom=14, simplify_below=12,
                 simplify_level=0.0003, simplify_ratio=2.0, filter_below=10,
                 filter_area=0.05, feature_limit=256, feature_limit_below=13),
    ])
