"""OpenMapTiles-schema profile — Python re-expression of the
reference's production profile (resources/process-openmaptiles.lua:1-948
+ resources/config-openmaptiles.json:1-52; schema (c) KlokanTech /
OpenMapTiles contributors, CC-BY 4.0).

This is the profile the reference actually ships for real maps; porting
it exercises the FULL verb surface in one pipeline: LayerAsCentroid
with role logic, per-attribute minzooms, MinZoom-by-area thresholds,
NextRelation/FindInRelation on both ways (admin boundaries) and nodes
(capital label roles), write_to layer chains (poi_detail→poi,
waterway_detail→waterway, water_name_detail→water_name), imposm-style
ZOrder, and the multipolygon-relation → way_function routing.

Deliberate divergences from the Lua (each noted inline):
- poiTags iteration is in a FIXED key order (Lua `pairs` is
  hash-ordered and nondeterministic; a node carrying two poi keys may
  classify differently — determinism wins here).
- The external shapefile layers (ocean / urban_areas / ice_shelf /
  glacier) are declared in the config without sources wired; feed them
  through sources/shapefile.py + `attribute_function` below when the
  Natural-Earth archives are present.
"""

from __future__ import annotations

import re

import numpy as np

from ..config import Config
from ..geom import core as gc
from ..profile import Emitter
from ..pipelines.osm import SignificantTags

# Meters per pixel at a 256px tile, per zoom (process-openmaptiles.lua:33-41)
ZRES5, ZRES6, ZRES7, ZRES8 = 4891.97, 2445.98, 1222.99, 611.5
ZRES9, ZRES10, ZRES11, ZRES12, ZRES13 = 305.7, 152.9, 76.4, 38.2, 19.1
BUILDING_FLOOR_HEIGHT = 3.66
INVALID_ZOOM = 99

CONFIG_JSON = """{
  "layers": {
    "place":            { "minzoom": 0, "maxzoom": 14 },
    "boundary":         { "minzoom": 0, "maxzoom": 14, "simplify_below": 12, "simplify_level": 0.0003, "simplify_ratio": 2, "simplify_algorithm": "visvalingam" },
    "poi":              { "minzoom": 12, "maxzoom": 14 },
    "poi_detail":       { "minzoom": 14, "maxzoom": 14, "write_to": "poi" },
    "housenumber":      { "minzoom": 14, "maxzoom": 14 },
    "waterway":         { "minzoom": 8, "maxzoom": 14, "simplify_below": 12, "simplify_level": 0.0003, "simplify_ratio": 2 },
    "waterway_detail":  { "minzoom": 12, "maxzoom": 14, "write_to": "waterway" },
    "transportation":   { "minzoom": 4, "maxzoom": 14, "simplify_below": 13, "simplify_level": 0.0003 },
    "transportation_name": { "minzoom": 8, "maxzoom": 14 },
    "building":         { "minzoom": 13, "maxzoom": 14 },
    "water":            { "minzoom": 6, "maxzoom": 14, "simplify_below": 12, "simplify_level": 0.0003, "simplify_ratio": 2 },
    "ocean":            { "minzoom": 0, "maxzoom": 14, "filter_below": 12, "filter_area": 0.5, "simplify_below": 13, "simplify_level": 0.0001, "simplify_ratio": 2, "simplify_algorithm": "visvalingam", "write_to": "water" },
    "water_name":       { "minzoom": 14, "maxzoom": 14 },
    "water_name_detail": { "minzoom": 14, "maxzoom": 14, "write_to": "water_name" },
    "aeroway":          { "minzoom": 11, "maxzoom": 14 },
    "aerodrome_label":  { "minzoom": 10, "maxzoom": 14 },
    "park":             { "minzoom": 11, "maxzoom": 14 },
    "landuse":          { "minzoom": 4, "maxzoom": 14, "simplify_below": 13, "simplify_level": 0.0003, "simplify_ratio": 2 },
    "urban_areas":      { "minzoom": 4, "maxzoom": 8, "simplify_below": 7, "simplify_level": 0.0003, "simplify_ratio": 2, "write_to": "landuse" },
    "landcover":        { "minzoom": 0, "maxzoom": 14, "simplify_below": 13, "simplify_level": 0.0003, "simplify_ratio": 2 },
    "ice_shelf":        { "minzoom": 0, "maxzoom": 9, "simplify_below": 13, "simplify_level": 0.0005, "write_to": "landcover" },
    "glacier":          { "minzoom": 2, "maxzoom": 9, "simplify_below": 13, "simplify_level": 0.0005, "write_to": "landcover" },
    "mountain_peak":    { "minzoom": 11, "maxzoom": 14 }
  },
  "settings": {
    "minzoom": 0, "maxzoom": 14, "basezoom": 14,
    "include_ids": false, "combine_below": 14,
    "name": "Tilemaker to OpenMapTiles schema", "version": "3.0",
    "compress": "gzip"
  }
}"""


def openmaptiles_config() -> Config:
    return Config.from_json(CONFIG_JSON)


# --- tag tables (process-openmaptiles.lua:49-300) -----------------------

NODE_KEYS = ["addr:housenumber", "aerialway", "aeroway", "amenity", "barrier",
             "highway", "historic", "leisure", "natural", "office", "place",
             "railway", "shop", "sport", "tourism", "waterway"]

AERODROME_VALUES = {"international", "public", "regional", "military", "private"}
PAVED_VALUES = {"paved", "asphalt", "cobblestone", "concrete", "concrete:lanes",
                "concrete:plates", "metal", "paving_stones", "sett",
                "unhewn_cobblestone", "wood"}
UNPAVED_VALUES = {"unpaved", "compacted", "dirt", "earth", "fine_gravel",
                  "grass", "grass_paver", "gravel", "gravel_turf", "ground",
                  "ice", "mud", "pebblestone", "salt", "sand", "snow",
                  "woodchips"}

MAJOR_ROAD = {"motorway", "trunk", "primary"}
Z9_ROAD = {"secondary", "motorway_link", "trunk_link"}
Z10_ROAD = {"primary_link", "secondary_link"}
Z11_ROAD = {"tertiary", "tertiary_link", "busway", "bus_guideway"}
Z12_MINOR_ROAD = {"unclassified", "residential", "road", "living_street"}
Z12_OTHER_ROAD = {"raceway"}
Z13_ROAD = {"track", "service"}
MANMADE_ROAD = {"pier", "bridge"}
PATH_VALUES = {"footway", "cycleway", "bridleway", "path", "steps",
               "pedestrian", "platform"}
LINK_VALUES = {"motorway_link", "trunk_link", "primary_link", "secondary_link",
               "tertiary_link"}
RAILWAY_CLASSES = {"rail": "rail", "narrow_gauge": "rail", "preserved": "rail",
                   "funicular": "rail", "subway": "transit",
                   "light_rail": "transit", "monorail": "transit",
                   "tram": "transit"}

AEROWAY_BUILDINGS = {"terminal", "gate", "tower"}
LANDUSE_KEYS = {"school", "university", "kindergarten", "college", "library",
                "hospital", "railway", "cemetery", "military", "residential",
                "commercial", "industrial", "retail", "stadium", "pitch",
                "playground", "theme_park", "bus_station", "zoo"}
LANDCOVER_KEYS = {"wood": "wood", "forest": "wood", "wetland": "wetland",
                  "beach": "sand", "sand": "sand", "dune": "sand",
                  "farmland": "farmland", "farm": "farmland",
                  "orchard": "farmland", "vineyard": "farmland",
                  "plant_nursery": "farmland", "glacier": "ice",
                  "ice_shelf": "ice", "bare_rock": "rock", "scree": "rock",
                  "fell": "grass", "grassland": "grass", "grass": "grass",
                  "heath": "grass", "meadow": "grass", "allotments": "grass",
                  "park": "grass", "village_green": "grass",
                  "recreation_ground": "grass", "scrub": "grass",
                  "shrubbery": "grass", "tundra": "grass", "garden": "grass",
                  "golf_course": "grass"}

# POI key → accepted values (openmaptiles poi mapping.yaml via the Lua)
POI_TAGS = {
    "aerialway": {"station"},
    "amenity": {"arts_centre", "bank", "bar", "bbq", "bicycle_parking",
                "bicycle_rental", "biergarten", "bus_station", "cafe",
                "cinema", "clinic", "college", "community_centre",
                "courthouse", "dentist", "doctors", "embassy", "fast_food",
                "ferry_terminal", "fire_station", "food_court", "fuel",
                "grave_yard", "hospital", "ice_cream", "kindergarten",
                "library", "marketplace", "motorcycle_parking", "nightclub",
                "nursing_home", "parking", "pharmacy", "place_of_worship",
                "police", "post_box", "post_office", "prison", "pub",
                "public_building", "recycling", "restaurant", "school",
                "shelter", "swimming_pool", "taxi", "telephone", "theatre",
                "toilets", "townhall", "university", "veterinary",
                "waste_basket"},
    "barrier": {"bollard", "border_control", "cycle_barrier", "gate",
                "lift_gate", "sally_port", "stile", "toll_booth"},
    "building": {"dormitory"},
    "highway": {"bus_stop"},
    "historic": {"monument", "castle", "ruins"},
    "landuse": {"basin", "brownfield", "cemetery", "reservoir",
                "winter_sports"},
    "leisure": {"dog_park", "escape_game", "garden", "golf_course",
                "ice_rink", "hackerspace", "marina", "miniature_golf",
                "park", "pitch", "playground", "sports_centre", "stadium",
                "swimming_area", "swimming_pool", "water_park"},
    "railway": {"halt", "station", "subway_entrance",
                "train_station_entrance", "tram_stop"},
    "shop": {"accessories", "alcohol", "antiques", "art", "bag", "bakery",
             "beauty", "bed", "beverages", "bicycle", "books", "boutique",
             "butcher", "camera", "car", "car_repair", "carpet", "charity",
             "chemist", "chocolate", "clothes", "coffee", "computer",
             "confectionery", "convenience", "copyshop", "cosmetics", "deli",
             "delicatessen", "department_store", "doityourself",
             "dry_cleaning", "electronics", "erotic", "fabric", "florist",
             "frozen_food", "furniture", "garden_centre", "general", "gift",
             "greengrocer", "hairdresser", "hardware", "hearing_aids",
             "hifi", "ice_cream", "interior_decoration", "jewelry", "kiosk",
             "lamps", "laundry", "mall", "massage", "mobile_phone",
             "motorcycle", "music", "musical_instrument", "newsagent",
             "optician", "outdoor", "perfume", "perfumery", "pet", "photo",
             "second_hand", "shoes", "sports", "stationery", "supermarket",
             "tailor", "tattoo", "ticket", "tobacco", "toys",
             "travel_agency", "video", "video_games", "watches", "weapons",
             "wholesale", "wine"},
    "sport": {"american_football", "archery", "athletics",
              "australian_football", "badminton", "baseball", "basketball",
              "beachvolleyball", "billiards", "bmx", "boules", "bowls",
              "boxing", "canadian_football", "canoe", "chess", "climbing",
              "climbing_adventure", "cricket", "cricket_nets", "croquet",
              "curling", "cycling", "disc_golf", "diving", "dog_racing",
              "equestrian", "fatsal", "field_hockey", "free_flying",
              "gaelic_games", "golf", "gymnastics", "handball", "hockey",
              "horse_racing", "horseshoes", "ice_hockey", "ice_stock",
              "judo", "karting", "korfball", "long_jump", "model_aerodrome",
              "motocross", "motor", "multi", "netball", "orienteering",
              "paddle_tennis", "paintball", "paragliding", "pelota",
              "racquet", "rc_car", "rowing", "rugby", "rugby_league",
              "rugby_union", "running", "sailing", "scuba_diving",
              "shooting", "shooting_range", "skateboard", "skating",
              "skiing", "soccer", "surfing", "swimming", "table_soccer",
              "table_tennis", "team_handball", "tennis", "toboggan",
              "volleyball", "water_ski", "yoga"},
    "tourism": {"alpine_hut", "aquarium", "artwork", "attraction",
                "bed_and_breakfast", "camp_site", "caravan_site", "chalet",
                "gallery", "guest_house", "hostel", "hotel", "information",
                "motel", "museum", "picnic_site", "theme_park", "viewpoint",
                "zoo"},
    "waterway": {"dock"},
}
# fixed iteration order (divergence: Lua pairs() is unordered)
POI_TAG_ORDER = list(POI_TAGS)

POI_CLASSES = {
    "townhall": "town_hall", "public_building": "town_hall",
    "courthouse": "town_hall", "community_centre": "town_hall",
    "golf": "golf", "golf_course": "golf", "miniature_golf": "golf",
    "fast_food": "fast_food", "food_court": "fast_food",
    "park": "park", "bbq": "park",
    "bus_stop": "bus", "bus_station": "bus",
    "subway_entrance": "entrance", "train_station_entrance": "entrance",
    "camp_site": "campsite", "caravan_site": "campsite",
    "laundry": "laundry", "dry_cleaning": "laundry",
    "supermarket": "grocery", "deli": "grocery", "delicatessen": "grocery",
    "department_store": "grocery", "greengrocer": "grocery",
    "marketplace": "grocery",
    "books": "library", "library": "library",
    "university": "college", "college": "college",
    "hotel": "lodging", "motel": "lodging", "bed_and_breakfast": "lodging",
    "guest_house": "lodging", "hostel": "lodging", "chalet": "lodging",
    "alpine_hut": "lodging", "dormitory": "lodging",
    "chocolate": "ice_cream", "confectionery": "ice_cream",
    "post_box": "post", "post_office": "post",
    "cafe": "cafe",
    "school": "school", "kindergarten": "school",
    "alcohol": "alcohol_shop", "beverages": "alcohol_shop",
    "wine": "alcohol_shop",
    "bar": "bar", "nightclub": "bar",
    "marina": "harbor", "dock": "harbor",
    "car": "car", "car_repair": "car", "taxi": "car",
    "hospital": "hospital", "nursing_home": "hospital", "clinic": "hospital",
    "grave_yard": "cemetery", "cemetery": "cemetery",
    "attraction": "attraction", "viewpoint": "attraction",
    "biergarten": "beer", "pub": "beer",
    "music": "music", "musical_instrument": "music",
    "american_football": "stadium", "stadium": "stadium", "soccer": "stadium",
    "art": "art_gallery", "artwork": "art_gallery", "gallery": "art_gallery",
    "arts_centre": "art_gallery",
    "bag": "clothing_store", "clothes": "clothing_store",
    "swimming_area": "swimming", "swimming": "swimming",
    "castle": "castle", "ruins": "castle",
}
POI_SUB_CLASSES = {"information": "information",
                   "place_of_worship": "religion", "pitch": "sport"}
POI_CLASS_RANKS = {"hospital": 1, "railway": 2, "bus": 3, "attraction": 4,
                   "harbor": 5, "college": 6, "school": 7, "stadium": 8,
                   "zoo": 9, "town_hall": 10, "campsite": 11, "cemetery": 12,
                   "park": 13, "library": 14, "police": 15, "post": 16,
                   "golf": 17, "shop": 18, "grocery": 19, "fast_food": 20,
                   "clothing_store": 21, "bar": 22}
WATER_CLASSES = {"river", "riverbank", "stream", "canal", "drain", "ditch",
                 "dock"}
WATERWAY_CLASSES = {"stream", "river", "canal", "drain", "ditch"}

_INT_RE = re.compile(r"^\s*[+-]?\d+\s*$")


def _tonum(s):
    """Lua tonumber(s) — float or None."""
    try:
        return float(s)
    except (TypeError, ValueError):
        return None


def _toint(s):
    """Lua tonumber(s, 10) — base-10 INTEGER strings only (decimals
    return nil in Lua when a base is given; the reference's building
    heights inherit that quirk)."""
    if isinstance(s, str) and _INT_RE.match(s):
        return int(s)
    return None


def capital_level(capital: str):
    """process-openmaptiles.lua:59-68."""
    al = _tonum(capital) or 0
    if capital == "yes":
        al = 2
    return None if al == 0 else al


def calc_rank(place: str, population: float, capital_al):
    """process-openmaptiles.lua:74-120."""
    if capital_al is not None and 2 <= capital_al <= 4:
        rank = capital_al
        if population > 3e6:
            rank -= 2
        elif population > 1e6:
            rank -= 1
        elif population < 100000:
            # the reference checks <100000 FIRST (lua :81-84), which
            # makes its following `< 50000 → +3` branch dead code —
            # reproduced verbatim for parity (found by the interpreted
            # Lua vs hand-port Monaco byte diff, round 5)
            rank += 2
        elif population < 50000:   # pragma: no cover — dead in the ref
            rank += 3
        if place != "city":
            rank += 3
            if place != "town":
                rank += 2
        return rank
    if place not in ("city", "town"):
        return None
    for thresh, rank in ((3e6, 1), (1e6, 2), (500000, 3), (200000, 4),
                         (100000, 5), (75000, 6), (50000, 7), (25000, 8),
                         (10000, 9)):
        if population > thresh:
            return rank
    return 10


# --- geometry adapters ---------------------------------------------------

class _NodeGeom:
    closed = False

    def __init__(self, lon: float, latp: float):
        self.pt = (lon, latp)

    def area(self) -> float:
        return 0.0

    def centroid_geom(self):
        return self.pt


class _WayGeom:
    def __init__(self, pts: np.ndarray, closed: bool):
        self.pts = pts
        self.closed = closed
        self._area = None

    def area(self) -> float:
        if not self.closed:
            return 0.0
        if self._area is None:
            self._area = abs(gc.spherical_area([[gc.close_ring(self.pts)]]))
        return self._area

    def as_line(self):
        return self.pts

    def as_polys(self):
        return [[gc.close_ring(self.pts)]]

    def centroid_geom(self):
        return [gc.close_ring(self.pts)]


class _RelGeom:
    closed = True

    def __init__(self, polys):
        self.polys = polys
        self._area = None

    def area(self) -> float:
        if self._area is None:
            self._area = abs(gc.spherical_area(self.polys))
        return self._area

    def as_line(self):
        return [ring for rings in self.polys for ring in rings]

    def as_polys(self):
        return self.polys

    def centroid_geom(self):
        # polylabel on the largest polygon (reference multipolygon
        # centroid picks the dominant part)
        return max(self.polys,
                   key=lambda rings: abs(gc.ring_signed_area(rings[0])))


class OpenMapTilesProfile:
    """node_function / way_function re-expression of
    process-openmaptiles.lua (way_function :358-729, node_function
    :123-216)."""

    preferred_language = None
    preferred_language_attribute = "name:latin"
    default_language_attribute = "name_int"
    additional_languages: list[str] = []

    def __init__(self):
        self.node_filter = SignificantTags(NODE_KEYS)
        self.way_filter = SignificantTags(None)  # all tagged ways

    # --- relation scan (lua :304-308) -----------------------------------
    @staticmethod
    def relation_scan(tags: dict) -> bool:
        return (tags.get("type") == "boundary"
                and tags.get("boundary") == "administrative")

    relation_postscan = None

    # --- shapefile attribute remap (lua :732-744) ------------------------
    @staticmethod
    def attribute_function(attr: dict, layer: str) -> dict:
        fc = attr.get("featurecla")
        if fc == "Glaciated areas":
            return {"subclass": "glacier"}
        if fc == "Antarctic Ice Shelf":
            return {"subclass": "ice_shelf"}
        if fc == "Urban area":
            return {"class": "residential"}
        if layer == "ocean":
            return {"class": "ocean"}
        return attr

    # --- common verbs ----------------------------------------------------

    def set_name_attributes(self, t: dict, emit: Emitter) -> None:
        """lua :783-802 (preferred_language=nil path writes the plain
        name tag into name:latin)."""
        name = t.get("name", "")
        emit.Attribute(self.preferred_language_attribute, name)

    def has_names(self, t: dict) -> bool:
        return "name" in t

    @staticmethod
    def set_ele_attributes(t: dict, emit: Emitter) -> None:
        ele = t.get("ele", "")
        if ele != "":
            meter = int(np.floor(_tonum(ele) or 0))
            emit.AttributeNumeric("ele", meter)
            emit.AttributeNumeric("ele_ft", int(np.floor(meter * 3.2808399)))

    @staticmethod
    def set_brunnel_attributes(t: dict, emit: Emitter) -> None:
        if t.get("bridge") == "yes" or t.get("man_made") == "bridge":
            emit.Attribute("brunnel", "bridge")
        elif t.get("tunnel") == "yes":
            emit.Attribute("brunnel", "tunnel")
        elif t.get("ford") == "yes":
            emit.Attribute("brunnel", "ford")

    @staticmethod
    def set_minzoom_by_area(emit: Emitter, area: float, limit: int = 0) -> None:
        """lua SetMinZoomByAreaWithLimit — area-driven MinZoom with a
        floor.  The reference's guard is `minzoom <= z` (a limit-13
        pier CAN land at z13); the old `limit <= z - 1` pushed it to
        z14 — found by the interpreted-Lua vs hand-port Monaco byte
        diff, round 5."""
        for z, zres in ((6, ZRES5), (7, ZRES6), (8, ZRES7), (9, ZRES8),
                        (10, ZRES9), (11, ZRES10), (12, ZRES11), (13, ZRES12)):
            if limit <= z and area > zres * zres:
                emit.MinZoom(z)
                return
        emit.MinZoom(14)

    @staticmethod
    def set_z_order(t: dict, emit: Emitter) -> None:
        """Imposm wayzorder (lua :895-931)."""
        z = 0
        bridge, tunnel = t.get("bridge", ""), t.get("tunnel", "")
        if bridge not in ("", "no"):
            z += 10
        elif tunnel not in ("", "no"):
            z -= 10
        layer = _tonum(t.get("layer", ""))
        if layer is not None:
            z += max(-7, min(7, layer)) * 10
        hw = t.get("highway", "")
        z += {"motorway": 9, "trunk": 8, "primary": 6, "secondary": 5,
              "tertiary": 4}.get(hw, 3)
        emit.ZOrder(z)

    def get_poi_rank(self, t: dict):
        """lua :843-867 → (rank, class, subclass) or (None,)*3."""
        for k in POI_TAG_ORDER:
            v = t.get(k, "")
            if v in POI_TAGS[k]:
                cls = POI_CLASSES.get(v, k)
                rank = POI_CLASS_RANKS.get(cls, 25)
                sub_key = POI_SUB_CLASSES.get(v)
                if sub_key:
                    cls = v
                    v = t.get(sub_key, "")
                return rank, cls, v
        shop = t.get("shop", "")
        if shop != "":
            return POI_CLASS_RANKS["shop"], "shop", shop
        return None, None, None

    def write_poi(self, t: dict, g, emit: Emitter, cls: str, subclass: str,
                  rank: int) -> None:
        """lua :750-767."""
        layer = "poi" if rank <= 4 else "poi_detail"
        emit.LayerAsCentroid(layer, g.centroid_geom())
        self.set_name_attributes(t, emit)
        emit.AttributeNumeric("rank", rank)
        emit.Attribute("class", cls)
        emit.Attribute("subclass", subclass)
        emit.AttributeNumeric("layer", _tonum(t.get("layer", "")) or 0)
        emit.AttributeBoolean("indoor", t.get("indoor") == "yes")
        level = _tonum(t.get("level", ""))
        if level is not None:
            emit.AttributeNumeric("level", level)

    def set_building_height_attributes(self, t: dict, emit: Emitter) -> None:
        """lua :869-891 (integer-only parses — see _toint)."""
        height = _toint(t.get("height", ""))
        min_height = _toint(t.get("min_height", ""))
        levels = _toint(t.get("building:levels", ""))
        min_level = _toint(t.get("building:min_level", ""))
        render_height = BUILDING_FLOOR_HEIGHT
        if height is not None or levels is not None:
            render_height = height if height is not None \
                else levels * BUILDING_FLOOR_HEIGHT
        render_min = 0
        if min_height is not None or min_level is not None:
            render_min = min_height if min_height is not None \
                else min_level * BUILDING_FLOOR_HEIGHT
        if render_height < render_min:
            render_height += render_min
        emit.AttributeNumeric("render_height", render_height)
        emit.AttributeNumeric("render_min_height", render_min)

    # --- node_function (lua :123-216) ------------------------------------

    def node_function(self, node_id: int, lon: float, latp: float,
                      tags: dict, emit: Emitter,
                      relations: list | None = None) -> None:
        t = tags
        g = _NodeGeom(lon, latp)
        pt = (lon, latp)
        aeroway = t.get("aeroway", "")
        if aeroway == "aerodrome":
            emit.Layer("aerodrome_label", pt)
            self.set_name_attributes(t, emit)
            emit.Attribute("iata", t.get("iata", ""))
            self.set_ele_attributes(t, emit)
            emit.Attribute("icao", t.get("icao", ""))
            av = t.get("aerodrome", "")
            emit.Attribute("class", av if av in AERODROME_VALUES else "other")

        housenumber = t.get("addr:housenumber", "")
        if housenumber != "":
            emit.Layer("housenumber", pt)
            emit.Attribute("housenumber", housenumber)

        place = t.get("place", "")
        if place != "":
            mz = 13
            pop = _tonum(t.get("population", "")) or 0
            capital = capital_level(t.get("capital", ""))
            rank = calc_rank(place, pop, capital)
            if place == "continent":
                mz = 0
            elif place == "country":
                if pop > 50e6:
                    rank, mz = 1, 1
                elif pop > 20e6:
                    rank, mz = 2, 2
                else:
                    rank, mz = 3, 3
            elif place == "state":
                mz = 4
            elif place == "province":
                mz = 5
            elif place == "city":
                mz = 5
            elif place == "town":
                mz = 7 if pop > 8000 else 8
            elif place == "village":
                mz = 9 if pop > 2000 else 10
            elif place == "borough":
                mz = 10
            elif place == "suburb":
                mz = 11
            elif place == "quarter":
                mz = 12
            elif place == "hamlet":
                mz = 12
            elif place == "neighbourhood":
                mz = 13
            elif place == "isolated_dwelling":
                mz = 13
            elif place == "locality":
                mz = 13
            elif place == "island":
                mz = 12
            emit.Layer("place", pt)
            emit.Attribute("class", place)
            emit.MinZoom(mz)
            if rank is not None:
                emit.AttributeNumeric("rank", rank)
            if capital is not None:
                emit.AttributeNumeric("capital", capital)
            if place == "country":
                iso_a2 = t.get("ISO3166-1:alpha2", "")
                if iso_a2 == "":
                    # NextRelation loop over label-role parents (lua :184-190)
                    for _rid, role, rtags in (relations or []):
                        if role == "label":
                            iso_a2 = rtags.get("ISO3166-1:alpha2", "")
                            if iso_a2 != "":
                                break
                emit.Attribute("iso_a2", iso_a2)
            self.set_name_attributes(t, emit)
            return

        rank, cls, subclass = self.get_poi_rank(t)
        if rank is not None:
            self.write_poi(t, g, emit, cls, subclass, rank)

        natural = t.get("natural", "")
        if natural in ("peak", "volcano"):
            emit.Layer("mountain_peak", pt)
            self.set_ele_attributes(t, emit)
            emit.AttributeNumeric("rank", 1)
            emit.Attribute("class", natural)
            self.set_name_attributes(t, emit)
            return
        if natural == "bay":
            emit.Layer("water_name", pt)
            self.set_name_attributes(t, emit)
            return

    # --- transportation helper (lua :310-354) ----------------------------

    def _write_transportation(self, t: dict, g, emit: Emitter, minzoom: int,
                              highway_class: str, subclass, ramp: bool,
                              service, is_rail: bool, is_road: bool,
                              is_area: bool) -> None:
        emit.Layer("transportation", g.as_polys() if is_area else g.as_line())
        self.set_z_order(t, emit)
        emit.Attribute("class", highway_class)
        if subclass:
            emit.Attribute("subclass", subclass)
        # lua quirk: accessMinzoom is read before its `local` assignment
        # here, so the layer attribute has NO minzoom gate (nil → 0)
        emit.AttributeNumeric("layer", _tonum(t.get("layer", "")) or 0)
        self.set_brunnel_attributes(t, emit)
        if is_area:
            self.set_minzoom_by_area(emit, g.area(), limit=minzoom)
            return
        emit.MinZoom(minzoom)
        if ramp:
            emit.AttributeNumeric("ramp", 1)
        if (is_rail or highway_class == "service") and service:
            emit.Attribute("service", service)
        access_minzoom = 9
        if is_road:
            oneway = t.get("oneway", "")
            if oneway in ("yes", "1"):
                emit.AttributeNumeric("oneway", 1)
            surface = t.get("surface", "")
            if surface in PAVED_VALUES:
                emit.Attribute("surface", "paved", 12)
            elif surface in UNPAVED_VALUES:
                emit.Attribute("surface", "unpaved", 12)
            for key in ("access", "bicycle", "foot", "horse"):
                if key in t:
                    emit.Attribute(key, t.get(key, ""), access_minzoom)
            emit.AttributeBoolean("toll", t.get("toll") == "yes",
                                  access_minzoom)
            if t.get("expressway") == "yes":
                emit.AttributeBoolean("expressway", True, 7)
            # lua quirk: Holds("mtb_scale") but Find("mtb:scale") — the
            # guard key is effectively never present, mirrored as-is
            if "mtb_scale" in t:
                emit.Attribute("mtb_scale", t.get("mtb:scale", ""), 10)

    # --- way_function (lua :358-729) -------------------------------------

    def way_function(self, way_id: int, pts: np.ndarray, closed: bool,
                     tags: dict, emit: Emitter,
                     relations: list | None = None) -> None:
        self._process_way(tags, _WayGeom(pts, closed), emit, relations or [])

    def relation_function(self, rel_id: int, polys, tags: dict,
                          emit: Emitter) -> None:
        """Multipolygon relations route through the way logic with
        IsClosed()=true (osm_lua_processing.cpp way_function-on-relation
        path)."""
        if not polys:
            return
        self._process_way(tags, _RelGeom(polys), emit, [])

    def _process_way(self, t: dict, g, emit: Emitter,
                     relations: list) -> None:
        route = t.get("route", "")
        highway = t.get("highway", "")
        waterway = t.get("waterway", "")
        water = t.get("water", "")
        building = t.get("building", "")
        natural = t.get("natural", "")
        landuse = t.get("landuse", "")
        leisure = t.get("leisure", "")
        amenity = t.get("amenity", "")
        aeroway = t.get("aeroway", "")
        railway = t.get("railway", "")
        service = t.get("service", "")
        tourism = t.get("tourism", "")
        man_made = t.get("man_made", "")
        boundary = t.get("boundary", "")
        aerialway = t.get("aerialway", "")
        public_transport = t.get("public_transport", "")
        place = t.get("place", "")
        is_closed = g.closed
        housenumber = t.get("addr:housenumber", "")
        write_name = False
        construction = t.get("construction", "")
        is_highway_area = highway != "" and t.get("area") == "yes" and is_closed

        # preprocessing (lua :386-392)
        if t.get("disused") == "yes":
            return
        if (boundary != "" and t.get("protection_title") == "National Forest"
                and t.get("operator") == "United States Forest Service"):
            return
        if highway == "proposed":
            return
        if aeroway in AEROWAY_BUILDINGS:
            building, aeroway = "yes", ""
        if landuse == "field":
            landuse = "farmland"
        if landuse == "meadow" and t.get("meadow") == "agricultural":
            landuse = "farmland"

        if place == "island":
            emit.LayerAsCentroid("place", g.centroid_geom())
            emit.Attribute("class", place)
            emit.MinZoom(10)
            pop = _tonum(t.get("population", "")) or 0
            rank = calc_rank(place, pop, None)
            if rank is not None:
                emit.AttributeNumeric("rank", rank)
            self.set_name_attributes(t, emit)

        # admin boundaries: relation context first, own tags second
        # (lua :408-443 — boundaries render from ways, not relations,
        # to avoid double-drawing coterminous edges)
        admin_level = 11
        is_boundary = False
        for _rid, _role, rtags in relations:
            is_boundary = True
            admin_level = min(admin_level,
                              _tonum(rtags.get("admin_level", "")) or 11)
        if boundary == "administrative":
            admin_level = min(admin_level,
                              _tonum(t.get("admin_level", "")) or 11)
            is_boundary = True
        if is_boundary and t.get("maritime") != "yes":
            mz = 0
            if 3 <= admin_level < 5:
                mz = 4
            elif 5 <= admin_level < 7:
                mz = 8
            elif admin_level == 7:
                mz = 10
            elif admin_level >= 8:
                mz = 12
            emit.Layer("boundary", g.as_line())
            emit.AttributeNumeric("admin_level", admin_level)
            emit.MinZoom(mz)
            emit.AttributeNumeric("disputed",
                                  1 if t.get("disputed") == "yes" else 0)

        # aerialways (lua :446-455)
        if aerialway != "":
            self._write_transportation(t, g, emit, 12, "aerialway", aerialway,
                                       False, None, False, False, is_closed)
            if self.has_names(t):
                emit.Layer("transportation_name", g.as_line())
                emit.MinZoom(12)
                self.set_name_attributes(t, emit)
                emit.Attribute("class", "aerialway")
                emit.Attribute("subclass", aerialway)

        # roads (lua :458-550)
        if highway != "" or public_transport == "platform":
            h = highway
            is_road = True
            if h == "":
                h = public_transport
                is_road = False
            subclass = None
            under_construction = False
            if highway == "construction" and construction != "":
                h = construction
                under_construction = True
            minzoom = INVALID_ZOOM
            if h in MAJOR_ROAD:
                minzoom = 4
            elif h == "trunk":
                minzoom = 5
            elif highway == "primary":
                minzoom = 7
            elif h in Z9_ROAD:
                minzoom = 9
            elif h in Z10_ROAD:
                minzoom = 10
            elif h in Z11_ROAD:
                minzoom = 11
            elif h in Z12_MINOR_ROAD:
                minzoom, subclass, h = 12, h, "minor"
            elif h in Z12_OTHER_ROAD:
                minzoom = 12
            elif h in Z13_ROAD:
                minzoom = 13
            elif h in PATH_VALUES:
                minzoom, subclass, h = 14, h, "path"

            ramp = False
            if h in LINK_VALUES:
                highway = highway.split("_")[0]
                h = highway
                ramp = True
            if under_construction:
                h = h + "_construction"
            # drop underground platforms
            layer_num = _tonum(t.get("layer", ""))
            if not is_road and layer_num is not None and layer_num < 0:
                minzoom = INVALID_ZOOM
            # drop highway areas except pedestrian infrastructure
            if is_highway_area and h != "path":
                minzoom = INVALID_ZOOM

            if minzoom <= 14:
                self._write_transportation(t, g, emit, minzoom, h, subclass,
                                           ramp, service, False, is_road,
                                           is_highway_area)
                if not is_closed and (self.has_names(t) or "ref" in t):
                    minzoom = {"motorway": 7, "trunk": 8, "primary": 10,
                               "secondary": 11, "minor": 13, "track": 13,
                               "tertiary": 13}.get(h, 14)
                    emit.Layer("transportation_name", g.as_line())
                    emit.MinZoom(minzoom)
                    self.set_name_attributes(t, emit)
                    emit.Attribute("class", h)
                    emit.Attribute("network", "road")
                    if subclass is not None:
                        emit.Attribute("subclass", highway)
                    ref = t.get("ref", "")
                    if ref != "":
                        emit.Attribute("ref", ref)
                        emit.AttributeNumeric("ref_length", len(ref))

        # railways (lua :553-579)
        if railway != "":
            cls = RAILWAY_CLASSES.get(railway)
            if cls is not None:
                minzoom = 14
                # lua quirk (:557): a bare Layer("transportation", false)
                # precedes write_to_transportation_layer, so the
                # reference emits an extra attribute-less transportation
                # feature per railway way — mirrored for parity
                emit.Layer("transportation", g.as_line())
                usage = t.get("usage", "")
                if railway == "rail" and service == "":
                    minzoom = 8 if usage == "main" else 10
                elif railway == "narrow_gauge" and service == "":
                    minzoom = 10
                elif railway == "light_rail" and service == "":
                    minzoom = 11
                self._write_transportation(t, g, emit, minzoom, cls, railway,
                                           False, service, True, False,
                                           is_closed)
                if self.has_names(t):
                    emit.Layer("transportation_name", g.as_line())
                    self.set_name_attributes(t, emit)
                    emit.MinZoom(14)
                    emit.Attribute("class", cls)

        # pier / man_made bridge (lua :582-584)
        if man_made in MANMADE_ROAD:
            self._write_transportation(t, g, emit, 13, man_made, None, False,
                                       None, False, False, is_closed)

        # ferry (lua :587-596)
        if route == "ferry":
            self._write_transportation(t, g, emit, 9, "ferry", None, False,
                                       None, False, False, is_closed)
            if self.has_names(t):
                emit.Layer("transportation_name", g.as_line())
                self.set_name_attributes(t, emit)
                emit.MinZoom(12)
                emit.Attribute("class", "ferry")

        # aeroway (lua :599-604)
        if aeroway != "":
            emit.Layer("aeroway", g.as_polys() if is_closed else g.as_line())
            emit.Attribute("class", aeroway)
            emit.Attribute("ref", t.get("ref", ""))
            write_name = True
        if aeroway == "aerodrome":
            emit.LayerAsCentroid("aerodrome_label", g.centroid_geom())
            self.set_name_attributes(t, emit)
            emit.Attribute("iata", t.get("iata", ""))
            self.set_ele_attributes(t, emit)
            emit.Attribute("icao", t.get("icao", ""))
            av = t.get("aerodrome", "")
            emit.Attribute("class", av if av in AERODROME_VALUES else "other")

        # waterway lines (lua :621-645)
        if waterway in WATERWAY_CLASSES and not is_closed:
            if waterway == "river" and "name" in t:
                emit.Layer("waterway", g.as_line())
            else:
                emit.Layer("waterway_detail", g.as_line())
            emit.AttributeNumeric("intermittent",
                                  1 if t.get("intermittent") == "yes" else 0)
            emit.Attribute("class", waterway)
            self.set_name_attributes(t, emit)
            self.set_brunnel_attributes(t, emit)
        elif waterway == "boatyard":
            emit.Layer("landuse", g.as_polys() if is_closed else g.as_line())
            emit.Attribute("class", "industrial")
            emit.MinZoom(12)
        elif waterway == "dam":
            emit.Layer("building", g.as_polys() if is_closed else g.as_line())
        elif waterway == "fuel":
            emit.Layer("landuse", g.as_polys() if is_closed else g.as_line())
            emit.Attribute("class", "industrial")
            emit.MinZoom(14)
        if waterway in WATERWAY_CLASSES and not is_closed:
            if waterway == "river" and "name" in t:
                emit.Layer("water_name", g.as_line())
            else:
                emit.Layer("water_name_detail", g.as_line())
                emit.MinZoom(14)
            emit.Attribute("class", waterway)
            self.set_name_attributes(t, emit)

        # building (lua :648-652)
        if building != "":
            emit.Layer("building", g.as_polys())
            self.set_building_height_attributes(t, emit)
            self.set_minzoom_by_area(emit, g.area())

        # housenumber (lua :655-658)
        if housenumber != "":
            emit.LayerAsCentroid("housenumber", g.centroid_geom())
            emit.Attribute("housenumber", housenumber)

        # water polygons (lua :661-684)
        if (natural == "water" or leisure == "swimming_pool"
                or landuse in ("reservoir", "basin")
                or waterway in WATER_CLASSES):
            if t.get("covered") == "yes" or not is_closed:
                return
            cls = "river" if waterway != "" else "lake"
            if cls == "lake" and t.get("wikidata") == "Q192770":
                return
            emit.Layer("water", g.as_polys())
            self.set_minzoom_by_area(emit, g.area())
            emit.Attribute("class", cls)
            if t.get("intermittent") == "yes":
                emit.Attribute("intermittent", "1")
            if ("name" in t and natural == "water"
                    and water not in ("basin", "wastewater")):
                emit.LayerAsCentroid("water_name_detail", g.centroid_geom())
                self.set_name_attributes(t, emit)
                self.set_minzoom_by_area(emit, g.area())
                emit.Attribute("class", cls)
            return

        # landcover / landuse (lua :687-711)
        l = landuse or natural or leisure
        if l in LANDCOVER_KEYS:
            emit.Layer("landcover", g.as_polys())
            self.set_minzoom_by_area(emit, g.area())
            emit.Attribute("class", LANDCOVER_KEYS[l])
            if l == "wetland":
                emit.Attribute("subclass", t.get("wetland", ""))
            else:
                emit.Attribute("subclass", l)
            write_name = True
        else:
            l = l or amenity or tourism
            if l in LANDUSE_KEYS:
                emit.Layer("landuse", g.as_polys())
                emit.Attribute("class", l)
                if l == "residential":
                    if g.area() < ZRES8 * ZRES8:
                        emit.MinZoom(8)
                    else:
                        self.set_minzoom_by_area(emit, g.area())
                else:
                    emit.MinZoom(11)
                write_name = True

        # parks (lua :715-716)
        if boundary == "national_park":
            emit.Layer("park", g.as_polys())
            emit.Attribute("class", boundary)
            self.set_name_attributes(t, emit)
        elif leisure == "nature_reserve":
            emit.Layer("park", g.as_polys())
            emit.Attribute("class", leisure)
            self.set_name_attributes(t, emit)

        # POIs (lua :719-720)
        rank, cls, subclass = self.get_poi_rank(t)
        if rank is not None:
            self.write_poi(t, g, emit, cls, subclass, rank)
            return

        # catch-all (lua :723-728)
        if (building != "" or write_name) and "name" in t:
            emit.LayerAsCentroid("poi_detail", g.centroid_geom())
            self.set_name_attributes(t, emit)
            rank = 6 if write_name else 25
            emit.AttributeNumeric("rank", rank)
