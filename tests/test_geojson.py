import json

import numpy as np
import pytest

from tilemaker_ray import tilemath as tm
from tilemaker_ray.geom import core as gc
from tilemaker_ray.sources.geojson import (get_newline_chunks,
                                           read_geojson_layer,
                                           read_geojsonl_chunk)
from tilemaker_ray.stages.spatial_join import PolygonIndex


def poly_feature(name, lon0, lat0, w, h, **props):
    return {"type": "Feature",
            "properties": {"name": name, **props},
            "geometry": {"type": "Polygon", "coordinates": [[
                [lon0, lat0], [lon0 + w, lat0], [lon0 + w, lat0 + h],
                [lon0, lat0 + h], [lon0, lat0]]]}}


class TestGeoJSON:
    def test_feature_collection(self, tmp_path):
        fc = {"type": "FeatureCollection", "features": [
            poly_feature("a", 0, 0, 2, 2, cls="park"),
            {"type": "Feature", "properties": {"name": "pt"},
             "geometry": {"type": "Point", "coordinates": [5.0, 45.0]}},
            {"type": "Feature", "properties": {"name": "ln"},
             "geometry": {"type": "LineString",
                          "coordinates": [[0, 0], [1, 1], [2, 0]]}},
        ]}
        p = tmp_path / "x.geojson"
        p.write_text(json.dumps(fc))
        recs = read_geojson_layer(str(p))
        assert len(recs) == 3
        assert recs[0]["name"] == "a"
        assert gc.ring_signed_area(recs[0]["ring"]) < 0  # boost-corrected
        assert recs[1]["point"][0] == 5.0
        assert recs[1]["point"][1] == pytest.approx(float(tm.lat2latp(45.0)))
        assert len(recs[2]["lines"][0]) == 3

    def test_source_columns_and_attribute_function(self, tmp_path):
        fc = {"type": "FeatureCollection", "features": [
            poly_feature("a", 0, 0, 1, 1, cls="park", junk="drop")]}
        p = tmp_path / "x.geojson"
        p.write_text(json.dumps(fc))

        def remap(attrs, layer):
            out = {"kind": attrs.get("cls", ""), "name": attrs.get("name", "")}
            out["_minzoom"] = 7
            return out

        recs = read_geojson_layer(str(p), source_columns=["name", "cls"],
                                  attribute_function=remap, layer_name="parks")
        assert recs[0]["attrs"] == {"kind": "park", "name": "a"}
        assert recs[0]["minzoom"] == 7

    def test_jsonl_chunked_parse_covers_all(self, tmp_path):
        p = tmp_path / "x.jsonl"
        feats = [poly_feature(f"f{i}", i, 0, 0.5, 0.5) for i in range(97)]
        p.write_text("\n".join(json.dumps(f) for f in feats) + "\n")
        chunks = get_newline_chunks(str(p), 7)
        assert chunks[0][0] == 0
        assert chunks[-1][1] == p.stat().st_size
        # chunks are disjoint and contiguous
        for (s1, e1), (s2, e2) in zip(chunks, chunks[1:]):
            assert e1 == s2
        got = []
        for s, e in chunks:
            got.extend(r["name"] for r in read_geojsonl_chunk(str(p), s, e))
        assert got == [f"f{i}" for i in range(97)]

    def test_jsonl_single_chunk(self, tmp_path):
        p = tmp_path / "x.jsonl"
        p.write_text(json.dumps(poly_feature("only", 0, 0, 1, 1)) + "\n")
        chunks = get_newline_chunks(str(p), 5)
        got = []
        for s, e in chunks:
            got.extend(read_geojsonl_chunk(str(p), s, e))
        assert len(got) == 1

    def test_loaded_layer_feeds_spatial_index(self, tmp_path):
        fc = {"type": "FeatureCollection", "features": [
            poly_feature("left", -10, -5, 8, 10),
            poly_feature("right", 2, -5, 8, 10)]}
        p = tmp_path / "r.geojson"
        p.write_text(json.dumps(fc))
        recs = read_geojson_layer(str(p))
        idx = PolygonIndex(recs)
        hit = idx.find_intersecting(gc.POINT_, (-5.0, float(tm.lat2latp(0.0))))
        assert [recs[i]["name"] for i in hit] == ["left"]
        hit2 = idx.find_intersecting(gc.POINT_, (5.0, float(tm.lat2latp(0.0))))
        assert [recs[i]["name"] for i in hit2] == ["right"]
