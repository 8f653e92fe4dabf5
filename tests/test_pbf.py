"""Golden-fixture parity with the reference's pbf_reader test
(/root/reference/test/pbf_reader.test.cpp:7-120) on test/monaco.pbf."""

import numpy as np
import pytest

from tilemaker_ray.sources import pbf

MONACO = "/root/reference/test/monaco.pbf"


@pytest.fixture(scope="module")
def blobs():
    return list(pbf.iter_blobs(MONACO))


class TestMonacoParity:
    def test_header(self, blobs):
        btype, data = blobs[0]
        assert btype == "OSMHeader"
        hb = pbf.parse_header(data)
        assert hb.bbox == pytest.approx((7.409205, 43.723350, 7.448637, 43.751690))
        assert "Sort.Type_then_ID" in hb.optional_features

    def test_counts(self, blobs):
        data_blobs = [d for t, d in blobs if t == "OSMData"]
        assert len(data_blobs) == 6
        groups = strings = nodes = ways = relations = 0
        found_node = found_way = found_rel = False
        string_200 = None
        for d in data_blobs:
            pb = pbf.parse_primitive_block(d)
            groups += pb.n_groups
            for s in pb.strings:
                if strings == 200:
                    string_200 = s.decode()
                strings += 1
            ids, lat, lon, tags = pbf.block_nodes(pb)
            nodes += len(ids)
            if 21911886 in ids:
                i = int(np.nonzero(ids == 21911886)[0][0])
                assert tags[i].get("highway") == "crossing"
                found_node = True
            for w in pb.ways:
                ways += 1
                if w["id"] == 4224978:
                    t = pbf.way_tags(pb, w)
                    assert t.get("sport") == "soccer"
                    assert len(w["refs"]) == 5
                    assert w["refs"][0] == 25178088
                    assert w["refs"][2] == 25178045
                    assert w["refs"][4] == 25178088
                    found_way = True
            for r in pb.relations:
                relations += 1
                if r["id"] == 1124039:
                    assert len(r["memids"]) == 17
                    assert r["types"][0] == pbf.MEMBER_NODE
                    assert r["types"][2] == pbf.MEMBER_WAY
                    assert r["types"][16] == pbf.MEMBER_RELATION
                    found_rel = True
        assert (groups, strings, nodes, ways, relations) == (6, 8236, 30477, 4825, 285)
        assert string_200 == "description:FR"
        assert found_node and found_way and found_rel

    def test_blob_offsets_roundtrip(self, blobs):
        offs = pbf.blob_offsets(MONACO)
        assert len(offs) == len(blobs)
        # reading by offset gives identical payloads (the per-task read)
        for (off, ln, t), (t2, d2) in zip(offs, blobs):
            assert t == t2
            assert pbf.read_blob_at(MONACO, off, ln) == d2

    def test_packed_varint_kernel(self):
        rng = np.random.default_rng(3)
        vals = rng.integers(0, 1 << 62, 500, dtype=np.uint64)
        buf = bytearray()
        for v in vals.tolist():
            while True:
                b = v & 0x7F
                v >>= 7
                if v:
                    buf.append(b | 0x80)
                else:
                    buf.append(b)
                    break
        got = pbf.decode_packed_varints(bytes(buf))
        np.testing.assert_array_equal(got, vals)
