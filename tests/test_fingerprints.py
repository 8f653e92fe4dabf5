"""Audio (Haitsma-Kalker subfingerprint) and video (frame-pHash)
near-dup ops — margins, parity with brute force, negative controls."""

import itertools

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from tilemaker_ray.ops.audiofp import (AFP_BER_T, audio_dup_pairs,
                                       audio_subfps, subfp_ber,
                                       synth_audiofp_table)
from tilemaker_ray.ops.multimodal import (AUDIO_SR, decode_wav,
                                          encode_g711_wav,
                                          encode_ima_adpcm_wav)
from tilemaker_ray.ops.videofp import (MATCH_FRAC, clip_frame_hashes,
                                       clip_match_frac, synth_videofp_table,
                                       video_dup_pairs)


def _tone(dur_s=1.5, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(int(AUDIO_SR * dur_s)) / AUDIO_SR
    x = np.zeros(len(t))
    for _ in range(8):
        env = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.8, 4.0) * t
                                 + rng.uniform(0, 6.28))
        x += (rng.uniform(0.1, 1.0) * env
              * np.sin(2 * np.pi * rng.uniform(120, 3500) * t))
    # broadband noise bed: without it, inter-partial bands sit at the
    # codec noise floor and their HK bits are coin flips
    nz = np.fft.irfft(np.fft.rfft(rng.standard_normal(len(t))), len(t))
    x = x + 0.03 * nz / nz.std()
    return (x / np.abs(x).max() * 0.8).astype(np.float32)


class TestAudioFP:
    def test_gain_invariance(self):
        x = _tone()
        a = audio_subfps(x)
        b = audio_subfps(0.4 * x)
        assert subfp_ber(a, b) < 0.01

    def test_g711_reencode_ber_separates(self):
        x = _tone()
        a = audio_subfps(x)
        for law in ("mu", "a"):
            y, sr = decode_wav(encode_g711_wav(0.7 * x, law))
            assert subfp_ber(a, audio_subfps(y, sr)) < AFP_BER_T
        other = audio_subfps(_tone(seed=4))
        assert subfp_ber(a, other) > 0.35

    def test_adpcm_negative_control(self):
        """IMA ADPCM's 4-bit quantization noise lands dup BER in the
        distinct range — documented OUT of scope for this op."""
        x = _tone()
        y, sr = decode_wav(encode_ima_adpcm_wav(0.7 * x))
        assert subfp_ber(audio_subfps(x), audio_subfps(y, sr)) > AFP_BER_T

    def test_band_slices_strictly_increasing(self):
        """Review r4: rounded log-spaced edges coincide at some sample
        rates (sr=16000 was the repro), giving a zero-width band whose
        bit column degrades to noise.  Edges must be strictly
        increasing and stay inside the rfft bin count at ANY sr."""
        from tilemaker_ray.ops.audiofp import _band_slices
        for sr in (8000, 11025, 16000, 22050, 44100, 48000, 96000):
            for frame in (256, 512, 1024):
                s = _band_slices(sr, frame)
                assert (np.diff(s) >= 1).all(), (sr, frame)
                assert s[0] >= 1 and s[-1] <= frame // 2 + 1, (sr, frame)

    @pytest.mark.usefixtures("ray_session")
    def test_dup_pairs_match_bruteforce(self):
        t = synth_audiofp_table(40)
        got = audio_dup_pairs(ray.data.from_arrow(t))
        fps = {}
        for did, p in zip(t.column("doc_id").to_pylist(),
                          t.column("payload").to_pylist()):
            x, sr = decode_wav(p)
            fps[did] = audio_subfps(x, sr)
        bf = {(a, b) for a, b in itertools.combinations(sorted(fps), 2)
              if subfp_ber(fps[a], fps[b]) <= AFP_BER_T}
        assert bf == set(zip(got.doc_a, got.doc_b))
        planted = {(i, 40 + k) for k, i in enumerate(range(0, 40, 5))}
        assert planted <= set(zip(got.doc_a, got.doc_b))


class TestVideoFP:
    def test_match_frac_trim_invariant(self):
        t = synth_videofp_table(5)
        hs = [clip_frame_hashes(p.as_py(), m.as_py())
              for p, m in zip(t.column("payload"), t.column("media_type"))]
        # clip 5 is the planted trimmed re-encode of clip 0
        assert clip_match_frac(hs[0], hs[5]) == 1.0
        assert clip_match_frac(hs[0], hs[1]) < 0.3

    @pytest.mark.usefixtures("ray_session")
    def test_dup_pairs_match_bruteforce(self):
        t = synth_videofp_table(30)
        got = video_dup_pairs(ray.data.from_arrow(t))
        hs = {did: clip_frame_hashes(p.as_py(), m.as_py())
              for did, p, m in zip(t.column("doc_id").to_pylist(),
                                   t.column("payload"),
                                   t.column("media_type"))}
        bf = {(a, b) for a, b in itertools.combinations(sorted(hs), 2)
              if clip_match_frac(hs[a], hs[b]) >= MATCH_FRAC}
        assert bf == set(zip(got.doc_a, got.doc_b))
        planted = {(i, 30 + k) for k, i in enumerate(range(0, 30, 5))}
        assert planted <= set(zip(got.doc_a, got.doc_b))
        assert (got.match_frac == 1.0).all()

    @pytest.mark.usefixtures("ray_session")
    def test_hot_key_cap_bounds_pairs(self):
        """max_df drops a degenerate bucket (identical black clips)
        instead of emitting O(m^2) pairs."""
        from tilemaker_ray.ops.multimodal import encode_pgm
        import pyarrow as pa
        black = b"".join(encode_pgm(np.zeros((32, 32), np.uint8))
                         for _ in range(8))
        t = pa.table({"doc_id": list(range(20)),
                      "media_type": ["video/x-raw-pgm"] * 20,
                      "payload": [black] * 20,
                      "n_frames": [8] * 20})
        got = video_dup_pairs(ray.data.from_arrow(t), max_df=5)
        assert len(got) == 0
        full = video_dup_pairs(ray.data.from_arrow(t), max_df=None)
        assert len(full) == 20 * 19 // 2


@pytest.mark.usefixtures("ray_session")
class TestQuarantine:
    """on_error='quarantine': one corrupt payload must not sink the
    block — failed rows carry an error string and are excluded from
    the pair exchange; strict mode still raises (100 TB posture:
    corrupt media rows are a certainty)."""

    def _poisoned(self, t, bad_id):
        import pyarrow as pa
        bad = {"doc_id": [bad_id], "media_type": ["video/x-raw-pgm"],
               "payload": [b"\x00garbage-not-a-frame"]}
        for name in t.column_names:
            if name not in bad:
                bad[name] = [t.column(name)[0].as_py()]
        return pa.concat_tables(
            [t, pa.table({n: pa.array(bad[n], t.schema.field(n).type)
                          for n in t.column_names})])

    def test_video_quarantine(self):
        from tilemaker_ray.ops.videofp import (video_dup_pairs,
                                               video_fp_dataset,
                                               synth_videofp_table)
        t = self._poisoned(synth_videofp_table(10), 999)
        with pytest.raises(Exception):
            video_dup_pairs(ray.data.from_arrow(t))
        got = video_dup_pairs(ray.data.from_arrow(t),
                              on_error="quarantine")
        clean = video_dup_pairs(ray.data.from_arrow(
            synth_videofp_table(10)))
        pd.testing.assert_frame_equal(got, clean)
        fp = video_fp_dataset(ray.data.from_arrow(t),
                              on_error="quarantine").to_pandas()
        bad = fp[fp.doc_id == 999]
        assert len(bad) == 1 and bad.iloc[0].error != ""
        assert (fp[fp.doc_id != 999].error == "").all()

    def test_image_quarantine(self):
        import pyarrow as pa
        from tilemaker_ray.ops.phash import (phash_dup_pairs,
                                             phash_dataset,
                                             synth_phash_table)
        t = synth_phash_table(10)
        bad = pa.table({n: pa.array(
            [b"\xff\xd8broken" if n == "payload"
             else ("image/jpeg" if n == "media_type"
                   else t.column(n)[0].as_py())],
            t.schema.field(n).type) for n in t.column_names})
        bad = bad.set_column(bad.schema.get_field_index("doc_id"),
                             "doc_id", pa.array([999]))
        t2 = pa.concat_tables([t, bad])
        with pytest.raises(Exception):
            phash_dup_pairs(ray.data.from_arrow(t2))
        got = phash_dup_pairs(ray.data.from_arrow(t2),
                              on_error="quarantine")
        clean = phash_dup_pairs(ray.data.from_arrow(t))
        pd.testing.assert_frame_equal(got, clean)
        fp = phash_dataset(ray.data.from_arrow(t2),
                           on_error="quarantine").to_pandas()
        assert (fp[fp.doc_id == 999].error != "").all()

    def test_audio_quarantine(self):
        import pyarrow as pa
        from tilemaker_ray.ops.audiofp import (audio_dup_pairs,
                                               synth_audiofp_table)
        t = synth_audiofp_table(10)
        bad = pa.table({n: pa.array(
            [b"RIFFnope" if n == "payload"
             else (999 if n == "doc_id"
                   else t.column(n)[0].as_py())],
            t.schema.field(n).type) for n in t.column_names})
        t2 = pa.concat_tables([t, bad])
        with pytest.raises(Exception):
            audio_dup_pairs(ray.data.from_arrow(t2))
        got = audio_dup_pairs(ray.data.from_arrow(t2),
                              on_error="quarantine")
        clean = audio_dup_pairs(ray.data.from_arrow(t))
        pd.testing.assert_frame_equal(got, clean)


class TestDistributedVerify:
    """VERDICT r4 #1: the fingerprint verify must never pull the
    candidate frame or a sequence dict to the driver — the verify
    stage's input is a Dataset of (pair, routed seq) rows, and the
    bucket scorers must equal the scalar references bit-for-bit."""

    def test_subfp_ber_batch_parity(self):
        from tilemaker_ray.ops.audiofp import subfp_ber, subfp_ber_batch
        rng = np.random.default_rng(7)
        aa, bb = [], []
        for _ in range(40):
            la = int(rng.integers(0, 50))
            lb = int(rng.integers(0, 50))
            aa.append(rng.integers(0, 2**32, la).astype(np.uint32))
            bb.append(rng.integers(0, 2**32, lb).astype(np.uint32))
        got = subfp_ber_batch(aa, bb)
        want = np.array([subfp_ber(a, b) for a, b in zip(aa, bb)])
        np.testing.assert_allclose(got, want, rtol=0, atol=0)

    def test_clip_match_frac_batch_parity(self):
        from tilemaker_ray.ops.videofp import (clip_match_frac,
                                               clip_match_frac_batch)
        rng = np.random.default_rng(11)
        aa, bb = [], []
        for _ in range(40):
            la = int(rng.integers(0, 20))
            lb = int(rng.integers(0, 20))
            aa.append(rng.integers(0, 2**63, la).astype(np.uint64))
            bb.append(rng.integers(0, 2**63, lb).astype(np.uint64))
        # plant near-matches so the <=ham branch is exercised
        for i in range(0, 40, 4):
            if len(aa[i]) and len(bb[i]):
                bb[i][0] = aa[i][0] ^ np.uint64(0b101)
        for ham in (0, 3, 6):
            got = clip_match_frac_batch(aa, bb, ham)
            want = np.array([clip_match_frac(a, b, ham)
                             for a, b in zip(aa, bb)])
            np.testing.assert_allclose(got, want, rtol=0, atol=0)

    def test_clip_match_frac_batch_chunked(self):
        from tilemaker_ray.ops.videofp import (clip_match_frac,
                                               clip_match_frac_batch)
        rng = np.random.default_rng(13)
        aa = [rng.integers(0, 2**63, 15).astype(np.uint64)
              for _ in range(12)]
        bb = [rng.integers(0, 2**63, 17).astype(np.uint64)
              for _ in range(12)]
        got = clip_match_frac_batch(aa, bb, 6, chunk_elems=300)
        want = np.array([clip_match_frac(a, b, 6)
                         for a, b in zip(aa, bb)])
        np.testing.assert_allclose(got, want)

    def test_verify_input_is_a_dataset_of_pair_and_seq_rows(self):
        """The verify stage consumes (vb, kind, doc_a, doc_b, doc_id,
        seq) rows — a Dataset, not a driver frame; candidate sequences
        arrive as routed binary rows co-located with their pairs."""
        import pyarrow as pa
        from tilemaker_ray.ops.audiofp import _half_key_rows, audio_fp_dataset
        from tilemaker_ray.ops.hamming_lsh import verify_input_ds
        t = synth_audiofp_table(15)
        fps = audio_fp_dataset(ray.data.from_arrow(t)).materialize()
        vin = verify_input_ds(
            fps, _half_key_rows, "fps",
            seq_fn=lambda v: np.asarray(v, np.uint32),
            seq_dtype=np.uint32, max_df=None)
        sch = vin.schema()
        assert sch.names == ["vb", "kind", "doc_a", "doc_b",
                             "doc_id", "seq"]
        assert sch.types[sch.names.index("seq")] == pa.large_binary()
        df = vin.to_pandas()
        pairs = df[df["kind"] == 0]
        seqs = df[df["kind"] == 1]
        assert len(pairs) and len(seqs)
        # every pair's two docs have a routed sequence in its bucket
        have = set(zip(seqs["vb"], seqs["doc_id"]))
        for _, r in pairs.iterrows():
            assert (r["vb"], r["doc_a"]) in have
            assert (r["vb"], r["doc_b"]) in have
        # routed payloads decode to the fingerprint streams
        fpd = fps.to_pandas().set_index("doc_id")["fps"]
        for _, r in seqs.drop_duplicates("doc_id").iterrows():
            np.testing.assert_array_equal(
                np.frombuffer(r["seq"], np.uint32),
                np.asarray(fpd.loc[r["doc_id"]], np.uint32))
