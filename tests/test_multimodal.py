import numpy as np
import pytest

from tilemaker_ray.ops import multimodal as mm


class TestDecode:
    def test_fake_codec_deterministic(self):
        t = mm.synth_image_table(5)
        p = t.column("payload")[0].as_py()
        a = mm.decode_image(p, "image/fake")
        b = mm.decode_image(p, "image/fake")
        np.testing.assert_array_equal(a, b)
        assert a.shape == (t.column("height")[0].as_py(), t.column("width")[0].as_py())

    def test_unknown_codec_raises(self):
        with pytest.raises(NotImplementedError, match="codec"):
            mm.decode_image(b"\x00" * 16, "image/jpeg")


class TestFeaturizer:
    def test_direct_call(self):
        t = mm.synth_image_table(20)
        f = mm.ImageFeaturizer()
        out = f(t)
        assert out.num_rows == 20
        emb = out.column("embedding")[0].as_py()
        assert len(emb) == mm.FEATURE_DIM
        # deterministic
        out2 = mm.ImageFeaturizer()(t)
        np.testing.assert_array_equal(out.column("mean_luma").to_numpy(),
                                      out2.column("mean_luma").to_numpy())


@pytest.mark.usefixtures("ray_session")
class TestPipeline:
    def test_image_feature_dataset(self):
        df = mm.image_feature_dataset(n=200, concurrency=2).to_pandas()
        assert len(df) == 200
        assert df.embedding.map(len).eq(mm.FEATURE_DIM).all()
        assert df.mean_luma.between(100, 155).all()  # uniform pixels ≈ 127.5
