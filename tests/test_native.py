"""Native C++ tier: PLY and PNG codecs vs Python references."""

import numpy as np
import pytest

from ray_eater_tpu.native import loader as native
from ray_eater_tpu.models.gaussians import load_ply, random_cloud, save_ply


requires_native = pytest.mark.skipif(not native.available(),
                                     reason="native tier not built")


@requires_native
def test_native_ply_matches_python(tmp_path):
    cloud = random_cloud(100, seed=4)
    path = str(tmp_path / "scene.ply")
    save_ply(path, cloud)
    props, data = native.read_ply(path)
    # INRIA 3DGS exporter layout: x,y,z, zero normals, f_dc, opacity,
    # scale, rot → 17 float properties
    assert props[:6] == ["x", "y", "z", "nx", "ny", "nz"]
    assert data.shape == (100, 17)
    assert np.all(data[:, 3:6] == 0.0)
    np.testing.assert_allclose(data[:, :3], np.asarray(cloud.means),
                               atol=1e-6)
    # load_ply routes through the native reader and applies activations
    loaded = load_ply(path)
    np.testing.assert_allclose(np.asarray(loaded.opacities),
                               np.asarray(cloud.opacities), atol=1e-5)


@requires_native
def test_native_png_roundtrip():
    rng = np.random.RandomState(0)
    img = (rng.rand(37, 61, 4) * 255).astype(np.uint8)
    data = native.png_encode(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = native.png_decode(data)
    np.testing.assert_array_equal(out, img)
    # RGB too
    img3 = img[..., :3].copy()
    out3 = native.png_decode(native.png_encode(img3))
    np.testing.assert_array_equal(out3, img3)


@requires_native
def test_native_png_interops_with_pil():
    from PIL import Image
    import io as _io
    rng = np.random.RandomState(1)
    img = (rng.rand(16, 24, 3) * 255).astype(np.uint8)
    # PIL decodes ours
    pil = np.asarray(Image.open(_io.BytesIO(native.png_encode(img))))
    np.testing.assert_array_equal(pil, img)
    # we decode PIL's (PIL uses varied row filters → exercises unfilter)
    buf = _io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    ours = native.png_decode(buf.getvalue())
    np.testing.assert_array_equal(ours, img)


@requires_native
def test_native_png_rejects_garbage():
    with pytest.raises(ValueError):
        native.png_decode(b"not a png at all")


@requires_native
def test_save_load_image_use_native(tmp_path):
    from ray_eater_tpu.io.image import load_image, save_png
    img = (np.random.RandomState(2).rand(20, 33, 4) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    save_png(p, img)
    back = load_image(p)
    np.testing.assert_array_equal(back, img)
