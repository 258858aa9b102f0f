"""Debug visualization utilities (drawLines parity + PLY line dump)."""
import numpy as np

from line3d_tpu.fit.lines import FinalLine3D
from line3d_tpu.utils import visualize


def test_draw_lines_rasterizes_and_highlights(tmp_path):
    segs = np.array([[2.0, 5.0, 57.0, 5.0],     # horizontal
                     [10.0, 2.0, 10.0, 37.0]])  # vertical
    img = visualize.draw_lines(segs, width=64, height=40,
                               highlight=[1], thickness=4)
    assert img.shape == (40, 64, 3) and img.dtype == np.uint8
    # the horizontal segment is white along y=5 (reference draws white,
    # view.cc:429)
    assert (img[5, 10] == (255, 255, 255)).all() or \
           (img[5, 10] == (255, 0, 0)).all()      # crossing point may be red
    assert (img[5, 30] == (255, 255, 255)).all()
    # the highlighted vertical segment is red (view.cc:440)
    assert (img[30, 10] == (255, 0, 0)).all()
    # background stays black
    assert (img[35, 60] == 0).all()

    # PPM roundtrip
    out = str(tmp_path / "view.ppm")
    visualize.save_ppm(img, out)
    with open(out, "rb") as f:
        assert f.readline().strip() == b"P6"
        assert f.readline().split() == [b"64", b"40"]
        f.readline()
        data = np.frombuffer(f.read(), np.uint8).reshape(40, 64, 3)
    np.testing.assert_array_equal(data, img)


def test_save_ply_line_set(tmp_path):
    line = FinalLine3D(
        segments3d=np.array([[[0.0, 0, 0], [1, 0, 0]],
                             [[2.0, 0, 0], [3, 0, 0]]]),
        views2d=np.array([0], np.int32), segs2d=np.array([0], np.int32))
    out = str(tmp_path / "model.ply")
    visualize.save_ply([line, line], out)
    txt = open(out).read().splitlines()
    assert txt[0] == "ply"
    assert "element vertex 8" in txt
    assert "element edge 4" in txt
    body = txt[txt.index("end_header") + 1:]
    assert len(body) == 8 + 4
    # first vertex is the first endpoint, white
    assert body[0].split() == ["0.000000", "0.000000", "0.000000",
                               "255", "255", "255"]
    # edges reference consecutive vertex pairs
    assert body[8].split() == ["0", "1"]
    assert body[-1].split() == ["6", "7"]
