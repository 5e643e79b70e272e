"""Native C++ frontend vs the cv2/python host path."""
import numpy as np
import pytest

from instsearch_tpu.data import frontend
from instsearch_tpu.data import native_frontend as nf
from instsearch_tpu.eval import make_mini_dataset

pytestmark = pytest.mark.skipif(not nf.available(),
                                reason="native frontend not built")


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    return make_mini_dataset(str(tmp_path_factory.mktemp("mini_nf")),
                             n_instances=2, n_views=2, n_distractors=2, seed=9)


def test_batch_matches_python_path(mini):
    paths = mini.db_paths[:6]
    size = 48
    native, ok = nf.load_batch_native(paths, size)
    assert ok.all()
    for i, p in enumerate(paths):
        ref = frontend.load_square(p, size)
        # different JPEG decoders + resize rounding: allow small deviation
        diff = np.abs(native[i].astype(int) - ref.astype(int))
        assert np.mean(diff) < 3.0, (p, np.mean(diff))
        assert np.percentile(diff, 99) <= 30


def test_corrupt_and_missing_quarantined(mini, tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8garbage not a jpeg")
    paths = [mini.db_paths[0], str(bad), str(tmp_path / "missing.jpg"),
             mini.db_paths[1]]
    out, ok = nf.load_batch_native(paths, 32)
    assert list(ok) == [True, False, False, True]
    assert out[1].sum() == 0 and out[2].sum() == 0


def test_threaded_equals_single_thread(mini):
    paths = mini.db_paths
    a, ok_a = nf.load_batch_native(paths, 40, n_threads=1)
    b, ok_b = nf.load_batch_native(paths, 40, n_threads=4)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(ok_a, ok_b)


def test_png_support(tmp_path):
    import cv2
    img = (np.random.default_rng(0).random((60, 80, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "img.png")
    cv2.imwrite(p, img[:, :, ::-1])
    out, ok = nf.load_batch_native([p], 32)
    assert ok[0]
    ref = frontend.load_square(p, 32)
    diff = np.abs(out[0].astype(int) - ref.astype(int))
    assert np.mean(diff) < 2.0


def test_half_pixel_canvas_matches_python(tmp_path):
    """Exact-.5 long side after scaling: native round-half-even must agree
    with Python round() on the resize canvas, or the center crop samples a
    shifted grid and descriptors diverge between hosts with and without
    the native toolchain (review r2). 93x64 at target 32 -> 46.5."""
    import cv2
    rng = np.random.default_rng(0)
    img = cv2.resize(rng.random((12, 8, 3), np.float32), (64, 93),
                     interpolation=cv2.INTER_CUBIC)      # h=93, w=64
    p = str(tmp_path / "odd.png")
    cv2.imwrite(p, np.clip(img * 255, 0, 255).astype(np.uint8))
    native, ok = nf.load_batch_native([p], 32)
    assert ok.all()
    ref = frontend.load_square(p, 32)
    diff = np.abs(native[0].astype(int) - ref.astype(int))
    # same canvas => only interpolation arithmetic differs (tight);
    # a one-pixel canvas disagreement shifts content by ~half a texel
    # and blows this bound
    assert np.mean(diff) < 3.0, np.mean(diff)
