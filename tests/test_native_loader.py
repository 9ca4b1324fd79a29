"""Native (C++) image pipeline vs the PIL path."""

import numpy as np
import pytest

from dl_vqa_tpu.data import synthetic
from dl_vqa_tpu.data.native_loader import native_available


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_imgs")
    ids = list(range(500, 510))
    synthetic.generate_coco_images(
        str(root), ids, size=(320, 240), data_subtype="val2014"
    )
    return str(root), ids


pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library not buildable here"
)


def test_native_matches_pil_within_one_lsb(image_dir):
    from dl_vqa_tpu.data.native_loader import NativeJpegLoader
    from dl_vqa_tpu.data.online import JpegLoader

    root, ids = image_dir
    pil = JpegLoader(root, image_size=96, central_fraction=0.875)
    native = NativeJpegLoader(root, image_size=96, central_fraction=0.875)
    a = pil.load_batch(np.array(ids))
    b = native.load_batch(np.array(ids))
    assert a.shape == b.shape == (len(ids), 96, 96, 3)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_offline_builder_native_matches_pil(image_dir, tmp_path):
    """The batched native cache builder (data/images.py backend='native')
    must agree with the serial PIL parity path: identical ids/order, and
    features within the +-1 pre-normalize uint8 LSB envelope (i.e.
    (1/255)/min(std) after normalization) plus fp16 rounding."""
    import h5py

    from dl_vqa_tpu.data.images import IMAGENET_STD, preprocess_images

    root, _ = image_dir
    paths = {"base_path": root, "imgs": "."}
    out = {}
    for backend in ("pil", "native"):
        h5_path = str(tmp_path / f"cache_{backend}.h5")
        n = preprocess_images(
            paths, paths, image_size=96, central_fraction=0.875,
            processed_path=h5_path, log=lambda *_: None, backend=backend,
            batch_size=4,
        )
        assert n >= 10
        with h5py.File(h5_path, "r") as fd:
            out[backend] = (fd["features"][:], fd["ids"][:])
    feats_pil, ids_pil = out["pil"]
    feats_nat, ids_nat = out["native"]
    np.testing.assert_array_equal(ids_pil, ids_nat)
    tol = (1.0 / 255.0) / float(IMAGENET_STD.min()) + 2e-3  # LSB + fp16
    assert np.abs(
        feats_pil.astype(np.float32) - feats_nat.astype(np.float32)
    ).max() <= tol


def test_native_failure_reporting(image_dir):
    """A truly undecodable file still raises (via the PIL rescue path,
    which is the arbiter of what is decodable)."""
    from dl_vqa_tpu.data.native_loader import NativeJpegLoader

    root, ids = image_dir
    native = NativeJpegLoader(root, image_size=96, central_fraction=0.875)
    native._path_by_id[99999] = "/nonexistent/file.jpg"
    with pytest.raises(OSError):
        native.load_batch(np.array([ids[0], 99999]))


def test_native_rescues_pil_decodable_files(image_dir, tmp_path):
    """libjpeg hard-fails on non-JPEG bytes with a .jpg name (and CMYK
    JPEGs); the wrapper must rescue those through PIL so the native
    loader stays a drop-in for the PIL path instead of aborting runs."""
    from PIL import Image

    from dl_vqa_tpu.data.native_loader import NativeJpegLoader

    root, ids = image_dir
    png_as_jpg = str(tmp_path / "COCO_val2014_000000099998.jpg")
    rgb = np.arange(96 * 128 * 3, dtype=np.uint8).reshape(96, 128, 3)
    Image.fromarray(rgb).save(png_as_jpg, format="PNG")  # PNG bytes, .jpg name

    native = NativeJpegLoader(root, image_size=64, central_fraction=0.875)
    native._path_by_id[99998] = png_as_jpg
    out = native.load_batch(np.array([ids[0], 99998]))
    assert out.shape == (2, 64, 64, 3)
    # The rescued slot holds real (PIL-decoded) pixels, not zero fill.
    assert out[1].any()


def test_native_portrait_and_landscape(image_dir):
    """Shorter-edge resize must handle both orientations."""
    from dl_vqa_tpu.data.native_loader import NativeJpegLoader
    from dl_vqa_tpu.data.online import JpegLoader

    root = image_dir[0]
    ids = [700, 701]
    synthetic.generate_coco_images(
        root, [700], size=(200, 400), data_subtype="val2014"
    )
    synthetic.generate_coco_images(
        root, [701], size=(400, 200), data_subtype="val2014"
    )
    pil = JpegLoader(root, image_size=64, central_fraction=0.875)
    native = NativeJpegLoader(root, image_size=64, central_fraction=0.875)
    a = pil.load_batch(np.array(ids))
    b = native.load_batch(np.array(ids))
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_native_batch_status_symbol_present():
    """The built .so must export vqa_process_batch_status (per-image
    failure reporting): without it the rescue path degrades to a serial
    re-probe of every slot in the batch."""
    from dl_vqa_tpu.data.native_loader import load_native_library

    lib = load_native_library()
    if lib is None:
        import pytest

        pytest.skip("native library unavailable")
    assert hasattr(lib, "vqa_process_batch_status")
