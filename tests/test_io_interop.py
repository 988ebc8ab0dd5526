"""External-codec interchange tests.

Round 1 could not validate the owned codecs against ANY third-party
implementation (no EXR/HDR library in the image; NOTES_ROUND2.md item 5).
This environment ships OpenCV with a Radiance HDR codec (EXR remains
unavailable: cv2 5.0 built without OpenEXR, imageio has no EXR backend),
so the .hdr writer/reader get real interop coverage: files we write must
read back identically through cv2, and cv2-written files through us.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from hdrvae.io import hdr as hdr_io


def _hdr_image(rng, h=24, w=33):
    img = rng.standard_normal((h, w, 3)).astype(np.float32) * 2
    img = np.abs(img)          # Radiance RGBE is unsigned
    img[0, 0] = [0.0, 0.0, 0.0]
    img[1, 1] = [37.5, 0.01, 4.0]   # wide shared-exponent spread
    return img


def _rgbe_quantum(img):
    """Per-pixel RGBE quantization step: 2^(e-8) of the shared exponent."""
    maxc = np.maximum(img.max(axis=-1, keepdims=True), 1e-32)
    _, e = np.frexp(maxc)
    return np.ldexp(1.0, e - 8)


def test_our_hdr_read_by_cv2(tmp_path, rng):
    """cv2 (Radiance reference implementation lineage) decodes our RLE
    scanlines to the same RGBE-quantized values."""
    img = _hdr_image(rng)
    path = str(tmp_path / "ours.hdr")
    hdr_io.write_hdr(path, img)

    theirs = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    assert theirs is not None, "cv2 failed to parse our .hdr"
    theirs = theirs[..., ::-1]  # BGR -> RGB
    ours = hdr_io.read_hdr(path)

    assert theirs.shape == ours.shape == img.shape
    # both decoders must agree bit-for-bit on the decoded floats
    np.testing.assert_array_equal(theirs, ours)
    # and the round trip stays within one RGBE quantum of the source
    assert np.abs(ours - img).max() <= _rgbe_quantum(img).max() * 1.01


def test_cv2_hdr_read_by_us(tmp_path, rng):
    """Files produced by cv2's Radiance writer decode identically here."""
    img = _hdr_image(rng, h=17, w=64)
    path = str(tmp_path / "cv2.hdr")
    assert cv2.imwrite(path, img[..., ::-1])  # cv2 takes BGR

    ours = hdr_io.read_hdr(path)
    theirs = cv2.imread(path, cv2.IMREAD_UNCHANGED)[..., ::-1]
    np.testing.assert_array_equal(ours, theirs)


def test_hdr_preserves_above_one_through_cv2(tmp_path, rng):
    """The HDR contract (values > 1.0 survive) holds through a foreign
    decoder, not just our own read-back."""
    img = np.full((8, 8, 3), 6.5, np.float32)
    path = str(tmp_path / "bright.hdr")
    hdr_io.write_hdr(path, img)
    back = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    assert back is not None
    assert float(back.max()) > 6.0
