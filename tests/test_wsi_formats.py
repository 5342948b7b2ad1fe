"""NDPI (Hamamatsu) and SCN (Leica) native-reader coverage.

The reference reads these formats through OpenSlide's vendor drivers
(/root/reference/configs/python/config.py:10-19 WSI_EXT;
preprocessing/patch_extraction/src/patch_extraction.py:591). The native
reader parses them directly: NDPI via a custom TIFF-like parser
(SourceLens-keyed pyramid, full-height JPEG strips, >4 GiB wrapped-offset
reconstruction), SCN via libtiff BigTIFF with the Leica collection XML
selecting the main image's directories. Fixtures reproduce those container
traits (wsi_reader.write_test_ndpi / write_test_scn).
"""

import numpy as np
import pytest

from cellvit_tpu.preprocessing.wsi_reader import (
    NativeWSIReader,
    open_slide,
    write_test_bif,
    write_test_ndpi,
    write_test_scn,
)


def _checker(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (yy * 255 // max(h - 1, 1)).astype(np.uint8),
            (xx * 255 // max(w - 1, 1)).astype(np.uint8),
            ((yy // 16 + xx // 16) % 2 * 180 + 40).astype(np.uint8),
        ],
        -1,
    )
    # a few random blobs so levels are distinguishable
    for _ in range(6):
        cy, cx = rng.integers(4, h - 4), rng.integers(4, w - 4)
        img[cy - 3 : cy + 3, cx - 3 : cx + 3] = rng.integers(0, 255, 3)
    return img


def _downsample(img):
    h2, w2 = img.shape[0] // 2, img.shape[1] // 2
    return (
        img[: h2 * 2, : w2 * 2]
        .reshape(h2, 2, w2, 2, 3)
        .mean((1, 3))
        .astype(np.uint8)
    )


class TestNdpi:
    def test_raw_roundtrip_two_levels(self, tmp_path):
        img = _checker(96, 128)
        p = tmp_path / "slide.ndpi"
        write_test_ndpi(str(p), img, mpp=0.25, magnification=40.0,
                        n_levels=2, compression="none")
        r = open_slide(str(p))
        assert isinstance(r, NativeWSIReader)
        # macro (SourceLens −1) must not count as a pyramid level
        assert r.level_count == 2
        assert r.dimensions == (128, 96)
        assert r.level_dimensions[1] == (64, 48)
        assert r.magnification == pytest.approx(40.0)
        assert r.mpp == pytest.approx(0.25, rel=1e-3)
        # level 0: interior crop + corner-overhang crop (white fill)
        np.testing.assert_array_equal(
            r.read_region((16, 8), 0, (64, 48)), img[8:56, 16:80]
        )
        over = r.read_region((100, 80), 0, (64, 32))
        np.testing.assert_array_equal(over[:16, :28], img[80:96, 100:128])
        assert (over[16:] == 255).all() and (over[:, 28:] == 255).all()
        # level 1 parity
        np.testing.assert_array_equal(
            r.read_region((0, 0), 1, (64, 48)), _downsample(img)
        )
        assert r.level_compression(0) == 1
        r.close()

    def test_jpeg_strips_decode(self, tmp_path):
        img = _checker(64, 96, seed=3)
        p = tmp_path / "slide.ndpi"
        write_test_ndpi(str(p), img, n_levels=2, compression="jpeg")
        r = open_slide(str(p))
        assert r.level_count == 2
        assert r.level_compression(0) == 7  # JPEG
        got = r.read_region((0, 0), 0, (96, 64)).astype(np.int32)
        diff = np.abs(got - img.astype(np.int32))
        assert diff.mean() < 4 and diff.max() <= 40  # q95 4:4:4 JPEG
        got1 = r.read_region((0, 0), 1, (48, 32)).astype(np.int32)
        diff1 = np.abs(got1 - _downsample(img).astype(np.int32))
        assert diff1.mean() < 4
        r.close()

    def test_huge_wrapped_offsets(self, tmp_path):
        """>4 GiB NDPI layout: 32-bit offsets wrap; the reader must
        reconstruct the high bits (sparse fixture — level-0 pixel data
        lives above the 4 GiB boundary)."""
        try:
            probe = tmp_path / "probe.bin"
            with open(probe, "wb") as f:
                f.truncate(5 << 30)
            probe.unlink()
        except OSError:
            pytest.skip("filesystem cannot create sparse 5 GiB files")
        img = _checker(48, 64, seed=5)
        p = tmp_path / "huge.ndpi"
        write_test_ndpi(str(p), img, n_levels=2, compression="none",
                        huge_offsets=True)
        assert p.stat().st_size > (1 << 32)
        r = open_slide(str(p))
        assert r.level_count == 2
        np.testing.assert_array_equal(
            r.read_region((0, 0), 0, (64, 48)), img
        )
        np.testing.assert_array_equal(
            r.read_region((4, 2), 1, (16, 12)), _downsample(img)[2:14, 4:20]
        )
        r.close()
        p.unlink()

    def test_plain_tiff_renamed_ndpi_falls_back(self, tmp_path):
        """A non-NDPI file with an .ndpi suffix (no marker tag) must fall
        back to the generic libtiff pyramid path, not fail."""
        from cellvit_tpu.preprocessing.wsi_reader import write_test_pyramid

        img = _checker(64, 64, seed=7)
        p = tmp_path / "renamed.ndpi"
        write_test_pyramid(str(p), img, tile_size=32, n_levels=2)
        r = open_slide(str(p))
        assert r.level_count == 2
        np.testing.assert_array_equal(r.read_region((0, 0), 0, (64, 64)), img)
        r.close()


class TestScn:
    def test_main_image_selected_and_parity(self, tmp_path):
        img = _checker(80, 112, seed=11)
        p = tmp_path / "slide.scn"
        write_test_scn(str(p), img, tile_size=32, n_levels=2, mpp=0.5,
                       magnification=20.0)
        r = open_slide(str(p))
        assert isinstance(r, NativeWSIReader)
        # the macro camera image (dir 0) must not be the slide
        assert r.dimensions == (112, 80)
        assert r.level_count == 2
        assert r.level_dimensions[1] == (56, 40)
        assert r.magnification == pytest.approx(20.0)
        assert r.mpp == pytest.approx(0.5, rel=1e-3)
        np.testing.assert_array_equal(
            r.read_region((0, 0), 0, (112, 80)), img
        )
        np.testing.assert_array_equal(
            r.read_region((8, 4), 1, (32, 24)), _downsample(img)[4:28, 8:40]
        )
        r.close()

    def test_read_region_overhang(self, tmp_path):
        img = _checker(64, 64, seed=13)
        p = tmp_path / "s.scn"
        write_test_scn(str(p), img, tile_size=32, n_levels=1)
        r = open_slide(str(p))
        out = r.read_region((48, 48), 0, (32, 32))
        np.testing.assert_array_equal(out[:16, :16], img[48:64, 48:64])
        assert (out[16:] == 255).all()
        r.close()


class TestBif:
    """Ventana BIF: single-file BigTIFF, dir-0 XMP iScan metadata, AOI
    mosaic levels with uniform overlap joins subtracted on read
    (OpenSlide ventana-driver semantics; reference reads .bif via
    WSI_EXT at configs/python/config.py:10-19)."""

    # presented 112×88, 2×2 AOIs, overlaps (16, 8): raw mosaic 128×96,
    # AOI 64×48; level 1 halves everything exactly
    KW = dict(tile_size=32, n_levels=2, mpp=0.25, magnification=40.0,
              ncols=2, nrows=2, overlap_x=16, overlap_y=8)

    def test_aoi_stitch_roundtrip(self, tmp_path):
        img = _checker(88, 112, seed=17)
        p = tmp_path / "slide.bif"
        write_test_bif(str(p), img, **self.KW)
        r = open_slide(str(p))
        assert isinstance(r, NativeWSIReader)
        # presented (seamless) extents, not the raw AOI mosaic (128×96);
        # the stripped Thumbnail dir must not count as a level
        assert r.level_count == 2
        assert r.dimensions == (112, 88)
        assert r.level_dimensions[1] == (56, 44)
        assert r.magnification == pytest.approx(40.0)
        assert r.mpp == pytest.approx(0.25, rel=1e-3)
        # full-extent read: every AOI join must be seamless
        np.testing.assert_array_equal(
            r.read_region((0, 0), 0, (112, 88)), img
        )
        # crop crossing both joins (col boundary at x=64, row at y=44)
        np.testing.assert_array_equal(
            r.read_region((40, 30), 0, (60, 50)), img[30:80, 40:100]
        )
        # level 1 parity incl. halved overlaps
        np.testing.assert_array_equal(
            r.read_region((0, 0), 1, (56, 44)), _downsample(img)
        )
        np.testing.assert_array_equal(
            r.read_region((20, 10), 1, (24, 24)),
            _downsample(img)[10:34, 20:44],
        )
        r.close()

    def test_overhang_white_fill(self, tmp_path):
        img = _checker(88, 112, seed=19)
        p = tmp_path / "s.bif"
        write_test_bif(str(p), img, **self.KW)
        r = open_slide(str(p))
        out = r.read_region((96, 72), 0, (32, 32))
        np.testing.assert_array_equal(out[:16, :16], img[72:88, 96:112])
        assert (out[16:] == 255).all() and (out[:, 16:] == 255).all()
        r.close()

    def test_nonuniform_joins_refused(self, tmp_path):
        """Per-join overlaps disagreeing with the uniform stitch values
        need per-join offsets the reader does not model — refuse the file
        (as OpenSlide refuses non-uniform AOI spacing) instead of
        returning mis-stitched tiles."""
        img = _checker(88, 112, seed=23)
        p = tmp_path / "bad.bif"
        write_test_bif(str(p), img, nonuniform_join=True, **self.KW)
        with pytest.raises(IOError):
            open_slide(str(p))


def test_unsupported_vendor_formats_rejected(tmp_path):
    # vms/vmu are genuinely multi-file (index + side-car tiles) — the
    # native single-file reader rejects them with a clear message
    for suffix in (".vms", ".vmu"):
        p = tmp_path / f"slide{suffix}"
        p.write_bytes(b"\0" * 16)
        with pytest.raises(NotImplementedError):
            open_slide(str(p))
    # a corrupt .bif fails the open explicitly (no silent white tiles)
    p = tmp_path / "slide.bif"
    p.write_bytes(b"\0" * 16)
    with pytest.raises(IOError):
        open_slide(str(p))
