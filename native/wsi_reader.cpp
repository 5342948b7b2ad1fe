// wsi_reader: native whole-slide-image region reader on libtiff.
//
// TPU-native replacement for the reference's CuCIM/OpenSlide tile decoding
// path (reference: preprocessing/patch_extraction/src/cucim_deepzoom.py and
// the OpenSlide fallback). Aperio SVS and generic pyramidal TIFFs are tiled
// TIFF containers; this library exposes:
//   * pyramid-level enumeration (directories whose aspect ratio matches
//     level 0, the same heuristic OpenSlide applies),
//   * random-access region reads at any level (tiled path via
//     TIFFReadRGBATile; stripped fallback reads the level once and caches),
//   * slide metadata: microns-per-pixel and objective magnification from
//     Aperio ImageDescription ("MPP = ...", "AppMag = ...") or TIFF
//     resolution tags.
//
// Handles are NOT thread-safe (libtiff limitation); callers open one handle
// per worker thread. Build: `make -C native` → libwsireader.so, loaded from
// cellvit_tpu/preprocessing/wsi_reader.py via ctypes.

#include <tiffio.h>

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

namespace {

struct Level {
  uint16_t directory;
  uint32_t width;
  uint32_t height;
  bool tiled;
};

struct WsiHandle {
  TIFF* tif = nullptr;
  std::vector<Level> levels;
  double mpp = 0.0;
  double magnification = 0.0;
  // cache for stripped (non-tiled) levels: whole-level RGBA raster
  int cached_level = -1;
  std::vector<uint32_t> cache;
};

double parse_described_value(const std::string& desc, const std::string& key) {
  size_t pos = desc.find(key);
  if (pos == std::string::npos) return 0.0;
  pos += key.size();
  while (pos < desc.size() && (desc[pos] == ' ' || desc[pos] == '=')) pos++;
  return atof(desc.c_str() + pos);
}

}  // namespace

extern "C" {

WsiHandle* wsi_open(const char* path) {
  TIFFSetWarningHandler(nullptr);
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return nullptr;
  auto* h = new WsiHandle();
  h->tif = tif;

  // enumerate directories; keep those matching level-0 aspect as pyramid
  uint32_t w0 = 0, h0 = 0;
  uint16_t dir = 0;
  do {
    uint32_t w = 0, ht = 0;
    TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &w);
    TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &ht);
    if (w == 0 || ht == 0) {
      dir++;
      continue;
    }
    if (dir == 0) {
      w0 = w;
      h0 = ht;
      char* desc = nullptr;
      if (TIFFGetField(tif, TIFFTAG_IMAGEDESCRIPTION, &desc) && desc) {
        std::string d(desc);
        h->mpp = parse_described_value(d, "MPP");
        h->magnification = parse_described_value(d, "AppMag");
      }
      if (h->mpp == 0.0) {
        float xres = 0.f;
        uint16_t unit = RESUNIT_NONE;
        if (TIFFGetField(tif, TIFFTAG_XRESOLUTION, &xres) && xres > 0) {
          TIFFGetFieldDefaulted(tif, TIFFTAG_RESOLUTIONUNIT, &unit);
          if (unit == RESUNIT_CENTIMETER) h->mpp = 10000.0 / xres;
          else if (unit == RESUNIT_INCH) h->mpp = 25400.0 / xres;
        }
      }
      h->levels.push_back({dir, w, ht, TIFFIsTiled(tif) != 0});
    } else {
      double ar0 = double(w0) / double(h0);
      double ar = double(w) / double(ht);
      // aspect + width + TILED: Aperio SVS interleaves stripped
      // thumbnail/label/macro directories whose aspect can match the
      // slide — OpenSlide only admits tiled directories as pyramid
      // levels, and level indices must agree with it
      if (ar > ar0 * 0.95 && ar < ar0 * 1.05 && w < w0 &&
          TIFFIsTiled(tif) != 0) {
        h->levels.push_back({dir, w, ht, true});
      }
    }
    dir++;
  } while (TIFFReadDirectory(tif));

  // sort by width descending (level 0 first)
  for (size_t i = 1; i < h->levels.size(); i++) {
    for (size_t j = i; j > 0 && h->levels[j].width > h->levels[j - 1].width; j--) {
      std::swap(h->levels[j], h->levels[j - 1]);
    }
  }
  return h;
}

void wsi_close(WsiHandle* h) {
  if (!h) return;
  if (h->tif) TIFFClose(h->tif);
  delete h;
}

int wsi_level_count(WsiHandle* h) { return h ? int(h->levels.size()) : 0; }

void wsi_level_size(WsiHandle* h, int level, uint32_t* w, uint32_t* ht) {
  *w = 0;
  *ht = 0;
  if (!h || level < 0 || level >= int(h->levels.size())) return;
  *w = h->levels[level].width;
  *ht = h->levels[level].height;
}

double wsi_mpp(WsiHandle* h) { return h ? h->mpp : 0.0; }
double wsi_magnification(WsiHandle* h) { return h ? h->magnification : 0.0; }

// Read an RGB region (row-major, 3 bytes/px) from `level` at level
// coordinates (x, y). Out-of-bounds areas are filled white (255), matching
// pathology-background conventions. Returns 0 on success.
int wsi_read_region(WsiHandle* h, int level, int64_t x0, int64_t y0,
                    uint32_t out_w, uint32_t out_h, uint8_t* out) {
  if (!h || level < 0 || level >= int(h->levels.size())) return 1;
  const Level& lv = h->levels[level];
  if (!TIFFSetDirectory(h->tif, lv.directory)) return 2;
  memset(out, 255, size_t(out_w) * out_h * 3);

  if (lv.tiled) {
    uint32_t tw = 0, th = 0;
    TIFFGetField(h->tif, TIFFTAG_TILEWIDTH, &tw);
    TIFFGetField(h->tif, TIFFTAG_TILELENGTH, &th);
    if (tw == 0 || th == 0) return 3;
    std::vector<uint32_t> tile(size_t(tw) * th);

    int64_t tx_start = x0 < 0 ? 0 : (x0 / tw) * tw;
    int64_t ty_start = y0 < 0 ? 0 : (y0 / th) * th;
    for (int64_t ty = ty_start; ty < y0 + int64_t(out_h) && ty < int64_t(lv.height);
         ty += th) {
      if (ty + int64_t(th) <= y0) continue;
      for (int64_t tx = tx_start; tx < x0 + int64_t(out_w) && tx < int64_t(lv.width);
           tx += tw) {
        if (tx + int64_t(tw) <= x0) continue;
        if (!TIFFReadRGBATile(h->tif, uint32_t(tx), uint32_t(ty), tile.data()))
          continue;
        // TIFFReadRGBATile returns bottom-up rows; copy the intersection
        int64_t cx0 = tx > x0 ? tx : x0;
        int64_t cy0 = ty > y0 ? ty : y0;
        int64_t cx1 = tx + tw < x0 + int64_t(out_w) ? tx + tw : x0 + int64_t(out_w);
        int64_t cy1 = ty + th < y0 + int64_t(out_h) ? ty + th : y0 + int64_t(out_h);
        if (cx1 > int64_t(lv.width)) cx1 = lv.width;
        if (cy1 > int64_t(lv.height)) cy1 = lv.height;
        for (int64_t yy = cy0; yy < cy1; yy++) {
          // row yy within tile: tile row index (yy - ty); RGBA raster row
          // order is bottom-up: raster row = th - 1 - (yy - ty)
          const uint32_t* src =
              tile.data() + size_t(th - 1 - (yy - ty)) * tw + (cx0 - tx);
          uint8_t* dst = out + (size_t(yy - y0) * out_w + (cx0 - x0)) * 3;
          for (int64_t xx = cx0; xx < cx1; xx++, src++, dst += 3) {
            uint32_t px = *src;
            dst[0] = TIFFGetR(px);
            dst[1] = TIFFGetG(px);
            dst[2] = TIFFGetB(px);
          }
        }
      }
    }
    return 0;
  }

  // stripped level: read whole level once into the handle cache (bounded to
  // 512 MPix) and serve crops from it
  if (size_t(lv.width) * lv.height > size_t(512) * 1024 * 1024) return 4;
  if (h->cached_level != level) {
    h->cache.assign(size_t(lv.width) * lv.height, 0);
    if (!TIFFReadRGBAImageOriented(h->tif, lv.width, lv.height, h->cache.data(),
                                   ORIENTATION_TOPLEFT, 0)) {
      h->cached_level = -1;
      return 5;
    }
    h->cached_level = level;
  }
  for (int64_t yy = (y0 < 0 ? 0 : y0);
       yy < y0 + int64_t(out_h) && yy < int64_t(lv.height); yy++) {
    int64_t cx0 = x0 < 0 ? 0 : x0;
    int64_t cx1 = x0 + int64_t(out_w) < int64_t(lv.width) ? x0 + int64_t(out_w)
                                                          : int64_t(lv.width);
    const uint32_t* src = h->cache.data() + size_t(yy) * lv.width + cx0;
    uint8_t* dst = out + (size_t(yy - y0) * out_w + (cx0 - x0)) * 3;
    for (int64_t xx = cx0; xx < cx1; xx++, src++, dst += 3) {
      uint32_t px = *src;
      dst[0] = TIFFGetR(px);
      dst[1] = TIFFGetG(px);
      dst[2] = TIFFGetB(px);
    }
  }
  return 0;
}

// Test-fixture helper: write a tiled pyramidal TIFF (RGB, optionally with
// an Aperio-style description carrying MPP/AppMag). Levels are successive
// 2× downsamples of the given image. Used by the test suite to synthesize
// SVS-like slides without shipping data.
// insert_stripped_thumbnail: emit an Aperio-style STRIPPED (non-tiled)
// thumbnail directory after level 0 — real SVS files interleave these;
// the reader must not count them as pyramid levels.
int wsi_write_pyramid(const char* path, const uint8_t* rgb, uint32_t w,
                      uint32_t h, uint32_t tile_size, int n_levels,
                      double mpp, double mag,
                      int insert_stripped_thumbnail) {
  TIFF* tif = TIFFOpen(path, "w");
  if (!tif) return 1;
  std::vector<uint8_t> current(rgb, rgb + size_t(w) * h * 3);
  uint32_t cw = w, ch = h;
  char desc[256];
  snprintf(desc, sizeof(desc), "Aperio Fake |AppMag = %g|MPP = %g", mag, mpp);
  for (int level = 0; level < n_levels; level++) {
    TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, cw);
    TIFFSetField(tif, TIFFTAG_IMAGELENGTH, ch);
    TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, 3);
    TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, 8);
    TIFFSetField(tif, TIFFTAG_ORIENTATION, ORIENTATION_TOPLEFT);
    TIFFSetField(tif, TIFFTAG_PLANARCONFIG, PLANARCONFIG_CONTIG);
    TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_RGB);
    TIFFSetField(tif, TIFFTAG_COMPRESSION, COMPRESSION_NONE);
    TIFFSetField(tif, TIFFTAG_TILEWIDTH, tile_size);
    TIFFSetField(tif, TIFFTAG_TILELENGTH, tile_size);
    if (level == 0) TIFFSetField(tif, TIFFTAG_IMAGEDESCRIPTION, desc);
    std::vector<uint8_t> tile(size_t(tile_size) * tile_size * 3, 255);
    for (uint32_t ty = 0; ty < ch; ty += tile_size) {
      for (uint32_t tx = 0; tx < cw; tx += tile_size) {
        std::fill(tile.begin(), tile.end(), 255);
        for (uint32_t yy = ty; yy < ty + tile_size && yy < ch; yy++) {
          memcpy(tile.data() + size_t(yy - ty) * tile_size * 3,
                 current.data() + (size_t(yy) * cw + tx) * 3,
                 size_t(std::min(tile_size, cw - tx)) * 3);
        }
        if (TIFFWriteTile(tif, tile.data(), tx, ty, 0, 0) < 0) {
          TIFFClose(tif);
          return 2;
        }
      }
    }
    if (level + 1 < n_levels) {
      TIFFWriteDirectory(tif);
      if (level == 0 && insert_stripped_thumbnail) {
        uint32_t tw = cw / 4, th = ch / 4;
        TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, tw);
        TIFFSetField(tif, TIFFTAG_IMAGELENGTH, th);
        TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, 3);
        TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, 8);
        TIFFSetField(tif, TIFFTAG_ORIENTATION, ORIENTATION_TOPLEFT);
        TIFFSetField(tif, TIFFTAG_PLANARCONFIG, PLANARCONFIG_CONTIG);
        TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_RGB);
        TIFFSetField(tif, TIFFTAG_COMPRESSION, COMPRESSION_NONE);
        TIFFSetField(tif, TIFFTAG_ROWSPERSTRIP, 16);
        std::vector<uint8_t> row(size_t(tw) * 3);
        for (uint32_t yy = 0; yy < th; yy++) {
          for (uint32_t xx = 0; xx < tw; xx++) {
            for (int c = 0; c < 3; c++) {
              row[size_t(xx) * 3 + c] =
                  current[(size_t(4 * yy) * cw + 4 * xx) * 3 + c];
            }
          }
          if (TIFFWriteScanline(tif, row.data(), yy, 0) < 0) {
            TIFFClose(tif);
            return 3;
          }
        }
        TIFFWriteDirectory(tif);
      }
      uint32_t nw = cw / 2, nh = ch / 2;
      std::vector<uint8_t> next(size_t(nw) * nh * 3);
      for (uint32_t yy = 0; yy < nh; yy++) {
        for (uint32_t xx = 0; xx < nw; xx++) {
          for (int c = 0; c < 3; c++) {
            int sum = current[(size_t(2 * yy) * cw + 2 * xx) * 3 + c] +
                      current[(size_t(2 * yy) * cw + 2 * xx + 1) * 3 + c] +
                      current[(size_t(2 * yy + 1) * cw + 2 * xx) * 3 + c] +
                      current[(size_t(2 * yy + 1) * cw + 2 * xx + 1) * 3 + c];
            next[(size_t(yy) * nw + xx) * 3 + c] = uint8_t(sum / 4);
          }
        }
      }
      current.swap(next);
      cw = nw;
      ch = nh;
    }
  }
  TIFFWriteDirectory(tif);
  TIFFClose(tif);
  return 0;
}

}  // extern "C"
