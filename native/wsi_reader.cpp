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

#include <dlfcn.h>
#include <tiffio.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

namespace {

// Aperio private TIFF compression tags: raw JPEG-2000 codestreams per tile
// (reference reads these through OpenSlide — patch_extraction.py:591;
// stock libtiff has no codec for them).
constexpr uint16_t kAperioJ2kYCbCr = 33003;
constexpr uint16_t kAperioJ2kRGB = 33005;

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

// ---- JPEG-2000 decode via libopenjp2, loaded at runtime -------------------
// No build-time dependency: the OpenJPEG 2.x C API (stable since 2.1) is
// declared here and resolved with dlopen/dlsym. When the library is absent,
// J2K slides fail with a distinct error code that the Python layer maps to
// a clear "install libopenjp2" message instead of silently white tiles.

typedef int OPJ_BOOL;
typedef int64_t OPJ_OFF_T;

struct OpjImageComp {  // opj_image_comp_t, openjpeg.h (ABI-stable in 2.x)
  uint32_t dx, dy, w, h, x0, y0, prec, bpp, sgnd, resno_decoded, factor;
  int32_t* data;
  uint16_t alpha;
};

struct OpjImage {  // opj_image_t
  uint32_t x0, y0, x1, y1, numcomps;
  int color_space;
  OpjImageComp* comps;
  uint8_t* icc_profile_buf;
  uint32_t icc_profile_len;
};

struct OpjApi {
  void* dl = nullptr;
  void* (*create_decompress)(int) = nullptr;
  void (*destroy_codec)(void*) = nullptr;
  void (*set_default_decoder_parameters)(void*) = nullptr;
  OPJ_BOOL (*setup_decoder)(void*, void*) = nullptr;
  OPJ_BOOL (*read_header)(void*, void*, OpjImage**) = nullptr;
  OPJ_BOOL (*decode)(void*, void*, OpjImage*) = nullptr;
  OPJ_BOOL (*end_decompress)(void*, void*) = nullptr;
  void (*image_destroy)(OpjImage*) = nullptr;
  void* (*stream_default_create)(OPJ_BOOL) = nullptr;
  void (*stream_destroy)(void*) = nullptr;
  void (*stream_set_read_function)(void*, void*) = nullptr;
  void (*stream_set_skip_function)(void*, void*) = nullptr;
  void (*stream_set_seek_function)(void*, void*) = nullptr;
  void (*stream_set_user_data)(void*, void*, void*) = nullptr;
  void (*stream_set_user_data_length)(void*, uint64_t) = nullptr;
  bool ok = false;
};

const OpjApi* opj_api() {
  static OpjApi api;
  static bool tried = false;
  if (tried) return api.ok ? &api : nullptr;
  tried = true;
  api.dl = dlopen("libopenjp2.so.7", RTLD_NOW | RTLD_LOCAL);
  if (!api.dl) api.dl = dlopen("libopenjp2.so", RTLD_NOW | RTLD_LOCAL);
  if (!api.dl) return nullptr;
  auto sym = [&](const char* name) { return dlsym(api.dl, name); };
  *(void**)&api.create_decompress = sym("opj_create_decompress");
  *(void**)&api.destroy_codec = sym("opj_destroy_codec");
  *(void**)&api.set_default_decoder_parameters =
      sym("opj_set_default_decoder_parameters");
  *(void**)&api.setup_decoder = sym("opj_setup_decoder");
  *(void**)&api.read_header = sym("opj_read_header");
  *(void**)&api.decode = sym("opj_decode");
  *(void**)&api.end_decompress = sym("opj_end_decompress");
  *(void**)&api.image_destroy = sym("opj_image_destroy");
  *(void**)&api.stream_default_create = sym("opj_stream_default_create");
  *(void**)&api.stream_destroy = sym("opj_stream_destroy");
  *(void**)&api.stream_set_read_function = sym("opj_stream_set_read_function");
  *(void**)&api.stream_set_skip_function = sym("opj_stream_set_skip_function");
  *(void**)&api.stream_set_seek_function = sym("opj_stream_set_seek_function");
  *(void**)&api.stream_set_user_data = sym("opj_stream_set_user_data");
  *(void**)&api.stream_set_user_data_length =
      sym("opj_stream_set_user_data_length");
  api.ok = api.create_decompress && api.destroy_codec &&
           api.set_default_decoder_parameters && api.setup_decoder &&
           api.read_header && api.decode && api.end_decompress &&
           api.image_destroy && api.stream_default_create &&
           api.stream_destroy && api.stream_set_read_function &&
           api.stream_set_skip_function && api.stream_set_seek_function &&
           api.stream_set_user_data && api.stream_set_user_data_length;
  return api.ok ? &api : nullptr;
}

struct MemStream {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

size_t mem_read(void* buf, size_t n, void* ud) {
  auto* ms = static_cast<MemStream*>(ud);
  if (ms->pos >= ms->size) return size_t(-1);
  size_t take = std::min(n, ms->size - ms->pos);
  memcpy(buf, ms->data + ms->pos, take);
  ms->pos += take;
  return take;
}

OPJ_OFF_T mem_skip(OPJ_OFF_T n, void* ud) {
  auto* ms = static_cast<MemStream*>(ud);
  int64_t target = int64_t(ms->pos) + n;
  if (target < 0 || target > int64_t(ms->size)) return -1;
  ms->pos = size_t(target);
  return n;
}

OPJ_BOOL mem_seek(OPJ_OFF_T n, void* ud) {
  auto* ms = static_cast<MemStream*>(ud);
  if (n < 0 || n > OPJ_OFF_T(ms->size)) return 0;
  ms->pos = size_t(n);
  return 1;
}

// Decode one raw J2K/JP2 codestream into top-down RGB8. `ycbcr` applies the
// BT.601 full-range conversion Aperio's 33003 tag implies (the codestream
// carries YCbCr planes without an MCT flag — OpenSlide does the same).
bool decode_j2k(const uint8_t* buf, size_t len, bool ycbcr,
                std::vector<uint8_t>& rgb, uint32_t* out_w, uint32_t* out_h) {
  const OpjApi* A = opj_api();
  if (!A) return false;
  static const uint8_t jp2_magic[8] = {0, 0, 0, 0x0c, 'j', 'P', ' ', ' '};
  // OPJ_CODEC_J2K = 0, OPJ_CODEC_JP2 = 2
  int fmt = (len >= 8 && memcmp(buf, jp2_magic, 8) == 0) ? 2 : 0;
  void* codec = A->create_decompress(fmt);
  if (!codec) return false;
  // opj_dparameters_t is written by reference; an oversized zeroed buffer
  // avoids declaring the full struct (only defaults are used)
  std::vector<uint8_t> params(16384, 0);
  A->set_default_decoder_parameters(params.data());
  if (!A->setup_decoder(codec, params.data())) {
    A->destroy_codec(codec);
    return false;
  }
  void* stream = A->stream_default_create(1 /* input */);
  if (!stream) {
    A->destroy_codec(codec);
    return false;
  }
  MemStream ms{buf, len, 0};
  A->stream_set_user_data(stream, &ms, nullptr);
  A->stream_set_user_data_length(stream, len);
  A->stream_set_read_function(stream, (void*)mem_read);
  A->stream_set_skip_function(stream, (void*)mem_skip);
  A->stream_set_seek_function(stream, (void*)mem_seek);

  OpjImage* img = nullptr;
  bool ok = A->read_header(stream, codec, &img) && img &&
            A->decode(codec, stream, img) && A->end_decompress(codec, stream);
  if (ok && img->numcomps >= 1 && img->comps[0].data) {
    uint32_t w = img->comps[0].w, h = img->comps[0].h;
    *out_w = w;
    *out_h = h;
    rgb.resize(size_t(w) * h * 3);
    uint32_t nc = img->numcomps;
    auto sample = [&](uint32_t c, uint32_t x, uint32_t y) -> int32_t {
      const OpjImageComp& cp = img->comps[c];
      uint32_t xi = cp.w == w ? x : x * cp.w / w;
      uint32_t yi = cp.h == h ? y : y * cp.h / h;
      if (xi >= cp.w) xi = cp.w - 1;
      if (yi >= cp.h) yi = cp.h - 1;
      int32_t v = cp.data[size_t(yi) * cp.w + xi];
      if (cp.sgnd) v += 1 << (cp.prec - 1);
      if (cp.prec > 8) v >>= (cp.prec - 8);
      return v < 0 ? 0 : (v > 255 ? 255 : v);
    };
    for (uint32_t y = 0; y < h; y++) {
      uint8_t* dst = rgb.data() + size_t(y) * w * 3;
      for (uint32_t x = 0; x < w; x++, dst += 3) {
        if (nc >= 3 && ycbcr) {
          double Y = sample(0, x, y);
          double Cb = sample(1, x, y) - 128.0;
          double Cr = sample(2, x, y) - 128.0;
          double r = Y + 1.402 * Cr;
          double g = Y - 0.344136 * Cb - 0.714136 * Cr;
          double b = Y + 1.772 * Cb;
          dst[0] = uint8_t(r < 0 ? 0 : (r > 255 ? 255 : r + 0.5));
          dst[1] = uint8_t(g < 0 ? 0 : (g > 255 ? 255 : g + 0.5));
          dst[2] = uint8_t(b < 0 ? 0 : (b > 255 ? 255 : b + 0.5));
        } else if (nc >= 3) {
          dst[0] = uint8_t(sample(0, x, y));
          dst[1] = uint8_t(sample(1, x, y));
          dst[2] = uint8_t(sample(2, x, y));
        } else {
          uint8_t v = uint8_t(sample(0, x, y));
          dst[0] = dst[1] = dst[2] = v;
        }
      }
    }
  } else {
    ok = false;
  }
  if (img) A->image_destroy(img);
  A->stream_destroy(stream);
  A->destroy_codec(codec);
  return ok;
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

// TIFF compression tag of a pyramid level (0 on error). Lets callers
// surface "Aperio JPEG2000" / "unsupported codec" up front.
int wsi_level_compression(WsiHandle* h, int level) {
  if (!h || level < 0 || level >= int(h->levels.size())) return 0;
  if (!TIFFSetDirectory(h->tif, h->levels[level].directory)) return 0;
  uint16_t comp = COMPRESSION_NONE;
  TIFFGetFieldDefaulted(h->tif, TIFFTAG_COMPRESSION, &comp);
  return int(comp);
}

// 1 when libopenjp2 is loadable (Aperio 33003/33005 slides decodable).
int wsi_has_jpeg2000(void) { return opj_api() != nullptr ? 1 : 0; }

// Read an RGB region (row-major, 3 bytes/px) from `level` at level
// coordinates (x, y). Out-of-bounds areas are filled white (255), matching
// pathology-background conventions. Returns 0 on success.
int wsi_read_region(WsiHandle* h, int level, int64_t x0, int64_t y0,
                    uint32_t out_w, uint32_t out_h, uint8_t* out) {
  if (!h || level < 0 || level >= int(h->levels.size())) return 1;
  const Level& lv = h->levels[level];
  if (!TIFFSetDirectory(h->tif, lv.directory)) return 2;
  memset(out, 255, size_t(out_w) * out_h * 3);

  uint16_t comp = COMPRESSION_NONE;
  TIFFGetFieldDefaulted(h->tif, TIFFTAG_COMPRESSION, &comp);
  bool aperio_j2k = (comp == kAperioJ2kYCbCr || comp == kAperioJ2kRGB);
  if (!aperio_j2k && !TIFFIsCODECConfigured(comp)) return 7;

  if (lv.tiled) {
    uint32_t tw = 0, th = 0;
    TIFFGetField(h->tif, TIFFTAG_TILEWIDTH, &tw);
    TIFFGetField(h->tif, TIFFTAG_TILELENGTH, &th);
    if (tw == 0 || th == 0) return 3;
    if (aperio_j2k && !opj_api()) return 6;
    std::vector<uint32_t> tile(aperio_j2k ? 0 : size_t(tw) * th);
    std::vector<uint8_t> raw, jrgb;
    uint64_t* bytecounts = nullptr;
    if (aperio_j2k &&
        !TIFFGetField(h->tif, TIFFTAG_TILEBYTECOUNTS, &bytecounts))
      return 8;

    int64_t tx_start = x0 < 0 ? 0 : (x0 / tw) * tw;
    int64_t ty_start = y0 < 0 ? 0 : (y0 / th) * th;
    for (int64_t ty = ty_start; ty < y0 + int64_t(out_h) && ty < int64_t(lv.height);
         ty += th) {
      if (ty + int64_t(th) <= y0) continue;
      for (int64_t tx = tx_start; tx < x0 + int64_t(out_w) && tx < int64_t(lv.width);
           tx += tw) {
        if (tx + int64_t(tw) <= x0) continue;
        uint32_t jw = tw, jh = th;  // decoded tile extent
        if (aperio_j2k) {
          ttile_t t = TIFFComputeTile(h->tif, uint32_t(tx), uint32_t(ty), 0, 0);
          uint64_t nbytes = bytecounts[t];
          if (nbytes == 0) continue;  // sparse tile → background fill
          raw.resize(size_t(nbytes));
          if (TIFFReadRawTile(h->tif, t, raw.data(), tmsize_t(nbytes)) !=
              tmsize_t(nbytes))
            return 8;
          if (!decode_j2k(raw.data(), raw.size(), comp == kAperioJ2kYCbCr,
                          jrgb, &jw, &jh))
            return 8;
        } else if (!TIFFReadRGBATile(h->tif, uint32_t(tx), uint32_t(ty),
                                     tile.data())) {
          continue;
        }
        int64_t cx0 = tx > x0 ? tx : x0;
        int64_t cy0 = ty > y0 ? ty : y0;
        int64_t cx1 = tx + tw < x0 + int64_t(out_w) ? tx + tw : x0 + int64_t(out_w);
        int64_t cy1 = ty + th < y0 + int64_t(out_h) ? ty + th : y0 + int64_t(out_h);
        if (cx1 > int64_t(lv.width)) cx1 = lv.width;
        if (cy1 > int64_t(lv.height)) cy1 = lv.height;
        if (aperio_j2k) {
          // decode_j2k rows are top-down (extent jw×jh may be the clipped
          // edge-tile size)
          for (int64_t yy = cy0; yy < cy1 && yy - ty < int64_t(jh); yy++) {
            const uint8_t* src =
                jrgb.data() + (size_t(yy - ty) * jw + (cx0 - tx)) * 3;
            uint8_t* dst = out + (size_t(yy - y0) * out_w + (cx0 - x0)) * 3;
            int64_t n = std::min(cx1, tx + int64_t(jw)) - cx0;
            if (n > 0) memcpy(dst, src, size_t(n) * 3);
          }
          continue;
        }
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
  if (aperio_j2k) return opj_api() ? 8 : 6;  // stripped J2K: not a real layout
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
