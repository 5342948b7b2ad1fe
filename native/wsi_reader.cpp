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
#include <stdio.h>  // jpeglib.h needs FILE declared first

#include <jpeglib.h>
#include <tiffio.h>

#include <algorithm>
#include <array>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
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
  uint32_t width;   // raw TIFF directory extent
  uint32_t height;
  bool tiled;
};

struct NdpiFile;  // Hamamatsu NDPI custom parser (below)

// Ventana BIF AOI-mosaic geometry (see bif_parse below). Levels are raw
// TIFF mosaics of uniform AOIs whose adjacent copies duplicate `ov` pixels;
// the presented (seamless) extent per level is raw − (n−1)·ov per axis.
struct BifInfo {
  int ncols = 1, nrows = 1;
  std::vector<std::array<int64_t, 2>> pres;  // presented (w, h) per level
  std::vector<std::array<int64_t, 2>> ov;    // overlap (ox, oy), level px
  std::vector<std::array<int64_t, 2>> aoi;   // AOI (w, h), raw level px
};

struct WsiHandle {
  TIFF* tif = nullptr;
  NdpiFile* ndpi = nullptr;
  BifInfo* bif = nullptr;
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

// ===== JPEG decode (libjpeg) ===============================================
// NDPI pyramid levels are whole-level JPEG strips; SCN tiles are JPEG too
// (those go through libtiff's JPEG codec). Output is always top-down RGB8.

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr c) {
  longjmp(reinterpret_cast<JpegErr*>(c->err)->jb, 1);
}

bool decode_jpeg_rgb(const uint8_t* buf, size_t len, std::vector<uint8_t>& rgb,
                     uint32_t* out_w, uint32_t* out_h) {
  jpeg_decompress_struct c;
  JpegErr e;
  c.err = jpeg_std_error(&e.mgr);
  e.mgr.error_exit = jpeg_err_exit;
  if (setjmp(e.jb)) {
    jpeg_destroy_decompress(&c);
    return false;
  }
  jpeg_create_decompress(&c);
  jpeg_mem_src(&c, const_cast<unsigned char*>(buf),
               static_cast<unsigned long>(len));
  jpeg_read_header(&c, TRUE);
  c.out_color_space = JCS_RGB;
  jpeg_start_decompress(&c);
  *out_w = c.output_width;
  *out_h = c.output_height;
  rgb.resize(size_t(*out_w) * *out_h * 3);
  while (c.output_scanline < c.output_height) {
    JSAMPROW row = rgb.data() + size_t(c.output_scanline) * *out_w * 3;
    jpeg_read_scanlines(&c, &row, 1);
  }
  jpeg_finish_decompress(&c);
  jpeg_destroy_decompress(&c);
  return true;
}

// ===== Hamamatsu NDPI ======================================================
// NDPI is TIFF-shaped but not valid TIFF (OpenSlide reads it through its
// own tifflike parser, not libtiff): files over 4 GiB keep 32-bit
// IFD/value/strip offsets whose high bits must be reconstructed, pyramid
// levels are full-height JPEG strips, and the pyramid is keyed by the
// SourceLens tag (65421): positive values are objective powers, -1 is the
// macro camera image, -2 the slide map. Reference scope: OpenSlide's
// hamamatsu driver behind patch_extraction.py:591 / configs WSI_EXT.

constexpr uint16_t kNdpiTagMarker = 65420;      // present on every NDPI IFD
constexpr uint16_t kNdpiTagSourceLens = 65421;  // objective power / -1 / -2

struct NdpiStrip {
  uint64_t offset = 0;
  uint64_t count = 0;
};

struct NdpiDir {
  uint32_t width = 0, height = 0, rows_per_strip = 0;
  uint16_t compression = 1, spp = 3, bits = 8;
  double source_lens = 0.0, xres = 0.0;
  uint16_t res_unit = RESUNIT_NONE;
  bool has_marker = false;
  std::vector<NdpiStrip> strips;
};

struct NdpiFile {
  FILE* f = nullptr;
  uint64_t size = 0;
  std::vector<NdpiDir> dirs;
  std::vector<int> level_dirs;  // indices into `dirs`, width-descending
  double mpp = 0.0, magnification = 0.0;
  int cached_level = -1;
  std::vector<uint8_t> cache;  // RGB8 raster of the cached level
};

uint16_t le16(const uint8_t* p) { return uint16_t(p[0] | (p[1] << 8)); }
uint32_t le32(const uint8_t* p) {
  return uint32_t(p[0]) | (uint32_t(p[1]) << 8) | (uint32_t(p[2]) << 16) |
         (uint32_t(p[3]) << 24);
}
uint64_t le64(const uint8_t* p) {
  return uint64_t(le32(p)) | (uint64_t(le32(p + 4)) << 32);
}

bool file_read(FILE* f, uint64_t off, void* buf, size_t n) {
  return fseeko(f, off_t(off), SEEK_SET) == 0 && fread(buf, 1, n, f) == n;
}

// Reconstruct a wrapped 32-bit NDPI offset in a >4 GiB file: take the high
// bits from the 64-bit offset of the directory the value belongs to; a
// result below the directory is assumed to lie in the next 4 GiB window
// (the same monotonic-offsets assumption OpenSlide's tifflike parser makes
// for NDPI).
uint64_t ndpi_fix_offset(uint64_t v, uint64_t diroff, bool huge) {
  if (!huge) return v;
  uint64_t x = (diroff & ~uint64_t(0xFFFFFFFFu)) | (v & 0xFFFFFFFFu);
  if (x < diroff) x += uint64_t(1) << 32;
  return x;
}

size_t tiff_type_size(uint16_t t) {
  switch (t) {
    case 1: case 2: case 6: case 7: return 1;   // BYTE ASCII SBYTE UNDEF
    case 3: case 8: return 2;                   // SHORT SSHORT
    case 4: case 9: case 11: return 4;          // LONG SLONG FLOAT
    case 5: case 10: case 12: return 8;         // RATIONAL SRATIONAL DOUBLE
    default: return 0;
  }
}

// Fetch an IFD entry's raw value bytes (inline or via a fixed offset).
bool ndpi_value_bytes(NdpiFile* nd, uint64_t diroff, bool huge, uint16_t type,
                      uint32_t count, const uint8_t inline_val[4],
                      std::vector<uint8_t>& out) {
  size_t esz = tiff_type_size(type);
  if (esz == 0 || count > (1u << 24)) return false;
  size_t total = esz * count;
  out.resize(total);
  if (total <= 4) {
    memcpy(out.data(), inline_val, total);
    return true;
  }
  uint64_t off = ndpi_fix_offset(le32(inline_val), diroff, huge);
  return file_read(nd->f, off, out.data(), total);
}

double ndpi_num_at(const std::vector<uint8_t>& raw, uint16_t type, size_t i) {
  const uint8_t* p = raw.data() + tiff_type_size(type) * i;
  switch (type) {
    case 1: case 2: case 7: return *p;
    case 6: return int8_t(*p);
    case 3: return le16(p);
    case 8: return int16_t(le16(p));
    case 4: return le32(p);
    case 9: return int32_t(le32(p));
    case 11: {
      uint32_t b = le32(p);
      float fv;
      memcpy(&fv, &b, 4);
      return fv;
    }
    case 5: {
      uint32_t den = le32(p + 4);
      return den ? double(le32(p)) / den : 0.0;
    }
    case 10: {
      int32_t den = int32_t(le32(p + 4));
      return den ? double(int32_t(le32(p))) / den : 0.0;
    }
    case 12: {
      uint64_t b = le64(p);
      double dv;
      memcpy(&dv, &b, 8);
      return dv;
    }
    default: return 0.0;
  }
}

void ndpi_close(NdpiFile* nd) {
  if (!nd) return;
  if (nd->f) fclose(nd->f);
  delete nd;
}

NdpiFile* ndpi_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* nd = new NdpiFile();
  nd->f = f;
  if (fseeko(f, 0, SEEK_END) != 0) {
    ndpi_close(nd);
    return nullptr;
  }
  nd->size = uint64_t(ftello(f));
  const bool huge = nd->size > 0xFFFFFFFFull;
  uint8_t hdr[8];
  if (!file_read(f, 0, hdr, 8) || hdr[0] != 'I' || hdr[1] != 'I' ||
      le16(hdr + 2) != 42) {  // NDPI is always classic little-endian TIFF
    ndpi_close(nd);
    return nullptr;
  }
  uint64_t diroff = le32(hdr + 4);
  std::vector<uint8_t> raw;
  for (int n_dirs = 0; diroff != 0 && n_dirs < 256; n_dirs++) {
    uint8_t cntb[2];
    if (!file_read(f, diroff, cntb, 2)) break;
    uint16_t n_entries = le16(cntb);
    std::vector<uint8_t> entries(size_t(n_entries) * 12 + 4);
    if (!file_read(f, diroff + 2, entries.data(), entries.size())) break;
    NdpiDir dir;
    std::vector<uint64_t> strip_offs, strip_cnts;
    for (uint16_t i = 0; i < n_entries; i++) {
      const uint8_t* e = entries.data() + size_t(i) * 12;
      uint16_t tag = le16(e), type = le16(e + 2);
      uint32_t count = le32(e + 4);
      const uint8_t* val = e + 8;
      auto get1 = [&]() -> double {
        if (!ndpi_value_bytes(nd, diroff, huge, type, count, val, raw) ||
            count < 1)
          return 0.0;
        return ndpi_num_at(raw, type, 0);
      };
      switch (tag) {
        case 256: dir.width = uint32_t(get1()); break;
        case 257: dir.height = uint32_t(get1()); break;
        case 258: dir.bits = uint16_t(get1()); break;
        case 259: dir.compression = uint16_t(get1()); break;
        case 277: dir.spp = uint16_t(get1()); break;
        case 278: dir.rows_per_strip = uint32_t(get1()); break;
        case 282: dir.xres = get1(); break;
        case 296: dir.res_unit = uint16_t(get1()); break;
        case kNdpiTagMarker: dir.has_marker = true; break;
        case kNdpiTagSourceLens: dir.source_lens = get1(); break;
        case 273:
        case 279: {
          if (!ndpi_value_bytes(nd, diroff, huge, type, count, val, raw))
            break;
          auto& dst = (tag == 273) ? strip_offs : strip_cnts;
          dst.resize(count);
          for (uint32_t j = 0; j < count; j++)
            dst[j] = uint64_t(ndpi_num_at(raw, type, j));
          break;
        }
        default: break;
      }
    }
    if (strip_offs.size() == strip_cnts.size()) {
      dir.strips.resize(strip_offs.size());
      for (size_t j = 0; j < strip_offs.size(); j++) {
        dir.strips[j].offset = ndpi_fix_offset(strip_offs[j], diroff, huge);
        dir.strips[j].count = strip_cnts[j];
      }
    }
    if (dir.width && dir.height) nd->dirs.push_back(std::move(dir));
    uint64_t next = le32(entries.data() + size_t(n_entries) * 12);
    diroff = next ? ndpi_fix_offset(next, diroff, huge) : 0;
  }
  bool any_marker = false;
  for (const auto& d : nd->dirs) any_marker |= d.has_marker;
  if (nd->dirs.empty() || !any_marker) {
    // not an NDPI (caller falls back to the libtiff path)
    ndpi_close(nd);
    return nullptr;
  }
  for (int i = 0; i < int(nd->dirs.size()); i++) {
    if (nd->dirs[i].source_lens > 0) nd->level_dirs.push_back(i);
  }
  std::sort(nd->level_dirs.begin(), nd->level_dirs.end(), [&](int a, int b) {
    return nd->dirs[a].width > nd->dirs[b].width;
  });
  if (nd->level_dirs.empty()) {
    ndpi_close(nd);
    return nullptr;
  }
  const NdpiDir& d0 = nd->dirs[nd->level_dirs[0]];
  nd->magnification = d0.source_lens;
  if (d0.xres > 0) {
    if (d0.res_unit == RESUNIT_CENTIMETER) nd->mpp = 10000.0 / d0.xres;
    else if (d0.res_unit == RESUNIT_INCH) nd->mpp = 25400.0 / d0.xres;
  }
  return nd;
}

// Decode a whole NDPI level into the handle cache (NDPI has no tile
// geometry — levels are one full-height JPEG strip — so random access
// decodes the level once; the 512 MPix bound keeps that sane. Full-res
// region reads on multi-gigapixel slides need the restart-marker index
// (tag 65426) fast path, which is not implemented — documented in
// PARITY.md).
int ndpi_load_level(NdpiFile* nd, int level) {
  if (nd->cached_level == level) return 0;
  const NdpiDir& d = nd->dirs[nd->level_dirs[level]];
  if (uint64_t(d.width) * d.height > uint64_t(512) * 1024 * 1024) return 4;
  // A StripOffsets/StripByteCounts count mismatch leaves dir.strips empty;
  // error out rather than returning an all-white level (repo convention:
  // explicit errors over white tiles).
  if (d.strips.empty()) return 5;
  nd->cache.assign(size_t(d.width) * d.height * 3, 255);
  nd->cached_level = -1;
  uint32_t rps = d.rows_per_strip ? d.rows_per_strip : d.height;
  std::vector<uint8_t> raw, jrgb;
  for (size_t s = 0; s < d.strips.size(); s++) {
    uint64_t y0 = uint64_t(s) * rps;
    if (y0 >= d.height) break;
    uint32_t rows = uint32_t(std::min<uint64_t>(rps, d.height - y0));
    const NdpiStrip& st = d.strips[s];
    if (st.count == 0 || st.offset + st.count > nd->size) return 5;
    raw.resize(size_t(st.count));
    if (!file_read(nd->f, st.offset, raw.data(), raw.size())) return 5;
    uint8_t* dst = nd->cache.data() + size_t(y0) * d.width * 3;
    if (d.compression == COMPRESSION_NONE) {
      if (d.bits != 8) return 7;
      if (d.spp == 3) {
        size_t need = size_t(rows) * d.width * 3;
        if (raw.size() < need) return 5;
        memcpy(dst, raw.data(), need);
      } else if (d.spp == 1) {
        size_t need = size_t(rows) * d.width;
        if (raw.size() < need) return 5;
        for (size_t i = 0; i < need; i++) {
          dst[i * 3] = dst[i * 3 + 1] = dst[i * 3 + 2] = raw[i];
        }
      } else {
        return 7;
      }
    } else if (d.compression == COMPRESSION_JPEG) {
      uint32_t jw = 0, jh = 0;
      if (!decode_jpeg_rgb(raw.data(), raw.size(), jrgb, &jw, &jh)) return 5;
      uint32_t cw = std::min(jw, d.width);
      uint32_t ch = std::min(jh, rows);
      for (uint32_t yy = 0; yy < ch; yy++) {
        memcpy(dst + size_t(yy) * d.width * 3,
               jrgb.data() + size_t(yy) * jw * 3, size_t(cw) * 3);
      }
    } else {
      return 7;
    }
  }
  nd->cached_level = level;
  return 0;
}

int ndpi_read_region(NdpiFile* nd, int level, int64_t x0, int64_t y0,
                     uint32_t out_w, uint32_t out_h, uint8_t* out) {
  if (level < 0 || level >= int(nd->level_dirs.size())) return 1;
  memset(out, 255, size_t(out_w) * out_h * 3);
  int rc = ndpi_load_level(nd, level);
  if (rc != 0) return rc;
  const NdpiDir& d = nd->dirs[nd->level_dirs[level]];
  for (int64_t yy = (y0 < 0 ? 0 : y0);
       yy < y0 + int64_t(out_h) && yy < int64_t(d.height); yy++) {
    int64_t cx0 = x0 < 0 ? 0 : x0;
    int64_t cx1 = std::min<int64_t>(x0 + int64_t(out_w), d.width);
    if (cx1 <= cx0) continue;
    memcpy(out + (size_t(yy - y0) * out_w + (cx0 - x0)) * 3,
           nd->cache.data() + (size_t(yy) * d.width + cx0) * 3,
           size_t(cx1 - cx0) * 3);
  }
  return 0;
}

// ===== Leica SCN ===========================================================
// SCN is a BigTIFF container (libtiff decodes the tiled-JPEG directories
// natively); the collection layout lives in a dir-0 ImageDescription XML:
// a macro camera image plus one or more scanned regions, each a <image>
// with <view> placement (nanometres), <pixels><dimension ... ifd="N"/>
// pyramid levels, and objective metadata. The aspect-ratio heuristic used
// for generic pyramids is wrong for these multi-image containers, so the
// level table comes from the XML (OpenSlide's leica driver semantics).

size_t xml_find_tag(const std::string& s, const char* elem, size_t from,
                    size_t to) {
  std::string pat = std::string("<") + elem;
  size_t p = s.find(pat, from);
  while (p != std::string::npos && p + pat.size() < to) {
    char c = s[p + pat.size()];
    if (c == ' ' || c == '>' || c == '/' || c == '\t' || c == '\n' ||
        c == '\r')
      return p;
    p = s.find(pat, p + 1);
  }
  return std::string::npos;
}

bool xml_attr_num(const std::string& s, size_t tagpos, const char* attr,
                  double* out) {
  size_t end = s.find('>', tagpos);
  if (end == std::string::npos) return false;
  std::string pat = std::string(attr) + "=\"";
  size_t p = s.find(pat, tagpos);
  if (p == std::string::npos || p > end) return false;
  *out = atof(s.c_str() + p + pat.size());
  return true;
}

double xml_elem_num(const std::string& s, const char* elem, size_t from,
                    size_t to) {
  size_t p = xml_find_tag(s, elem, from, to);
  if (p == std::string::npos) return 0.0;
  size_t gt = s.find('>', p);
  if (gt == std::string::npos || gt + 1 >= to) return 0.0;
  return atof(s.c_str() + gt + 1);
}

bool scn_parse(WsiHandle* h, const std::string& xml) {
  struct ScnImage {
    double view_w = 0, view_h = 0, view_x = 0, view_y = 0;
    double px_w = 0, px_h = 0, objective = 0;
    std::vector<std::array<uint64_t, 3>> dims;  // (sizeX, sizeY, ifd)
  };
  double coll_w = 0, coll_h = 0;
  size_t coll = xml_find_tag(xml, "collection", 0, xml.size());
  if (coll != std::string::npos) {
    xml_attr_num(xml, coll, "sizeX", &coll_w);
    xml_attr_num(xml, coll, "sizeY", &coll_h);
  }
  std::vector<ScnImage> images;
  size_t pos = 0;
  while (true) {
    size_t p = xml_find_tag(xml, "image", pos, xml.size());
    if (p == std::string::npos) break;
    size_t end = xml.find("</image>", p);
    if (end == std::string::npos) end = xml.size();
    pos = end + 1;
    ScnImage img;
    size_t view = xml_find_tag(xml, "view", p, end);
    if (view != std::string::npos) {
      xml_attr_num(xml, view, "sizeX", &img.view_w);
      xml_attr_num(xml, view, "sizeY", &img.view_h);
      xml_attr_num(xml, view, "offsetX", &img.view_x);
      xml_attr_num(xml, view, "offsetY", &img.view_y);
    }
    size_t px = xml_find_tag(xml, "pixels", p, end);
    if (px == std::string::npos) continue;
    xml_attr_num(xml, px, "sizeX", &img.px_w);
    xml_attr_num(xml, px, "sizeY", &img.px_h);
    img.objective = xml_elem_num(xml, "objective", p, end);
    size_t dpos = px;
    while (true) {
      size_t dp = xml_find_tag(xml, "dimension", dpos, end);
      if (dp == std::string::npos) break;
      dpos = dp + 1;
      double sx = 0, sy = 0, ifd = -1, zplane = 0;
      xml_attr_num(xml, dp, "sizeX", &sx);
      xml_attr_num(xml, dp, "sizeY", &sy);
      xml_attr_num(xml, dp, "ifd", &ifd);
      xml_attr_num(xml, dp, "z", &zplane);  // keep focal plane 0 only
      if (ifd < 0 || sx <= 0 || zplane != 0) continue;
      bool dup = false;
      for (auto& d : img.dims) dup |= (d[0] == uint64_t(sx));
      if (!dup)
        img.dims.push_back({uint64_t(sx), uint64_t(sy), uint64_t(ifd)});
    }
    if (!img.dims.empty()) images.push_back(std::move(img));
  }
  if (images.empty()) return false;
  // the macro camera image covers the whole collection from its origin;
  // scanned regions don't. Main image = largest non-macro by pixel width.
  const ScnImage* main_img = nullptr;
  for (const auto& img : images) {
    bool is_macro = coll_w > 0 && img.view_x == 0 && img.view_y == 0 &&
                    img.view_w == coll_w && img.view_h == coll_h;
    if (is_macro && images.size() > 1) continue;
    if (!main_img || img.px_w > main_img->px_w) main_img = &img;
  }
  if (!main_img) main_img = &images[0];
  std::vector<std::array<uint64_t, 3>> dims = main_img->dims;
  std::sort(dims.begin(), dims.end(),
            [](const auto& a, const auto& b) { return a[0] > b[0]; });
  std::vector<Level> levels;
  for (const auto& dd : dims) {
    if (!TIFFSetDirectory(h->tif, tdir_t(dd[2]))) return false;
    uint32_t w = 0, ht = 0;
    TIFFGetField(h->tif, TIFFTAG_IMAGEWIDTH, &w);
    TIFFGetField(h->tif, TIFFTAG_IMAGELENGTH, &ht);
    if (w == 0 || ht == 0) return false;
    levels.push_back(
        {uint16_t(dd[2]), w, ht, TIFFIsTiled(h->tif) != 0});
  }
  if (levels.empty()) return false;
  h->levels = std::move(levels);
  if (main_img->px_w > 0 && main_img->view_w > 0)
    h->mpp = main_img->view_w / main_img->px_w / 1000.0;  // nm → µm
  h->magnification = main_img->objective;
  return true;
}

// ===== Ventana BIF =========================================================
// BIF is a SINGLE-FILE BigTIFF (not a multi-file container): tiled-JPEG
// pyramid directories that libtiff decodes natively, plus vendor metadata
// in the dir-0 XMP packet (TIFF tag 700). The reference reads these through
// OpenSlide's ventana driver (patch_extraction.py:591; WSI_EXT lists .bif
// at configs/python/config.py:10-19). Semantics modeled on that driver:
//
//   * detection: dir-0 XMP contains an <iScan> element; its Magnification
//     and ScanRes attributes give objective power and µm/px;
//   * pyramid: directories whose ImageDescription carries "level=N"
//     (thumbnail / "Label Image" / probability dirs carry none and are
//     skipped);
//   * level 0 is a mosaic of uniform AOIs (areas of interest) scanned
//     separately: adjacent AOIs duplicate an overlap band that the reader
//     must subtract for a seamless image. The stitch geometry lives in the
//     XMP: <SlideStitchInfo><ImageInfo NumCols NumRows OverlapX OverlapY/>
//     with per-join <JoinInfo Direction="Left|Up" Overlap="…"/> elements
//     that must agree with the uniform values (OpenSlide likewise refuses
//     non-uniform AOI spacing). Presented level extent = raw −
//     (N−1)·overlap per axis; read_region assembles presented-coordinate
//     requests from per-AOI raw sub-rects.
//
// Files with iScan metadata but no stitch info (single-AOI exports) read
// as plain pyramids. Fixture round-trip: tests/test_wsi_formats.py.

bool xml_attr_str(const std::string& s, size_t tagpos, const char* attr,
                  std::string* out) {
  size_t end = s.find('>', tagpos);
  if (end == std::string::npos) return false;
  std::string pat = std::string(attr) + "=\"";
  size_t p = s.find(pat, tagpos);
  if (p == std::string::npos || p > end) return false;
  p += pat.size();
  size_t q = s.find('"', p);
  if (q == std::string::npos || q > end) return false;
  *out = s.substr(p, q - p);
  return true;
}

// 0 = ok, 1 = not a BIF (no iScan), 2 = unsupported stitch layout
int bif_parse(WsiHandle* h, const std::string& xml) {
  size_t iscan = xml_find_tag(xml, "iScan", 0, xml.size());
  if (iscan == std::string::npos) return 1;
  double mag = 0, res = 0;
  xml_attr_num(xml, iscan, "Magnification", &mag);
  xml_attr_num(xml, iscan, "ScanRes", &res);
  h->magnification = mag;
  h->mpp = res;  // ScanRes is µm/px at level 0

  int ncols = 1, nrows = 1;
  double ox0 = 0, oy0 = 0;
  size_t stitch = xml_find_tag(xml, "SlideStitchInfo", 0, xml.size());
  if (stitch != std::string::npos) {
    size_t info = xml_find_tag(xml, "ImageInfo", stitch, xml.size());
    if (info != std::string::npos) {
      double nc = 1, nr = 1;
      xml_attr_num(xml, info, "NumCols", &nc);
      xml_attr_num(xml, info, "NumRows", &nr);
      xml_attr_num(xml, info, "OverlapX", &ox0);
      xml_attr_num(xml, info, "OverlapY", &oy0);
      ncols = int(nc) > 0 ? int(nc) : 1;
      nrows = int(nr) > 0 ? int(nr) : 1;
    }
    // joins must agree with the uniform overlaps — refuse files that
    // need per-join offsets (matches OpenSlide's ventana driver, which
    // errors on non-uniform tile spacing)
    size_t pos = stitch;
    while (true) {
      size_t jp = xml_find_tag(xml, "JoinInfo", pos, xml.size());
      if (jp == std::string::npos) break;
      pos = jp + 1;
      std::string dir;
      double ov = -1;
      if (!xml_attr_str(xml, jp, "Direction", &dir)) continue;
      if (!xml_attr_num(xml, jp, "Overlap", &ov)) continue;
      if ((dir == "Left" && ov != ox0) || (dir == "Up" && ov != oy0))
        return 2;
    }
  }

  // pyramid levels: tiled dirs described "level=N"
  struct Raw { uint16_t dir; uint32_t w, h; };
  std::vector<Raw> raws;
  uint16_t dir = 0;
  TIFFSetDirectory(h->tif, 0);
  do {
    char* desc = nullptr;
    uint32_t w = 0, ht = 0;
    TIFFGetField(h->tif, TIFFTAG_IMAGEWIDTH, &w);
    TIFFGetField(h->tif, TIFFTAG_IMAGELENGTH, &ht);
    if (w && ht && TIFFIsTiled(h->tif) &&
        TIFFGetField(h->tif, TIFFTAG_IMAGEDESCRIPTION, &desc) && desc &&
        strstr(desc, "level=")) {
      raws.push_back({dir, w, ht});
    }
    dir++;
  } while (TIFFReadDirectory(h->tif));
  if (raws.empty()) return 2;
  std::sort(raws.begin(), raws.end(),
            [](const Raw& a, const Raw& b) { return a.w > b.w; });
  if (raws[0].w % uint32_t(ncols) != 0 || raws[0].h % uint32_t(nrows) != 0)
    return 2;  // AOIs must tile level 0 uniformly

  auto* bi = new BifInfo();
  bi->ncols = ncols;
  bi->nrows = nrows;
  for (const Raw& r : raws) {
    if (r.w % uint32_t(ncols) != 0 || r.h % uint32_t(nrows) != 0) {
      delete bi;
      return 2;
    }
    double dsx = double(raws[0].w) / r.w, dsy = double(raws[0].h) / r.h;
    int64_t ox = llround(ox0 / dsx), oy = llround(oy0 / dsy);
    int64_t aw = r.w / ncols, ah = r.h / nrows;
    if (ox >= aw || oy >= ah) {
      delete bi;
      return 2;
    }
    h->levels.push_back({r.dir, r.w, r.h, true});
    bi->aoi.push_back({aw, ah});
    bi->ov.push_back({ox, oy});
    bi->pres.push_back({int64_t(r.w) - (ncols - 1) * ox,
                        int64_t(r.h) - (nrows - 1) * oy});
  }
  h->bif = bi;
  return 0;
}

}  // namespace

extern "C" {

WsiHandle* wsi_open(const char* path) {
  TIFFSetWarningHandler(nullptr);

  // Hamamatsu NDPI: suffix-routed to the custom parser (libtiff cannot
  // parse the >4 GiB wrapped-offset layout and would mis-enumerate the
  // SourceLens pyramid). Falls through to libtiff when the marker tag is
  // absent (a plain TIFF renamed .ndpi).
  size_t plen = strlen(path);
  if (plen >= 5 && strcasecmp(path + plen - 5, ".ndpi") == 0) {
    if (NdpiFile* nd = ndpi_open(path)) {
      auto* h = new WsiHandle();
      h->ndpi = nd;
      for (size_t i = 0; i < nd->level_dirs.size(); i++) {
        const NdpiDir& d = nd->dirs[nd->level_dirs[i]];
        h->levels.push_back({uint16_t(i), d.width, d.height, false});
      }
      h->mpp = nd->mpp;
      h->magnification = nd->magnification;
      return h;
    }
  }

  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return nullptr;
  auto* h = new WsiHandle();
  h->tif = tif;

  // Ventana BIF: BigTIFF whose dir-0 XMP packet (tag 700) holds the iScan
  // metadata and the AOI stitch geometry. Unsupported stitch layouts
  // (non-uniform joins) fail the open — an explicit error beats silently
  // mis-stitched tiles.
  {
    uint32_t xmp_len = 0;
    void* xmp_data = nullptr;
    if (TIFFGetField(tif, TIFFTAG_XMLPACKET, &xmp_len, &xmp_data) &&
        xmp_data && xmp_len > 0) {
      std::string xml(static_cast<const char*>(xmp_data), xmp_len);
      if (xml.find("<iScan") != std::string::npos) {
        int rc = bif_parse(h, xml);
        if (rc == 0) return h;
        TIFFClose(tif);
        delete h;  // bif_parse owns (and freed) its BifInfo on failure
        return nullptr;
      }
      TIFFSetDirectory(tif, 0);
    }
  }

  // Leica SCN: BigTIFF whose dir-0 ImageDescription is the collection XML;
  // the level table comes from the XML, not the aspect heuristic.
  {
    char* desc0 = nullptr;
    if (TIFFGetField(tif, TIFFTAG_IMAGEDESCRIPTION, &desc0) && desc0 &&
        strstr(desc0, "<scn")) {
      std::string xml(desc0);
      if (scn_parse(h, xml)) return h;
      h->levels.clear();
      h->mpp = 0.0;
      h->magnification = 0.0;
      TIFFSetDirectory(tif, 0);
    }
  }

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
  if (h->ndpi) ndpi_close(h->ndpi);
  delete h->bif;
  delete h;
}

int wsi_level_count(WsiHandle* h) { return h ? int(h->levels.size()) : 0; }

void wsi_level_size(WsiHandle* h, int level, uint32_t* w, uint32_t* ht) {
  *w = 0;
  *ht = 0;
  if (!h || level < 0 || level >= int(h->levels.size())) return;
  if (h->bif) {  // presented (seamless) extent, not the raw AOI mosaic
    *w = uint32_t(h->bif->pres[level][0]);
    *ht = uint32_t(h->bif->pres[level][1]);
    return;
  }
  *w = h->levels[level].width;
  *ht = h->levels[level].height;
}

double wsi_mpp(WsiHandle* h) { return h ? h->mpp : 0.0; }
double wsi_magnification(WsiHandle* h) { return h ? h->magnification : 0.0; }

// TIFF compression tag of a pyramid level (0 on error). Lets callers
// surface "Aperio JPEG2000" / "unsupported codec" up front.
int wsi_level_compression(WsiHandle* h, int level) {
  if (!h || level < 0 || level >= int(h->levels.size())) return 0;
  if (h->ndpi)
    return int(h->ndpi->dirs[h->ndpi->level_dirs[level]].compression);
  if (!TIFFSetDirectory(h->tif, h->levels[level].directory)) return 0;
  uint16_t comp = COMPRESSION_NONE;
  TIFFGetFieldDefaulted(h->tif, TIFFTAG_COMPRESSION, &comp);
  return int(comp);
}

// 1 when libopenjp2 is loadable (Aperio 33003/33005 slides decodable).
int wsi_has_jpeg2000(void) { return opj_api() != nullptr ? 1 : 0; }

// Tiled-level region read core (raw TIFF coordinates of `lv`). Writes RGB
// rows into `out` with a row stride of `stride_px` pixels — wsi_read_region
// passes stride == out_w; the Ventana BIF path composes several AOI
// sub-rects into one output buffer. Caller has set the TIFF directory and
// background-filled `out`.
int read_tiled_region(WsiHandle* h, const Level& lv, int64_t x0, int64_t y0,
                      uint32_t out_w, uint32_t out_h, uint8_t* out,
                      size_t stride_px) {
  uint16_t comp = COMPRESSION_NONE;
  TIFFGetFieldDefaulted(h->tif, TIFFTAG_COMPRESSION, &comp);
  bool aperio_j2k = (comp == kAperioJ2kYCbCr || comp == kAperioJ2kRGB);
  if (!aperio_j2k && !TIFFIsCODECConfigured(comp)) return 7;
  {
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
            uint8_t* dst = out + (size_t(yy - y0) * stride_px + (cx0 - x0)) * 3;
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
          uint8_t* dst = out + (size_t(yy - y0) * stride_px + (cx0 - x0)) * 3;
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
}

// Read an RGB region (row-major, 3 bytes/px) from `level` at level
// coordinates (x, y). Out-of-bounds areas are filled white (255), matching
// pathology-background conventions. Returns 0 on success.
//
// Ventana BIF levels are AOI mosaics: the request is in PRESENTED
// (seamless) coordinates; each AOI column/row past the first starts
// `ov` pixels into its raw copy (those pixels duplicate the previous
// AOI's trailing band), so the region is assembled from ≤ ncols×nrows
// raw sub-rects with raw = presented + index·ov per axis.
int wsi_read_region(WsiHandle* h, int level, int64_t x0, int64_t y0,
                    uint32_t out_w, uint32_t out_h, uint8_t* out) {
  if (!h || level < 0 || level >= int(h->levels.size())) return 1;
  if (h->ndpi) return ndpi_read_region(h->ndpi, level, x0, y0, out_w, out_h, out);
  const Level& lv = h->levels[level];
  if (!TIFFSetDirectory(h->tif, lv.directory)) return 2;
  memset(out, 255, size_t(out_w) * out_h * 3);

  if (h->bif) {
    if (!lv.tiled) return 3;
    const BifInfo& bi = *h->bif;
    const int64_t aw = bi.aoi[level][0], ah = bi.aoi[level][1];
    const int64_t ox = bi.ov[level][0], oy = bi.ov[level][1];
    const int64_t pw = bi.pres[level][0], ph = bi.pres[level][1];
    // presented span of AOI col c: [0, aw) for c = 0,
    // [aw + (c−1)(aw−ox), …+(aw−ox)) after — col index of presented x is
    // clamp((x − ox) / (aw − ox), 0, ncols−1)
    auto col_of = [](int64_t x, int64_t a, int64_t o, int nmax) {
      if (x < a || a <= o) return int64_t(0);
      int64_t c = (x - o) / (a - o);
      return c >= nmax ? int64_t(nmax - 1) : c;
    };
    auto span = [](int64_t c, int64_t a, int64_t o, int64_t total,
                   int nmax) -> std::array<int64_t, 2> {
      int64_t lo = c == 0 ? 0 : a + (c - 1) * (a - o);
      int64_t hi = c + 1 >= nmax ? total : lo + (c == 0 ? a : a - o);
      return {lo, hi};
    };
    int64_t rx0 = std::max<int64_t>(x0, 0), ry0 = std::max<int64_t>(y0, 0);
    int64_t rx1 = std::min<int64_t>(x0 + out_w, pw);
    int64_t ry1 = std::min<int64_t>(y0 + out_h, ph);
    if (rx0 >= rx1 || ry0 >= ry1) return 0;  // fully out of bounds → white
    int64_t c0 = col_of(rx0, aw, ox, bi.ncols);
    int64_t c1 = col_of(rx1 - 1, aw, ox, bi.ncols);
    int64_t r0 = col_of(ry0, ah, oy, bi.nrows);
    int64_t r1 = col_of(ry1 - 1, ah, oy, bi.nrows);
    for (int64_t r = r0; r <= r1; r++) {
      auto ys = span(r, ah, oy, ph, bi.nrows);
      int64_t sy0 = std::max(ry0, ys[0]), sy1 = std::min(ry1, ys[1]);
      if (sy0 >= sy1) continue;
      for (int64_t c = c0; c <= c1; c++) {
        auto xs = span(c, aw, ox, pw, bi.ncols);
        int64_t sx0 = std::max(rx0, xs[0]), sx1 = std::min(rx1, xs[1]);
        if (sx0 >= sx1) continue;
        uint8_t* dst = out + (size_t(sy0 - y0) * out_w + (sx0 - x0)) * 3;
        int rc = read_tiled_region(h, lv, sx0 + c * ox, sy0 + r * oy,
                                   uint32_t(sx1 - sx0), uint32_t(sy1 - sy0),
                                   dst, out_w);
        if (rc != 0) return rc;
      }
    }
    return 0;
  }

  if (lv.tiled)
    return read_tiled_region(h, lv, x0, y0, out_w, out_h, out, out_w);

  uint16_t comp = COMPRESSION_NONE;
  TIFFGetFieldDefaulted(h->tif, TIFFTAG_COMPRESSION, &comp);
  bool aperio_j2k = (comp == kAperioJ2kYCbCr || comp == kAperioJ2kRGB);
  if (!aperio_j2k && !TIFFIsCODECConfigured(comp)) return 7;

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

// Test-fixture helper: write a Ventana-style BIF (single-file BigTIFF) —
// `rgb` is the PRESENTED (seamless) level-0 image; each level is written
// as an ncols×nrows AOI mosaic whose adjacent AOIs duplicate overlap_x/y
// pixels, with the stitch geometry in the dir-0 XMP packet (iScan +
// SlideStitchInfo + JoinInfo). A stripped "Thumbnail" directory without a
// "level=" description is interleaved — the reader must skip it. With
// nonuniform_join, one JoinInfo disagrees with the uniform overlap: the
// reader must refuse the file (OpenSlide ventana-driver semantics).
// Requires (w + (ncols−1)·overlap_x) % ncols == 0 (uniform AOIs), same
// for rows; presented extents and overlaps must stay divisible by 2 for
// every written level.
int wsi_write_bif(const char* path, const uint8_t* rgb, uint32_t w,
                  uint32_t h, uint32_t tile_size, int n_levels, double mpp,
                  double mag, int ncols, int nrows, int overlap_x,
                  int overlap_y, int nonuniform_join) {
  uint32_t raw_w0 = w + uint32_t(ncols - 1) * overlap_x;
  uint32_t raw_h0 = h + uint32_t(nrows - 1) * overlap_y;
  if (raw_w0 % uint32_t(ncols) != 0 || raw_h0 % uint32_t(nrows) != 0)
    return 4;
  TIFF* tif = TIFFOpen(path, "w8");  // w8 = BigTIFF
  if (!tif) return 1;
  char xmp[1024];
  snprintf(xmp, sizeof(xmp),
           "<?xpacket begin=\"\"?><x:xmpmeta><iScan Magnification=\"%g\" "
           "ScanRes=\"%g\" UnitNumber=\"FAKE-1\"/><EncodeInfo>"
           "<SlideStitchInfo><ImageInfo AoiCount=\"%d\" NumCols=\"%d\" "
           "NumRows=\"%d\" OverlapX=\"%d\" OverlapY=\"%d\"/>"
           "<JoinInfo Direction=\"Left\" Overlap=\"%d\" Confidence=\"98\"/>"
           "<JoinInfo Direction=\"Up\" Overlap=\"%d\" Confidence=\"97\"/>"
           "</SlideStitchInfo></EncodeInfo></x:xmpmeta><?xpacket end=\"w\"?>",
           mag, mpp, ncols * nrows, ncols, nrows, overlap_x, overlap_y,
           nonuniform_join ? overlap_x + 3 : overlap_x, overlap_y);
  std::vector<uint8_t> pres(rgb, rgb + size_t(w) * h * 3);
  uint32_t pw = w, ph = h;
  int ox = overlap_x, oy = overlap_y;
  for (int level = 0; level < n_levels; level++) {
    // raw mosaic: raw col c duplicates presented [c·aw − c·ox, …)
    uint32_t rw = pw + uint32_t(ncols - 1) * ox;
    uint32_t rh = ph + uint32_t(nrows - 1) * oy;
    uint32_t aw = rw / ncols, ah = rh / nrows;
    std::vector<uint8_t> raw(size_t(rw) * rh * 3);
    for (uint32_t yy = 0; yy < rh; yy++) {
      uint32_t py = yy - (yy / ah) * oy;
      for (uint32_t xx = 0; xx < rw; xx++) {
        uint32_t px = xx - (xx / aw) * ox;
        memcpy(raw.data() + (size_t(yy) * rw + xx) * 3,
               pres.data() + (size_t(py) * pw + px) * 3, 3);
      }
    }
    TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, rw);
    TIFFSetField(tif, TIFFTAG_IMAGELENGTH, rh);
    TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, 3);
    TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, 8);
    TIFFSetField(tif, TIFFTAG_ORIENTATION, ORIENTATION_TOPLEFT);
    TIFFSetField(tif, TIFFTAG_PLANARCONFIG, PLANARCONFIG_CONTIG);
    TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_RGB);
    TIFFSetField(tif, TIFFTAG_COMPRESSION, COMPRESSION_NONE);
    TIFFSetField(tif, TIFFTAG_TILEWIDTH, tile_size);
    TIFFSetField(tif, TIFFTAG_TILELENGTH, tile_size);
    char desc[64];
    snprintf(desc, sizeof(desc), "level=%d mag=%g quality=90", level,
             mag / double(1 << level));
    TIFFSetField(tif, TIFFTAG_IMAGEDESCRIPTION, desc);
    if (level == 0)
      TIFFSetField(tif, TIFFTAG_XMLPACKET, uint32_t(strlen(xmp)), xmp);
    std::vector<uint8_t> tile(size_t(tile_size) * tile_size * 3, 255);
    for (uint32_t ty = 0; ty < rh; ty += tile_size) {
      for (uint32_t tx = 0; tx < rw; tx += tile_size) {
        std::fill(tile.begin(), tile.end(), 255);
        for (uint32_t yy = ty; yy < ty + tile_size && yy < rh; yy++) {
          memcpy(tile.data() + size_t(yy - ty) * tile_size * 3,
                 raw.data() + (size_t(yy) * rw + tx) * 3,
                 size_t(std::min(tile_size, rw - tx)) * 3);
        }
        if (TIFFWriteTile(tif, tile.data(), tx, ty, 0, 0) < 0) {
          TIFFClose(tif);
          return 2;
        }
      }
    }
    TIFFWriteDirectory(tif);
    if (level == 0) {
      // stripped Thumbnail dir (no "level=") — must not join the pyramid
      uint32_t tw2 = pw / 4, th2 = ph / 4;
      TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, tw2);
      TIFFSetField(tif, TIFFTAG_IMAGELENGTH, th2);
      TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, 3);
      TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, 8);
      TIFFSetField(tif, TIFFTAG_ORIENTATION, ORIENTATION_TOPLEFT);
      TIFFSetField(tif, TIFFTAG_PLANARCONFIG, PLANARCONFIG_CONTIG);
      TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_RGB);
      TIFFSetField(tif, TIFFTAG_COMPRESSION, COMPRESSION_NONE);
      TIFFSetField(tif, TIFFTAG_ROWSPERSTRIP, 16);
      TIFFSetField(tif, TIFFTAG_IMAGEDESCRIPTION, "Thumbnail");
      std::vector<uint8_t> row(size_t(tw2) * 3);
      for (uint32_t yy = 0; yy < th2; yy++) {
        for (uint32_t xx = 0; xx < tw2; xx++)
          memcpy(row.data() + size_t(xx) * 3,
                 pres.data() + (size_t(4 * yy) * pw + 4 * xx) * 3, 3);
        if (TIFFWriteScanline(tif, row.data(), yy, 0) < 0) {
          TIFFClose(tif);
          return 3;
        }
      }
      TIFFWriteDirectory(tif);
    }
    if (level + 1 < n_levels) {
      uint32_t nw = pw / 2, nh2 = ph / 2;
      std::vector<uint8_t> next(size_t(nw) * nh2 * 3);
      for (uint32_t yy = 0; yy < nh2; yy++)
        for (uint32_t xx = 0; xx < nw; xx++)
          for (int c = 0; c < 3; c++) {
            int sum = pres[(size_t(2 * yy) * pw + 2 * xx) * 3 + c] +
                      pres[(size_t(2 * yy) * pw + 2 * xx + 1) * 3 + c] +
                      pres[(size_t(2 * yy + 1) * pw + 2 * xx) * 3 + c] +
                      pres[(size_t(2 * yy + 1) * pw + 2 * xx + 1) * 3 + c];
            next[(size_t(yy) * nw + xx) * 3 + c] = uint8_t(sum / 4);
          }
      pres.swap(next);
      pw = nw;
      ph = nh2;
      ox /= 2;
      oy /= 2;
    }
  }
  TIFFClose(tif);
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
