// Native lazy whole-slide TIFF reader (libtiff).
//
// Role: region reads on vendor-scale pyramidal TIFFs (Aperio .svs files ARE
// tiled-JPEG pyramidal TIFFs) without decoding whole levels into RAM — the
// OpenSlide capability the reference relies on (1_WSI2Patches.py:70,112)
// rebuilt on plain libtiff. The PIL-based PyramidTiffSlide eagerly decodes
// every level (fine for moderate pyramids, impossible for a 40x scan whose
// level 0 is tens of GB); this reader decodes ONLY the tiles/strips a
// read_region touches.
//
// Level model (matches OpenSlide's Aperio driver): when any directory is
// tiled, the pyramid levels are exactly the TILED directories (stripped
// directories of an .svs are the thumbnail/label/macro associated images);
// when none are tiled (e.g. PIL-written synthetic slides), every directory
// is a level. Levels are sorted by area, largest first.
//
// Decode goes through libtiff's RGBA interface (TIFFReadRGBATile /
// TIFFReadRGBAStrip), which internally handles photometric conversion —
// including the JPEG-compressed YCbCr tiles real scanners write. RGBA
// rasters are bottom-up per libtiff convention; rows are flipped here.
//
// A test-only pyramid WRITER (tiff_slide_write_test) lets the test suite
// fabricate tiled (optionally JPEG) pyramids without any external tool.
//
// Build: g++ -O3 -shared -fPIC tiff_slide.cc -o libtiffslide.so -ltiff
// (driven by multimodalbrainsurvival_tpu/utils/native_tiff.py)

#include <tiffio.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <vector>

namespace {

struct Level {
  int dir = 0;          // TIFF directory index
  uint32_t width = 0;
  uint32_t height = 0;
  bool tiled = false;
  std::string description;  // ImageDescription of this directory
};

struct Slide {
  TIFF* tif = nullptr;
  std::vector<Level> levels;
  std::vector<Level> associated;  // stripped dirs of a tiled slide
                                  // (thumbnail/label/macro of an .svs)
  std::string description;  // ImageDescription of directory 0
  std::mutex mu;            // libtiff handles are not thread-safe
};

void SilenceTiffErrors() {
  // vendor slides carry private tags libtiff warns about on every open
  TIFFSetWarningHandler(nullptr);
}

}  // namespace

extern "C" {

void* tiff_slide_open(const char* path) {
  SilenceTiffErrors();
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return nullptr;
  auto* s = new Slide;
  s->tif = tif;
  int dir = 0;
  bool any_tiled = false;
  do {
    Level lvl;
    lvl.dir = dir;
    TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &lvl.width);
    TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &lvl.height);
    lvl.tiled = TIFFIsTiled(tif);
    any_tiled |= lvl.tiled;
    char* desc = nullptr;
    if (TIFFGetField(tif, TIFFTAG_IMAGEDESCRIPTION, &desc) && desc)
      lvl.description = desc;
    if (dir == 0) s->description = lvl.description;
    if (lvl.width > 0 && lvl.height > 0) s->levels.push_back(lvl);
    ++dir;
  } while (TIFFReadDirectory(tif));
  if (any_tiled) {
    // Aperio layout: tiled dirs are the pyramid levels; stripped dirs are
    // the associated images (thumbnail / label / macro) — keep them
    // readable through the associated-image API instead of dropping them.
    std::vector<Level> keep;
    for (const Level& l : s->levels)
      (l.tiled ? keep : s->associated).push_back(l);
    s->levels = std::move(keep);
  }
  std::stable_sort(s->levels.begin(), s->levels.end(),
                   [](const Level& a, const Level& b) {
                     return uint64_t(a.width) * a.height >
                            uint64_t(b.width) * b.height;
                   });
  if (s->levels.empty()) {
    TIFFClose(tif);
    delete s;
    return nullptr;
  }
  return s;
}

void tiff_slide_close(void* h) {
  auto* s = static_cast<Slide*>(h);
  TIFFClose(s->tif);
  delete s;
}

int tiff_slide_n_levels(void* h) {
  return static_cast<int>(static_cast<Slide*>(h)->levels.size());
}

void tiff_slide_level_size(void* h, int level, int* w, int* hh) {
  const Level& l = static_cast<Slide*>(h)->levels[level];
  *w = static_cast<int>(l.width);
  *hh = static_cast<int>(l.height);
}

int tiff_slide_description(void* h, char* buf, int buflen) {
  const std::string& d = static_cast<Slide*>(h)->description;
  if (buf && buflen > 0) {
    int n = static_cast<int>(d.size());
    if (n > buflen - 1) n = buflen - 1;
    std::memcpy(buf, d.data(), n);
    buf[n] = '\0';
  }
  return static_cast<int>(d.size());
}

// Per-level codec info: compression tag + tile geometry (0x0 when stripped).
// Lets the Python wrapper route codecs libtiff lacks (Aperio's JPEG2000
// schemes 33003/33005) through raw-tile reads + an external decoder.
int tiff_slide_level_info(void* h, int level, int* compression, int* tile_w,
                          int* tile_h) {
  auto* s = static_cast<Slide*>(h);
  if (level < 0 || level >= static_cast<int>(s->levels.size())) return 1;
  std::lock_guard<std::mutex> lock(s->mu);
  if (!TIFFSetDirectory(s->tif, s->levels[level].dir)) return 2;
  uint16_t comp = COMPRESSION_NONE;
  TIFFGetFieldDefaulted(s->tif, TIFFTAG_COMPRESSION, &comp);
  *compression = comp;
  uint32_t tw = 0, th = 0;
  if (TIFFIsTiled(s->tif)) {
    TIFFGetField(s->tif, TIFFTAG_TILEWIDTH, &tw);
    TIFFGetField(s->tif, TIFFTAG_TILELENGTH, &th);
  }
  *tile_w = static_cast<int>(tw);
  *tile_h = static_cast<int>(th);
  return 0;
}

// Raw (still-compressed) bytes of the tile containing level-coordinate
// (x, y). Returns the byte count, or the required size when buf is NULL —
// call once with NULL to size the buffer, then again to fill it. Negative
// on error. This is the vendor-codec escape hatch: Aperio 33003/33005
// tiles are bare JPEG 2000 codestreams any J2K decoder can consume.
int64_t tiff_slide_read_raw_tile(void* h, int level, int64_t x, int64_t y,
                                 uint8_t* buf, int64_t buflen) {
  auto* s = static_cast<Slide*>(h);
  if (level < 0 || level >= static_cast<int>(s->levels.size())) return -1;
  std::lock_guard<std::mutex> lock(s->mu);
  if (!TIFFSetDirectory(s->tif, s->levels[level].dir)) return -2;
  if (!TIFFIsTiled(s->tif)) return -3;
  const uint32_t tile =
      TIFFComputeTile(s->tif, uint32_t(x), uint32_t(y), 0, 0);
  uint64_t* counts = nullptr;
  if (!TIFFGetField(s->tif, TIFFTAG_TILEBYTECOUNTS, &counts) || !counts)
    return -4;
  const int64_t need = int64_t(counts[tile]);
  if (!buf) return need;
  if (buflen < need) return -5;
  const tmsize_t got = TIFFReadRawTile(s->tif, tile, buf, tmsize_t(need));
  return got < 0 ? -6 : int64_t(got);
}

int tiff_slide_n_associated(void* h) {
  return static_cast<int>(static_cast<Slide*>(h)->associated.size());
}

// Geometry + ImageDescription of associated image i (description is how
// Aperio labels them: the label dir's description contains "label", the
// macro's "macro"; the first stripped dir is the thumbnail).
int tiff_slide_associated_info(void* h, int i, int* w, int* hh,
                               char* desc_buf, int desc_len) {
  auto* s = static_cast<Slide*>(h);
  if (i < 0 || i >= static_cast<int>(s->associated.size())) return 1;
  const Level& l = s->associated[i];
  *w = static_cast<int>(l.width);
  *hh = static_cast<int>(l.height);
  if (desc_buf && desc_len > 0) {
    int n = static_cast<int>(l.description.size());
    if (n > desc_len - 1) n = desc_len - 1;
    std::memcpy(desc_buf, l.description.data(), n);
    desc_buf[n] = '\0';
  }
  return 0;
}

// Decode associated image i into a (h x w x 3) RGB buffer.
int tiff_slide_read_associated(void* h, int i, uint8_t* out) {
  auto* s = static_cast<Slide*>(h);
  if (i < 0 || i >= static_cast<int>(s->associated.size())) return 1;
  std::lock_guard<std::mutex> lock(s->mu);
  const Level& l = s->associated[i];
  if (!TIFFSetDirectory(s->tif, l.dir)) return 2;
  std::vector<uint32_t> raster(size_t(l.width) * l.height);
  if (!TIFFReadRGBAImageOriented(s->tif, l.width, l.height, raster.data(),
                                 ORIENTATION_TOPLEFT, 0))
    return 3;
  const uint32_t* src = raster.data();
  uint8_t* dst = out;
  for (size_t k = 0; k < raster.size(); ++k, ++src, dst += 3) {
    dst[0] = TIFFGetR(*src);
    dst[1] = TIFFGetG(*src);
    dst[2] = TIFFGetB(*src);
  }
  return 0;
}

// Read an (out_w x out_h) RGB region whose top-left is (x, y) in LEVEL
// coordinates. Out-of-bounds area is left zero (OpenSlide edge semantics).
// Returns 0 on success.
int tiff_slide_read_region(void* h, int level, int64_t x, int64_t y,
                           int out_w, int out_h, uint8_t* out) {
  auto* s = static_cast<Slide*>(h);
  if (level < 0 || level >= static_cast<int>(s->levels.size())) return 1;
  std::lock_guard<std::mutex> lock(s->mu);
  const Level& lvl = s->levels[level];
  if (!TIFFSetDirectory(s->tif, lvl.dir)) return 2;
  std::memset(out, 0, size_t(out_w) * out_h * 3);

  const int64_t img_w = lvl.width, img_h = lvl.height;
  // clip the request to the image
  const int64_t x0 = x < 0 ? 0 : x, y0 = y < 0 ? 0 : y;
  const int64_t x1 = std::min<int64_t>(x + out_w, img_w);
  const int64_t y1 = std::min<int64_t>(y + out_h, img_h);
  if (x0 >= x1 || y0 >= y1) return 0;  // fully outside: zeros

  auto blit = [&](const uint32_t* raster, int64_t blk_x, int64_t blk_y,
                  uint32_t blk_w, uint32_t blk_h, uint32_t valid_h) {
    // raster: blk_w x blk_h RGBA, bottom-up, holding `valid_h` image rows
    // starting at image row blk_y (libtiff places row blk_y at raster row
    // valid_h-1 counting from the bottom of the buffer)
    const int64_t rx0 = std::max<int64_t>(x0, blk_x);
    const int64_t ry0 = std::max<int64_t>(y0, blk_y);
    const int64_t rx1 = std::min<int64_t>(x1, blk_x + blk_w);
    const int64_t ry1 = std::min<int64_t>(y1, blk_y + valid_h);
    for (int64_t yy = ry0; yy < ry1; ++yy) {
      // bottom-up: image row (blk_y + r) lives at raster row (blk_h - 1 - r)
      const uint32_t* src =
          raster + (blk_h - 1 - (yy - blk_y)) * blk_w + (rx0 - blk_x);
      uint8_t* dst = out + ((yy - y) * out_w + (rx0 - x)) * 3;
      for (int64_t xx = rx0; xx < rx1; ++xx, ++src, dst += 3) {
        const uint32_t px = *src;
        dst[0] = TIFFGetR(px);
        dst[1] = TIFFGetG(px);
        dst[2] = TIFFGetB(px);
      }
    }
  };

  if (lvl.tiled) {
    uint32_t tw = 0, th = 0;
    TIFFGetField(s->tif, TIFFTAG_TILEWIDTH, &tw);
    TIFFGetField(s->tif, TIFFTAG_TILELENGTH, &th);
    if (tw == 0 || th == 0) return 3;
    std::vector<uint32_t> raster(size_t(tw) * th);
    for (int64_t ty = (y0 / th) * th; ty < y1; ty += th) {
      for (int64_t tx = (x0 / tw) * tw; tx < x1; tx += tw) {
        if (!TIFFReadRGBATile(s->tif, uint32_t(tx), uint32_t(ty),
                              raster.data()))
          return 4;
        // edge tiles: libtiff decodes the valid region and positions it as
        // a full-height tile whose top rows beyond the image are junk; the
        // valid image rows are the bottom `valid_h` raster rows
        const uint32_t valid_h =
            uint32_t(std::min<int64_t>(th, img_h - ty));
        blit(raster.data(), tx, ty, tw, th, valid_h);
      }
    }
  } else {
    uint32_t rps = 0;
    TIFFGetFieldDefaulted(s->tif, TIFFTAG_ROWSPERSTRIP, &rps);
    if (rps == 0 || rps > lvl.height) rps = lvl.height;
    std::vector<uint32_t> raster(size_t(img_w) * rps);
    for (int64_t sy = (y0 / rps) * rps; sy < y1; sy += rps) {
      if (!TIFFReadRGBAStrip(s->tif, uint32_t(sy), raster.data())) return 5;
      const uint32_t valid_h = uint32_t(std::min<int64_t>(rps, img_h - sy));
      // TIFFReadRGBAStrip packs the strip's valid rows bottom-up in the
      // FIRST valid_h raster rows (treat as a blk_h == valid_h block)
      blit(raster.data(), 0, sy, uint32_t(img_w), valid_h, valid_h);
    }
  }
  return 0;
}

// --- test-only pyramid writer ----------------------------------------------
//
// Writes `n_levels` directories from caller-provided RGB buffers. tile == 0
// writes strips; compression: 1 = none, 7 = JPEG (quality 90). Lets tests
// fabricate scanner-style tiled-JPEG pyramids in an image with no tifffile.
int tiff_slide_write_test(const char* path, const uint8_t** levels,
                          const int* ws, const int* hs, int n_levels,
                          int tile, int compression, const char* description) {
  SilenceTiffErrors();
  TIFF* tif = TIFFOpen(path, "w");
  if (!tif) return 1;
  for (int li = 0; li < n_levels; ++li) {
    const int w = ws[li], h = hs[li];
    const uint8_t* img = levels[li];
    TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, uint32_t(w));
    TIFFSetField(tif, TIFFTAG_IMAGELENGTH, uint32_t(h));
    TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, 3);
    TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, 8);
    TIFFSetField(tif, TIFFTAG_ORIENTATION, ORIENTATION_TOPLEFT);
    TIFFSetField(tif, TIFFTAG_PLANARCONFIG, PLANARCONFIG_CONTIG);
    TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_RGB);
    TIFFSetField(tif, TIFFTAG_COMPRESSION, uint16_t(compression));
    if (compression == COMPRESSION_JPEG) {
      TIFFSetField(tif, TIFFTAG_JPEGQUALITY, 90);
      TIFFSetField(tif, TIFFTAG_JPEGCOLORMODE, JPEGCOLORMODE_RGB);
    }
    if (li == 0 && description)
      TIFFSetField(tif, TIFFTAG_IMAGEDESCRIPTION, description);
    if (tile > 0) {
      TIFFSetField(tif, TIFFTAG_TILEWIDTH, uint32_t(tile));
      TIFFSetField(tif, TIFFTAG_TILELENGTH, uint32_t(tile));
      std::vector<uint8_t> buf(size_t(tile) * tile * 3);
      for (int ty = 0; ty < h; ty += tile) {
        for (int tx = 0; tx < w; tx += tile) {
          std::memset(buf.data(), 0, buf.size());
          const int bh = std::min(tile, h - ty), bw = std::min(tile, w - tx);
          for (int r = 0; r < bh; ++r)
            std::memcpy(&buf[size_t(r) * tile * 3],
                        &img[(size_t(ty + r) * w + tx) * 3], size_t(bw) * 3);
          if (TIFFWriteTile(tif, buf.data(), uint32_t(tx), uint32_t(ty), 0,
                            0) < 0) {
            TIFFClose(tif);
            return 2;
          }
        }
      }
    } else {
      TIFFSetField(tif, TIFFTAG_ROWSPERSTRIP, 16);
      for (int r = 0; r < h; r += 16) {
        const int nrows = std::min(16, h - r);
        if (TIFFWriteEncodedStrip(
                tif, uint32_t(r / 16),
                const_cast<uint8_t*>(&img[size_t(r) * w * 3]),
                tmsize_t(nrows) * w * 3) < 0) {
          TIFFClose(tif);
          return 3;
        }
      }
    }
    if (!TIFFWriteDirectory(tif)) {
      TIFFClose(tif);
      return 4;
    }
  }
  TIFFClose(tif);
  return 0;
}

// --- test-only slide BUILDER -----------------------------------------------
//
// A directory-at-a-time writer the test suite drives to fabricate faithful
// .svs layouts — tiled pyramid levels (including raw pre-encoded tiles
// under vendor codecs like Aperio's 33003/33005 JPEG 2000, which libtiff
// cannot encode itself) interleaved with stripped associated images
// (thumbnail / label / macro) carrying their identifying descriptions.

void* tiff_builder_open(const char* path) {
  SilenceTiffErrors();
  return TIFFOpen(path, "w");
}

// Begin a directory. tile > 0 => tiled (tile x tile); compression is the
// raw TIFF tag value (1 none, 7 JPEG, 33003/33005 Aperio J2K, ...).
int tiff_builder_dir_begin(void* b, int w, int h, int tile, int compression,
                           const char* description) {
  TIFF* tif = static_cast<TIFF*>(b);
  TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, uint32_t(w));
  TIFFSetField(tif, TIFFTAG_IMAGELENGTH, uint32_t(h));
  TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, 3);
  TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, 8);
  TIFFSetField(tif, TIFFTAG_ORIENTATION, ORIENTATION_TOPLEFT);
  TIFFSetField(tif, TIFFTAG_PLANARCONFIG, PLANARCONFIG_CONTIG);
  // vendor J2K streams carry their own color model; YCbCr photometric on
  // 33003 matches what Aperio scanners write
  TIFFSetField(tif, TIFFTAG_PHOTOMETRIC,
               compression == 33003 ? PHOTOMETRIC_YCBCR : PHOTOMETRIC_RGB);
  if (!TIFFSetField(tif, TIFFTAG_COMPRESSION, uint16_t(compression)))
    return 1;
  if (compression == COMPRESSION_JPEG) {
    TIFFSetField(tif, TIFFTAG_JPEGQUALITY, 90);
    TIFFSetField(tif, TIFFTAG_JPEGCOLORMODE, JPEGCOLORMODE_RGB);
  }
  if (description && description[0])
    TIFFSetField(tif, TIFFTAG_IMAGEDESCRIPTION, description);
  if (tile > 0) {
    TIFFSetField(tif, TIFFTAG_TILEWIDTH, uint32_t(tile));
    TIFFSetField(tif, TIFFTAG_TILELENGTH, uint32_t(tile));
  } else {
    TIFFSetField(tif, TIFFTAG_ROWSPERSTRIP, 16);
  }
  return 0;
}

// Append pre-encoded bytes as tile `index` of the current tiled directory.
int tiff_builder_write_raw_tile(void* b, int index, const uint8_t* data,
                                int64_t n) {
  TIFF* tif = static_cast<TIFF*>(b);
  return TIFFWriteRawTile(tif, uint32_t(index), const_cast<uint8_t*>(data),
                          tmsize_t(n)) < 0
             ? 1
             : 0;
}

// Encode a full (h x w x 3) RGB image into the current directory through
// libtiff's own codec path (tiled or stripped per dir_begin).
int tiff_builder_write_rgb(void* b, const uint8_t* img, int w, int h,
                           int tile) {
  TIFF* tif = static_cast<TIFF*>(b);
  if (tile > 0) {
    std::vector<uint8_t> buf(size_t(tile) * tile * 3);
    for (int ty = 0; ty < h; ty += tile) {
      for (int tx = 0; tx < w; tx += tile) {
        std::memset(buf.data(), 0, buf.size());
        const int bh = std::min(tile, h - ty), bw = std::min(tile, w - tx);
        for (int r = 0; r < bh; ++r)
          std::memcpy(&buf[size_t(r) * tile * 3],
                      &img[(size_t(ty + r) * w + tx) * 3], size_t(bw) * 3);
        if (TIFFWriteTile(tif, buf.data(), uint32_t(tx), uint32_t(ty), 0, 0) <
            0)
          return 1;
      }
    }
  } else {
    for (int r = 0; r < h; r += 16) {
      const int nrows = std::min(16, h - r);
      if (TIFFWriteEncodedStrip(tif, uint32_t(r / 16),
                                const_cast<uint8_t*>(&img[size_t(r) * w * 3]),
                                tmsize_t(nrows) * w * 3) < 0)
        return 2;
    }
  }
  return 0;
}

int tiff_builder_dir_end(void* b) {
  return TIFFWriteDirectory(static_cast<TIFF*>(b)) ? 0 : 1;
}

void tiff_builder_close(void* b) { TIFFClose(static_cast<TIFF*>(b)); }

}  // extern "C"
