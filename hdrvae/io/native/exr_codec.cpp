// Native OpenEXR scanline codec for hdrvae.
//
// Replaces the reference's dependence on the OpenEXR C++ library via
// pyexr/cv2 (`/root/reference/linear_exr_export.py:145-227`, SURVEY.md
// section 2.7) with a self-contained implementation of the scanline format:
// RGB images, HALF/FLOAT pixels, NONE/RLE/ZIPS/ZIP/PXR24 compression.
// Mirrors hdrvae/io/exr_py.py byte-for-byte (tests assert file equality).
//
// Build: g++ -O3 -shared -fPIC exr_codec.cpp -o libexr_codec.so -lz
// Bound from Python via ctypes (hdrvae/io/exr.py); no pybind11 needed.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

constexpr uint32_t kMagic = 0x01312F76;
constexpr int kVersion = 2;

enum Compression { NONE = 0, RLE = 1, ZIPS = 2, ZIP = 3, PIZ = 4, PXR24 = 5 };
enum PixelType { UINT = 0, HALF = 1, FLOAT = 2 };

int lines_per_chunk(int comp) {
  switch (comp) {
    case ZIP: case PXR24: return 16;
    case PIZ: return 32;
    default: return 1;
  }
}

int pixel_size(int ptype) { return ptype == HALF ? 2 : 4; }

// ---------------------------------------------------------------------------
// half <-> float (round-to-nearest-even, matching numpy astype(float16))
// ---------------------------------------------------------------------------

uint16_t float_to_half(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  uint32_t sign = (x >> 16) & 0x8000u;
  int32_t exp = static_cast<int32_t>((x >> 23) & 0xFF) - 127 + 15;
  uint32_t mant = x & 0x7FFFFFu;
  if (((x >> 23) & 0xFF) == 0xFF)  // inf / nan
    return static_cast<uint16_t>(sign | 0x7C00u |
                                 (mant ? (0x200u | (mant >> 13)) : 0));
  if (exp >= 31) return static_cast<uint16_t>(sign | 0x7C00u);  // overflow
  if (exp <= 0) {  // subnormal or zero
    if (exp < -10) return static_cast<uint16_t>(sign);
    mant |= 0x800000u;
    uint32_t shift = static_cast<uint32_t>(14 - exp);
    uint32_t val = mant >> shift;
    uint32_t rem = mant & ((1u << shift) - 1);
    uint32_t halfway = 1u << (shift - 1);
    if (rem > halfway || (rem == halfway && (val & 1))) val++;
    return static_cast<uint16_t>(sign | val);
  }
  uint32_t val = (static_cast<uint32_t>(exp) << 10) | (mant >> 13);
  uint32_t rem = mant & 0x1FFFu;
  if (rem > 0x1000u || (rem == 0x1000u && (val & 1))) val++;  // may carry
  return static_cast<uint16_t>(sign | val);
}

float half_to_float(uint16_t h) {
  uint32_t sign = (static_cast<uint32_t>(h) & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t mant = h & 0x3FFu;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;
    } else {  // subnormal: normalize
      int e = -1;
      uint32_t m = mant;
      do { m <<= 1; e++; } while (!(m & 0x400u));
      bits = sign | ((127 - 15 - e) << 23) | ((m & 0x3FFu) << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (mant << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}

// ---------------------------------------------------------------------------
// ZIP/RLE pre-filter: reorder into two halves, then delta predictor
// ---------------------------------------------------------------------------

void filter_encode(const uint8_t* src, size_t n, uint8_t* dst) {
  size_t half = (n + 1) / 2;
  for (size_t i = 0, j = 0; i < n; i += 2, ++j) dst[j] = src[i];
  for (size_t i = 1, j = half; i < n; i += 2, ++j) dst[j] = src[i];
  int prev = dst[0];
  for (size_t i = 1; i < n; ++i) {
    int cur = dst[i];
    dst[i] = static_cast<uint8_t>(cur - prev + (128 + 256));
    prev = cur;
  }
}

void filter_decode(uint8_t* buf, size_t n, uint8_t* out) {
  // undo predictor in place
  for (size_t i = 1; i < n; ++i)
    buf[i] = static_cast<uint8_t>(buf[i] + buf[i - 1] - 128 - 256);
  size_t half = (n + 1) / 2;
  for (size_t i = 0, j = 0; i < n; i += 2, ++j) out[i] = buf[j];
  for (size_t i = 1, j = half; i < n; i += 2, ++j) out[i] = buf[j];
}

// ---------------------------------------------------------------------------
// RLE (OpenEXR flavor)
// ---------------------------------------------------------------------------

constexpr int kMinRun = 3, kMaxRun = 127;

size_t rle_encode(const uint8_t* d, size_t n, uint8_t* out) {
  size_t o = 0, i = 0;
  while (i < n) {
    size_t run = 1;
    while (i + run < n && d[i + run] == d[i] &&
           run < static_cast<size_t>(kMaxRun))
      run++;
    if (run >= kMinRun) {
      out[o++] = static_cast<uint8_t>(run - 1);
      out[o++] = d[i];
      i += run;
    } else {
      size_t start = i;
      i++;
      while (i < n && (i - start) < static_cast<size_t>(kMaxRun) &&
             !(i + 2 < n && d[i] == d[i + 1] && d[i + 1] == d[i + 2]))
        i++;
      size_t count = i - start;
      out[o++] = static_cast<uint8_t>(256 - count);
      std::memcpy(out + o, d + start, count);
      o += count;
    }
  }
  return o;
}

size_t rle_decode(const uint8_t* d, size_t n, uint8_t* out, size_t cap) {
  size_t o = 0, i = 0;
  while (i < n && o < cap) {
    int8_t count = static_cast<int8_t>(d[i++]);
    if (count < 0) {
      size_t len = static_cast<size_t>(-count);
      if (len > cap - o) len = cap - o;
      std::memcpy(out + o, d + i, len);
      i += static_cast<size_t>(-count);
      o += len;
    } else {
      size_t len = static_cast<size_t>(count) + 1;
      if (len > cap - o) len = cap - o;
      std::memset(out + o, d[i], len);
      i += 1;
      o += len;
    }
  }
  return o;
}

// ---------------------------------------------------------------------------
// PXR24
// ---------------------------------------------------------------------------

uint32_t float_to_float24(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  uint32_t s = x & 0x80000000u;
  uint32_t e = x & 0x7F800000u;
  uint32_t m = x & 0x007FFFFFu;
  uint32_t out24;
  if (e == 0x7F800000u) {  // inf / nan
    uint32_t m15 = m >> 8;
    out24 = (e >> 8) | m15 | ((m != 0 && m15 == 0) ? 1u : 0u);
  } else {
    uint32_t rounded = ((e | m) + 0x80u) >> 8;
    if (((rounded << 8) & 0x7F800000u) == 0x7F800000u)
      rounded = (e | m) >> 8;  // avoid overflow to inf: truncate
    out24 = rounded;
  }
  return (s >> 8) | out24;
}

float float24_to_float(uint32_t i24) {
  uint32_t bits = i24 << 8;
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}

// ---------------------------------------------------------------------------
// zlib helpers
// ---------------------------------------------------------------------------

bool zlib_deflate(const uint8_t* src, size_t n, std::vector<uint8_t>* out) {
  uLongf cap = compressBound(static_cast<uLong>(n));
  out->resize(cap);
  if (compress2(out->data(), &cap, src, static_cast<uLong>(n),
                Z_DEFAULT_COMPRESSION) != Z_OK)
    return false;
  out->resize(cap);
  return true;
}

bool zlib_inflate(const uint8_t* src, size_t n, uint8_t* dst, size_t cap) {
  uLongf len = static_cast<uLongf>(cap);
  return uncompress(dst, &len, src, static_cast<uLong>(n)) == Z_OK;
}

// ---------------------------------------------------------------------------
// Header
// ---------------------------------------------------------------------------

void put_i32(std::vector<uint8_t>* b, int32_t v) {
  for (int i = 0; i < 4; ++i) b->push_back((v >> (8 * i)) & 0xFF);
}
void put_u64(std::vector<uint8_t>* b, uint64_t v) {
  for (int i = 0; i < 8; ++i) b->push_back((v >> (8 * i)) & 0xFF);
}
void put_f32(std::vector<uint8_t>* b, float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  put_i32(b, static_cast<int32_t>(x));
}
void put_str(std::vector<uint8_t>* b, const char* s) {
  while (*s) b->push_back(static_cast<uint8_t>(*s++));
  b->push_back(0);
}

void put_attr(std::vector<uint8_t>* b, const char* name, const char* type,
              const std::vector<uint8_t>& payload) {
  put_str(b, name);
  put_str(b, type);
  put_i32(b, static_cast<int32_t>(payload.size()));
  b->insert(b->end(), payload.begin(), payload.end());
}

std::vector<std::string> channel_names(int channels) {
  if (channels == 3) return {"B", "G", "R"};  // alphabetical storage order
  if (channels == 1) return {"Y"};
  std::vector<std::string> names;
  for (int i = 0; i < channels; ++i)
    names.push_back("channel" + std::to_string(i));
  return names;
}

// map storage (alphabetical) channel index -> interleaved RGB index
std::vector<int> channel_source_index(int channels) {
  if (channels == 3) return {2, 1, 0};  // B,G,R <- rgb[2],rgb[1],rgb[0]
  std::vector<int> idx(channels);
  for (int i = 0; i < channels; ++i) idx[i] = i;
  return idx;
}

}  // namespace

extern "C" {

// Write an interleaved float32 image (height x width x channels, RGB order
// for 3-channel). pixel_type: 1=half 2=float; compression_id: OpenEXR id
// (0 none, 1 rle, 2 zips, 3 zip, 5 pxr24).  Returns 0 on success.
int exr_write(const char* path, const float* data, int height, int width,
              int channels, int pixel_type, int compression_id) {
  if (pixel_type != HALF && pixel_type != FLOAT) return -2;
  if (compression_id == PIZ || compression_id < 0 || compression_id > 5)
    return -3;

  const int lines = lines_per_chunk(compression_id);
  const int psz = pixel_size(pixel_type);
  const auto names = channel_names(channels);
  const auto src_idx = channel_source_index(channels);
  const size_t row_bytes = static_cast<size_t>(width) * psz * channels;

  // ----- header -----
  std::vector<uint8_t> head;
  head.reserve(512);
  put_i32(&head, static_cast<int32_t>(kMagic));
  put_i32(&head, kVersion);
  {
    std::vector<uint8_t> chl;
    for (const auto& nm : names) {
      put_str(&chl, nm.c_str());
      put_i32(&chl, pixel_type);
      put_i32(&chl, 0);  // pLinear + reserved
      put_i32(&chl, 1);
      put_i32(&chl, 1);
    }
    chl.push_back(0);
    put_attr(&head, "channels", "chlist", chl);
  }
  put_attr(&head, "compression", "compression",
           {static_cast<uint8_t>(compression_id)});
  {
    std::vector<uint8_t> box;
    put_i32(&box, 0); put_i32(&box, 0);
    put_i32(&box, width - 1); put_i32(&box, height - 1);
    put_attr(&head, "dataWindow", "box2i", box);
    put_attr(&head, "displayWindow", "box2i", box);
  }
  put_attr(&head, "lineOrder", "lineOrder", {0});
  {
    std::vector<uint8_t> f; put_f32(&f, 1.0f);
    put_attr(&head, "pixelAspectRatio", "float", f);
  }
  {
    std::vector<uint8_t> v; put_f32(&v, 0.0f); put_f32(&v, 0.0f);
    put_attr(&head, "screenWindowCenter", "v2f", v);
  }
  {
    std::vector<uint8_t> f; put_f32(&f, 1.0f);
    put_attr(&head, "screenWindowWidth", "float", f);
  }
  head.push_back(0);  // end of header

  // ----- chunks -----
  const int n_chunks = (height + lines - 1) / lines;
  std::vector<std::vector<uint8_t>> chunks;
  chunks.reserve(n_chunks);
  std::vector<uint8_t> raw, tmp, enc;

  for (int y0 = 0; y0 < height; y0 += lines) {
    const int y1 = y0 < height - lines ? y0 + lines : height;
    const int nrows = y1 - y0;
    const size_t raw_size = static_cast<size_t>(nrows) * row_bytes;
    raw.resize(raw_size);

    // pack scanlines: per row, per channel (alphabetical), w pixels
    size_t off = 0;
    for (int y = y0; y < y1; ++y) {
      for (int ci = 0; ci < channels; ++ci) {
        const float* row = data +
            (static_cast<size_t>(y) * width * channels) + src_idx[ci];
        if (pixel_type == HALF) {
          uint16_t* dst = reinterpret_cast<uint16_t*>(raw.data() + off);
          for (int x = 0; x < width; ++x)
            dst[x] = float_to_half(row[static_cast<size_t>(x) * channels]);
          off += static_cast<size_t>(width) * 2;
        } else {
          float* dst = reinterpret_cast<float*>(raw.data() + off);
          for (int x = 0; x < width; ++x)
            dst[x] = row[static_cast<size_t>(x) * channels];
          off += static_cast<size_t>(width) * 4;
        }
      }
    }

    std::vector<uint8_t> payload;
    if (compression_id == NONE) {
      payload = raw;
    } else if (compression_id == ZIPS || compression_id == ZIP) {
      tmp.resize(raw_size);
      filter_encode(raw.data(), raw_size, tmp.data());
      if (!zlib_deflate(tmp.data(), raw_size, &payload)) return -4;
    } else if (compression_id == RLE) {
      tmp.resize(raw_size);
      filter_encode(raw.data(), raw_size, tmp.data());
      enc.resize(raw_size * 2 + 16);
      size_t n = rle_encode(tmp.data(), raw_size, enc.data());
      payload.assign(enc.begin(), enc.begin() + n);
    } else {  // PXR24
      // plane-pack deltas per channel-row from the float source
      tmp.clear();
      tmp.reserve(raw_size);
      for (int y = y0; y < y1; ++y) {
        for (int ci = 0; ci < channels; ++ci) {
          const float* row = data +
              (static_cast<size_t>(y) * width * channels) + src_idx[ci];
          if (pixel_type == FLOAT) {
            std::vector<uint8_t> hi(width), mid(width), lo(width);
            uint32_t prev = 0;
            for (int x = 0; x < width; ++x) {
              uint32_t p = float_to_float24(
                  row[static_cast<size_t>(x) * channels]);
              uint32_t diff = (p - prev) & 0xFFFFFFu;
              prev = p;
              hi[x] = (diff >> 16) & 0xFF;
              mid[x] = (diff >> 8) & 0xFF;
              lo[x] = diff & 0xFF;
            }
            tmp.insert(tmp.end(), hi.begin(), hi.end());
            tmp.insert(tmp.end(), mid.begin(), mid.end());
            tmp.insert(tmp.end(), lo.begin(), lo.end());
          } else {  // HALF
            std::vector<uint8_t> hi(width), lo(width);
            uint32_t prev = 0;
            for (int x = 0; x < width; ++x) {
              uint32_t p = float_to_half(
                  row[static_cast<size_t>(x) * channels]);
              uint32_t diff = (p - prev) & 0xFFFFu;
              prev = p;
              hi[x] = (diff >> 8) & 0xFF;
              lo[x] = diff & 0xFF;
            }
            tmp.insert(tmp.end(), hi.begin(), hi.end());
            tmp.insert(tmp.end(), lo.begin(), lo.end());
          }
        }
      }
      if (!zlib_deflate(tmp.data(), tmp.size(), &payload)) return -4;
    }
    if (payload.size() >= raw_size) payload = raw;  // store raw

    std::vector<uint8_t> chunk;
    put_i32(&chunk, y0);
    put_i32(&chunk, static_cast<int32_t>(payload.size()));
    chunk.insert(chunk.end(), payload.begin(), payload.end());
    chunks.push_back(std::move(chunk));
  }

  // ----- offsets + file assembly -----
  std::vector<uint8_t> table;
  uint64_t pos = head.size() + 8ull * chunks.size();
  for (const auto& c : chunks) {
    put_u64(&table, pos);
    pos += c.size();
  }

  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  bool ok = std::fwrite(head.data(), 1, head.size(), f) == head.size() &&
            std::fwrite(table.data(), 1, table.size(), f) == table.size();
  for (const auto& c : chunks)
    ok = ok && std::fwrite(c.data(), 1, c.size(), f) == c.size();
  std::fclose(f);
  return ok ? 0 : -5;
}

// ---------------------------------------------------------------------------
// Reader
// ---------------------------------------------------------------------------

namespace {

struct ChannelInfo {
  std::string name;
  int ptype;
};

struct Parsed {
  int width = 0, height = 0, comp = 0, y_min = 0;
  std::vector<ChannelInfo> channels;
  size_t offsets_pos = 0;  // file position of the offset table
};

bool read_cstr(const std::vector<uint8_t>& b, size_t* pos, std::string* out) {
  out->clear();
  while (*pos < b.size() && b[*pos] != 0) out->push_back(b[(*pos)++]);
  if (*pos >= b.size()) return false;
  (*pos)++;
  return true;
}

int32_t get_i32(const uint8_t* p) {
  int32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

bool parse_header(const std::vector<uint8_t>& buf, Parsed* out) {
  if (buf.size() < 8 ||
      static_cast<uint32_t>(get_i32(buf.data())) != kMagic)
    return false;
  size_t pos = 8;
  while (pos < buf.size()) {
    if (buf[pos] == 0) { pos++; break; }
    std::string name, type;
    if (!read_cstr(buf, &pos, &name) || !read_cstr(buf, &pos, &type))
      return false;
    int32_t size = get_i32(buf.data() + pos);
    pos += 4;
    const uint8_t* payload = buf.data() + pos;
    if (name == "channels") {
      size_t cpos = 0;
      std::vector<uint8_t> pay(payload, payload + size);
      while (cpos < pay.size() && pay[cpos] != 0) {
        std::string cname;
        if (!read_cstr(pay, &cpos, &cname)) return false;
        int32_t pt = get_i32(pay.data() + cpos);
        cpos += 16;  // type + pLinear/reserved + sampling
        out->channels.push_back({cname, pt});
      }
    } else if (name == "compression") {
      out->comp = payload[0];
    } else if (name == "dataWindow") {
      int32_t x0 = get_i32(payload), y0 = get_i32(payload + 4);
      int32_t x1 = get_i32(payload + 8), y1 = get_i32(payload + 12);
      out->width = x1 - x0 + 1;
      out->height = y1 - y0 + 1;
      out->y_min = y0;
    }
    pos += size;
  }
  out->offsets_pos = pos;
  return out->width > 0 && out->height > 0 && !out->channels.empty();
}

bool load_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  buf->resize(size);
  bool ok = std::fread(buf->data(), 1, size, f) == static_cast<size_t>(size);
  std::fclose(f);
  return ok;
}

}  // namespace

// Returns 0 on success and fills width/height/channels.
int exr_read_header(const char* path, int* width, int* height,
                    int* channels) {
  std::vector<uint8_t> buf;
  if (!load_file(path, &buf)) return -1;
  Parsed p;
  if (!parse_header(buf, &p)) return -2;
  *width = p.width;
  *height = p.height;
  *channels = static_cast<int>(p.channels.size());
  return 0;
}

// Reads pixel data as float32 into out (height*width*channels), channels in
// RGB(A) order when R/G/B are present, else storage order.
int exr_read(const char* path, float* out) {
  std::vector<uint8_t> buf;
  if (!load_file(path, &buf)) return -1;
  Parsed p;
  if (!parse_header(buf, &p)) return -2;
  if (p.comp == PIZ || p.comp > PXR24) return -3;

  const int lines = lines_per_chunk(p.comp);
  const int c = static_cast<int>(p.channels.size());
  const int n_chunks = (p.height + lines - 1) / lines;
  size_t row_bytes = 0;
  for (const auto& ch : p.channels)
    row_bytes += static_cast<size_t>(p.width) * pixel_size(ch.ptype);

  // destination channel order: RGB(A) first if present
  std::vector<int> dst_idx(c);
  {
    bool rgb = false;
    int ri = -1, gi = -1, bi = -1;
    for (int i = 0; i < c; ++i) {
      if (p.channels[i].name == "R") ri = i;
      if (p.channels[i].name == "G") gi = i;
      if (p.channels[i].name == "B") bi = i;
    }
    rgb = ri >= 0 && gi >= 0 && bi >= 0;
    int extra = 3;
    for (int i = 0; i < c; ++i) {
      if (rgb && i == ri) dst_idx[i] = 0;
      else if (rgb && i == gi) dst_idx[i] = 1;
      else if (rgb && i == bi) dst_idx[i] = 2;
      else dst_idx[i] = rgb ? extra++ : i;
    }
  }

  std::vector<uint8_t> raw(static_cast<size_t>(lines) * row_bytes);
  std::vector<uint8_t> tmp(raw.size());

  const uint8_t* table = buf.data() + p.offsets_pos;
  for (int ci = 0; ci < n_chunks; ++ci) {
    uint64_t off;
    std::memcpy(&off, table + 8ull * ci, 8);
    if (off + 8 > buf.size()) return -4;
    int32_t y = get_i32(buf.data() + off) - p.y_min;
    int32_t size = get_i32(buf.data() + off + 4);
    const uint8_t* data = buf.data() + off + 8;
    int y1 = y + lines < p.height ? y + lines : p.height;
    int nrows = y1 - y;
    size_t raw_size = static_cast<size_t>(nrows) * row_bytes;

    const uint8_t* rows = nullptr;
    if (p.comp == NONE || static_cast<size_t>(size) >= raw_size) {
      rows = data;
    } else if (p.comp == ZIPS || p.comp == ZIP) {
      if (!zlib_inflate(data, size, tmp.data(), raw_size)) return -5;
      filter_decode(tmp.data(), raw_size, raw.data());
      rows = raw.data();
    } else if (p.comp == RLE) {
      std::vector<uint8_t> rle(raw_size);
      if (rle_decode(data, size, rle.data(), raw_size) != raw_size)
        return -5;
      std::memcpy(tmp.data(), rle.data(), raw_size);
      filter_decode(tmp.data(), raw_size, raw.data());
      rows = raw.data();
    } else {  // PXR24
      // inflate then unpack plane deltas straight to out
      std::vector<uint8_t> planes;
      planes.resize(raw_size);  // upper bound: 3 bytes/px <= 4 bytes/px
      uLongf plen = planes.size();
      if (uncompress(planes.data(), &plen, data, size) != Z_OK) return -5;
      size_t pos = 0;
      for (int yy = y; yy < y1; ++yy) {
        for (int k = 0; k < c; ++k) {
          float* drow = out +
              (static_cast<size_t>(yy) * p.width + 0) * c + dst_idx[k];
          if (p.channels[k].ptype == FLOAT) {
            const uint8_t* hi = planes.data() + pos;
            const uint8_t* mid = hi + p.width;
            const uint8_t* lo = mid + p.width;
            pos += static_cast<size_t>(p.width) * 3;
            uint32_t pix = 0;
            for (int x = 0; x < p.width; ++x) {
              uint32_t diff = (static_cast<uint32_t>(hi[x]) << 16) |
                              (static_cast<uint32_t>(mid[x]) << 8) | lo[x];
              pix = (pix + diff) & 0xFFFFFFu;
              drow[static_cast<size_t>(x) * c] = float24_to_float(pix);
            }
          } else {  // HALF
            const uint8_t* hi = planes.data() + pos;
            const uint8_t* lo = hi + p.width;
            pos += static_cast<size_t>(p.width) * 2;
            uint32_t pix = 0;
            for (int x = 0; x < p.width; ++x) {
              uint32_t diff = (static_cast<uint32_t>(hi[x]) << 8) | lo[x];
              pix = (pix + diff) & 0xFFFFu;
              drow[static_cast<size_t>(x) * c] =
                  half_to_float(static_cast<uint16_t>(pix));
            }
          }
        }
      }
      continue;
    }

    // unpack plain rows
    size_t pos2 = 0;
    for (int yy = y; yy < y1; ++yy) {
      for (int k = 0; k < c; ++k) {
        float* drow = out + (static_cast<size_t>(yy) * p.width) * c +
                      dst_idx[k];
        if (p.channels[k].ptype == HALF) {
          const uint16_t* src =
              reinterpret_cast<const uint16_t*>(rows + pos2);
          for (int x = 0; x < p.width; ++x)
            drow[static_cast<size_t>(x) * c] = half_to_float(src[x]);
          pos2 += static_cast<size_t>(p.width) * 2;
        } else {
          const float* src = reinterpret_cast<const float*>(rows + pos2);
          for (int x = 0; x < p.width; ++x)
            drow[static_cast<size_t>(x) * c] = src[x];
          pos2 += static_cast<size_t>(p.width) * 4;
        }
      }
    }
  }
  return 0;
}

}  // extern "C"
