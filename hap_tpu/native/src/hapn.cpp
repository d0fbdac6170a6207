// hapn.cpp — native byte-plane runtime for the hap_tpu framework.
//
// Contains, in one translation unit:
//   * a from-scratch Snappy codec (format per the public Snappy format
//     description, normative external reference [2] of the Hap spec). The
//     compressor mirrors hap_tpu/snappy/pyref.py decision-for-decision so
//     the Python oracle and this codec emit identical streams.
//   * a Hap container codec with the exact semantics of the reference
//     library (/root/reference/source/hap.c — re-derived, not translated):
//     section headers (hap.c:137-212), chunk legalization (hap.c:277-300),
//     encoder fallbacks (hap.c:448-495), decode-instructions parsing
//     (hap.c:644-730), multi-image walk (hap.c:932-991).
//   * a std::thread chunk pool replacing the reference's inversion-of-
//     control decode callback (hap.h:66-67,113-128).
//
// Exported as a C ABI consumed by hap_tpu/native.py via ctypes.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <thread>
#include <vector>
#include <atomic>
#include <algorithm>

// ---------------------------------------------------------------------------
// Result codes: match HapResult (hap.h:55-61).
// ---------------------------------------------------------------------------
enum {
  HAPN_OK = 0,
  HAPN_BAD_ARGUMENTS = 1,
  HAPN_BUFFER_TOO_SMALL = 2,
  HAPN_BAD_FRAME = 3,
  HAPN_INTERNAL_ERROR = 4,
};

// API texture-format constants (hap.h:40-48).
enum {
  FMT_RGB_DXT1 = 0x83F0,
  FMT_RGBA_DXT5 = 0x83F3,
  FMT_YCOCG_DXT5 = 0x01,
  FMT_A_RGTC1 = 0x8DBB,
  FMT_RGBA_BPTC = 0x8E8C,
  FMT_RGB_BPTC_UF = 0x8E8F,
  FMT_RGB_BPTC_SF = 0x8E8E,
};

// Stored nibbles (hap.c:41-51) and section types (hap.c:84-88).
enum {
  COMP_NONE = 0xA,
  COMP_SNAPPY = 0xB,
  COMP_COMPLEX = 0xC,
  SEC_MULTI = 0x0D,
  SEC_DECODE_INSTRUCTIONS = 0x01,
  SEC_COMPRESSOR_TABLE = 0x02,
  SEC_SIZE_TABLE = 0x03,
  SEC_OFFSET_TABLE = 0x04,
};

static const uint32_t kUint24Max = 0x00FFFFFF;
static const uint32_t kMaxChunkCount = 3355431;  // hap.c:279-284

// ===========================================================================
// Snappy
// ===========================================================================

static inline uint32_t load32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;  // little-endian hosts only (x86/ARM LE) — fine for this runtime
}

static inline size_t varint_encode(uint8_t* dst, uint64_t v) {
  size_t i = 0;
  while (v >= 0x80) {
    dst[i++] = (uint8_t)(v | 0x80);
    v >>= 7;
  }
  dst[i++] = (uint8_t)v;
  return i;
}

static inline int varint_decode(const uint8_t* src, size_t n, uint64_t* out,
                                size_t* consumed) {
  uint64_t result = 0;
  int shift = 0;
  size_t i = 0;
  for (;;) {
    if (i >= n || shift > 32) return HAPN_BAD_FRAME;
    uint8_t b = src[i++];
    result |= (uint64_t)(b & 0x7F) << shift;
    if (!(b & 0x80)) break;
    shift += 7;
  }
  *out = result;
  *consumed = i;
  return HAPN_OK;
}

extern "C" size_t hapn_snappy_max_compressed_length(size_t n) {
  return 32 + n + n / 6;
}

extern "C" int hapn_snappy_uncompressed_length(const uint8_t* src, size_t n,
                                               size_t* out) {
  uint64_t v;
  size_t c;
  int r = varint_decode(src, n, &v, &c);
  if (r != HAPN_OK) return r;
  *out = (size_t)v;
  return HAPN_OK;
}

// --- compression (mirrors hap_tpu/snappy/pyref.py exactly) -----------------

static const size_t kBlockSize = 65536;
static const int kMaxHashBits = 14;

static inline uint32_t snap_hash(uint32_t u, int shift) {
  return (u * 0x1E35A7BDu) >> shift;
}

static uint8_t* emit_literal(uint8_t* op, const uint8_t* src, size_t len) {
  size_t n = len - 1;
  if (n < 60) {
    *op++ = (uint8_t)(n << 2);
  } else if (n < (1u << 8)) {
    *op++ = (60 << 2);
    *op++ = (uint8_t)n;
  } else if (n < (1u << 16)) {
    *op++ = (61 << 2);
    *op++ = (uint8_t)n;
    *op++ = (uint8_t)(n >> 8);
  } else if (n < (1u << 24)) {
    *op++ = (62 << 2);
    *op++ = (uint8_t)n;
    *op++ = (uint8_t)(n >> 8);
    *op++ = (uint8_t)(n >> 16);
  } else {
    *op++ = (63 << 2);
    *op++ = (uint8_t)n;
    *op++ = (uint8_t)(n >> 8);
    *op++ = (uint8_t)(n >> 16);
    *op++ = (uint8_t)(n >> 24);
  }
  std::memcpy(op, src, len);
  return op + len;
}

static uint8_t* emit_copy_upto64(uint8_t* op, size_t offset, size_t len) {
  if (len >= 4 && len < 12 && offset < 2048) {
    *op++ = (uint8_t)(1 | ((len - 4) << 2) | ((offset >> 8) << 5));
    *op++ = (uint8_t)offset;
  } else if (offset < 65536) {
    *op++ = (uint8_t)(2 | ((len - 1) << 2));
    *op++ = (uint8_t)offset;
    *op++ = (uint8_t)(offset >> 8);
  } else {
    *op++ = (uint8_t)(3 | ((len - 1) << 2));
    *op++ = (uint8_t)offset;
    *op++ = (uint8_t)(offset >> 8);
    *op++ = (uint8_t)(offset >> 16);
    *op++ = (uint8_t)(offset >> 24);
  }
  return op;
}

static uint8_t* emit_copy(uint8_t* op, size_t offset, size_t len) {
  while (len >= 68) {
    op = emit_copy_upto64(op, offset, 64);
    len -= 64;
  }
  if (len > 64) {
    op = emit_copy_upto64(op, offset, 60);
    len -= 60;
  }
  return emit_copy_upto64(op, offset, len);
}

static uint8_t* compress_block(uint8_t* op, const uint8_t* base, size_t size,
                               uint16_t* table) {
  if (size < 15) return emit_literal(op, base, size);
  int table_bits = 8;
  while ((size_t)(1u << table_bits) < size && table_bits < kMaxHashBits)
    table_bits++;
  const int shift = 32 - table_bits;
  std::memset(table, 0, sizeof(uint16_t) << table_bits);

  const uint8_t* end = base + size;
  const uint8_t* limit = end - 4;
  const uint8_t* ip = base;
  const uint8_t* lit_start = base;
  uint32_t u32 = load32(ip);
  for (;;) {
    uint32_t skip = 32;
    const uint8_t* candidate;
    for (;;) {
      uint32_t h = snap_hash(u32, shift);
      int32_t cand_off = (int32_t)table[h] - 1;
      table[h] = (uint16_t)((ip - base) + 1);
      if (cand_off >= 0 && load32(base + cand_off) == u32) {
        candidate = base + cand_off;
        break;
      }
      size_t bytes_between = skip >> 5;
      skip++;
      ip += bytes_between;
      if (ip > limit) {
        if (lit_start < end) op = emit_literal(op, lit_start, end - lit_start);
        return op;
      }
      u32 = load32(ip);
    }
    if (ip > lit_start) op = emit_literal(op, lit_start, ip - lit_start);
    size_t match_len = 4;
    while (ip + match_len < end && ip[match_len] == candidate[match_len])
      match_len++;
    op = emit_copy(op, (size_t)(ip - candidate), match_len);
    ip += match_len;
    lit_start = ip;
    if (ip > limit) {
      if (lit_start < end) op = emit_literal(op, lit_start, end - lit_start);
      return op;
    }
    u32 = load32(ip);
  }
}

extern "C" int hapn_snappy_compress(const uint8_t* src, size_t n, uint8_t* dst,
                                    size_t* dst_len) {
  if ((!src && n) || !dst || !dst_len) return HAPN_BAD_ARGUMENTS;
  if (*dst_len < hapn_snappy_max_compressed_length(n))
    return HAPN_BUFFER_TOO_SMALL;
  uint8_t* op = dst + varint_encode(dst, n);
  uint16_t table[1 << kMaxHashBits];
  for (size_t pos = 0; pos < n; pos += kBlockSize) {
    size_t block = std::min(n - pos, kBlockSize);
    op = compress_block(op, src + pos, block, table);
  }
  if (n == 0 && *dst_len < 1) return HAPN_BUFFER_TOO_SMALL;
  *dst_len = (size_t)(op - dst);
  return HAPN_OK;
}

// --- decompression ----------------------------------------------------------

extern "C" int hapn_snappy_uncompress(const uint8_t* src, size_t n,
                                      uint8_t* dst, size_t dst_cap,
                                      size_t* out_len) {
  if ((!src && n) || (!dst && dst_cap)) return HAPN_BAD_ARGUMENTS;
  uint64_t out_len64;
  size_t pre;
  int r = varint_decode(src, n, &out_len64, &pre);
  if (r != HAPN_OK) return r;
  if (out_len64 > dst_cap) return HAPN_BUFFER_TOO_SMALL;
  const size_t out_n = (size_t)out_len64;
  const uint8_t* ip = src + pre;
  const uint8_t* ip_end = src + n;
  uint8_t* op = dst;
  uint8_t* op_end = dst + out_n;

  while (ip < ip_end) {
    const uint8_t tag = *ip++;
    const uint32_t kind = tag & 0x3;
    size_t len, offset;
    if (kind == 0) {  // literal
      len = (tag >> 2) + 1;
      if (len > 60) {
        size_t extra = len - 60;
        if (ip + extra > ip_end) return HAPN_BAD_FRAME;
        len = 0;
        for (size_t i = 0; i < extra; i++) len |= (size_t)ip[i] << (8 * i);
        len += 1;
        ip += extra;
      }
      if (ip + len > ip_end || op + len > op_end) return HAPN_BAD_FRAME;
      std::memcpy(op, ip, len);
      ip += len;
      op += len;
      continue;
    }
    if (kind == 1) {
      if (ip + 1 > ip_end) return HAPN_BAD_FRAME;
      len = ((tag >> 2) & 0x7) + 4;
      offset = ((size_t)(tag >> 5) << 8) | *ip;
      ip += 1;
    } else if (kind == 2) {
      if (ip + 2 > ip_end) return HAPN_BAD_FRAME;
      len = (tag >> 2) + 1;
      offset = (size_t)ip[0] | ((size_t)ip[1] << 8);
      ip += 2;
    } else {
      if (ip + 4 > ip_end) return HAPN_BAD_FRAME;
      len = (tag >> 2) + 1;
      offset = (size_t)ip[0] | ((size_t)ip[1] << 8) | ((size_t)ip[2] << 16) |
               ((size_t)ip[3] << 24);
      ip += 4;
    }
    if (offset == 0 || (size_t)(op - dst) < offset || op + len > op_end)
      return HAPN_BAD_FRAME;
    const uint8_t* copy_src = op - offset;
    if (offset >= len) {
      std::memcpy(op, copy_src, len);
    } else {
      for (size_t i = 0; i < len; i++) op[i] = copy_src[i];  // overlapping run
    }
    op += len;
  }
  if (op != op_end) return HAPN_BAD_FRAME;
  if (out_len) *out_len = out_n;
  return HAPN_OK;
}

// ===========================================================================
// Hap container
// ===========================================================================

static inline uint32_t read3(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16);
}
static inline uint32_t read4(const uint8_t* p) {
  return read3(p) | ((uint32_t)p[3] << 24);
}
static inline void write3(uint8_t* p, uint32_t v) {
  p[0] = v & 0xFF;
  p[1] = (v >> 8) & 0xFF;
  p[2] = (v >> 16) & 0xFF;
}
static inline void write4(uint8_t* p, uint32_t v) {
  write3(p, v);
  p[3] = (v >> 24) & 0xFF;
}

// Section-header parse with the reference's bounds semantics (hap.c:137-187).
static int read_section_header(const uint8_t* buf, size_t buf_len,
                               uint32_t* hdr_len, uint32_t* sec_len,
                               uint32_t* sec_type) {
  if (buf_len < 4) return HAPN_BAD_FRAME;
  *sec_len = read3(buf);
  if (*sec_len == 0) {
    if (buf_len < 8) return HAPN_BAD_FRAME;
    *sec_len = read4(buf + 4);
    *hdr_len = 8;
  } else {
    *hdr_len = 4;
  }
  *sec_type = buf[3];
  if ((uint64_t)*hdr_len + *sec_len > buf_len) return HAPN_BAD_FRAME;
  return HAPN_OK;
}

static void write_section_header(uint8_t* buf, size_t hdr_len, uint32_t sec_len,
                                 uint32_t sec_type) {
  if (hdr_len == 4) {
    write3(buf, sec_len);
  } else {
    write3(buf, 0);
    write4(buf + 4, sec_len);
  }
  buf[3] = (uint8_t)sec_type;
}

static uint32_t format_constant_for_id(uint32_t id) {
  switch (id) {  // hap.c:214-237
    case 0xB: return FMT_RGB_DXT1;
    case 0xE: return FMT_RGBA_DXT5;
    case 0xF: return FMT_YCOCG_DXT5;
    case 0x1: return FMT_A_RGTC1;
    case 0xC: return FMT_RGBA_BPTC;
    case 0x2: return FMT_RGB_BPTC_UF;
    case 0x3: return FMT_RGB_BPTC_SF;
    default: return 0;
  }
}

static uint32_t format_id_for_constant(uint32_t c) {
  switch (c) {  // hap.c:240-261
    case FMT_RGB_DXT1: return 0xB;
    case FMT_RGBA_DXT5: return 0xE;
    case FMT_YCOCG_DXT5: return 0xF;
    case FMT_A_RGTC1: return 0x1;
    case FMT_RGBA_BPTC: return 0xC;
    case FMT_RGB_BPTC_UF: return 0x2;
    case FMT_RGB_BPTC_SF: return 0x3;
    default: return 0;
  }
}

static size_t decode_instructions_length(uint32_t chunk_count) {
  return 5 * (size_t)chunk_count + 8;  // hap.c:265-275
}

static uint32_t limited_chunk_count(size_t input_bytes, uint32_t fmt,
                                    uint32_t chunk_count) {
  if (chunk_count > kMaxChunkCount) chunk_count = kMaxChunkCount;  // hap.c:281
  size_t block_bytes =
      (fmt == FMT_RGB_DXT1 || fmt == FMT_A_RGTC1) ? 8 : 16;  // hap.c:287-294
  size_t blocks = input_bytes / block_bytes;
  while (blocks % chunk_count != 0) chunk_count--;  // hap.c:295-298
  return chunk_count;
}

static size_t max_encoded_length_single(size_t input_bytes, uint32_t fmt,
                                        int snappy, uint32_t chunk_count) {
  chunk_count = limited_chunk_count(input_bytes, fmt, chunk_count);
  size_t dil = decode_instructions_length(chunk_count);
  size_t max_comp;
  if (snappy) {
    size_t chunk_size = input_bytes / chunk_count;
    max_comp = hapn_snappy_max_compressed_length(chunk_size) * chunk_count;
  } else {
    max_comp = input_bytes;
  }
  return max_comp + 8 + dil + 4;  // hap.c:321
}

extern "C" unsigned long hapn_max_encoded_length(unsigned int count,
                                                 const unsigned long* lengths,
                                                 const unsigned int* formats,
                                                 const unsigned int* ccs) {
  if (count == 0 || count > 2 || !lengths || !formats || !ccs) return 0;
  unsigned long total = 8;  // multi-image allowance, always (hap.c:330)
  for (unsigned int i = 0; i < count; i++) {
    if (ccs[i] == 0) return 0;
    total += max_encoded_length_single(lengths[i], formats[i], 1, ccs[i]);
  }
  return total;
}

// --- parallel chunk pool ----------------------------------------------------

template <typename F>
static void parallel_for(uint32_t count, int n_threads, F&& fn) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  uint32_t workers = std::min<uint32_t>((uint32_t)n_threads, count);
  if (workers <= 1) {
    for (uint32_t i = 0; i < count; i++) fn(i);
    return;
  }
  std::atomic<uint32_t> next(0);
  std::vector<std::thread> threads;
  auto work = [&]() {
    for (;;) {
      uint32_t i = next.fetch_add(1);
      if (i >= count) return;
      fn(i);
    }
  };
  threads.reserve(workers - 1);
  for (uint32_t t = 0; t + 1 < workers; t++) threads.emplace_back(work);
  work();
  for (auto& th : threads) th.join();
}

// --- encode -----------------------------------------------------------------

static int encode_texture(const uint8_t* input, size_t input_bytes,
                          uint32_t texture_format, uint32_t compressor_snappy,
                          uint32_t chunk_count, uint8_t* out, size_t out_cap,
                          size_t* out_used, int n_threads) {
  if (!input || input_bytes == 0 || !out || !out_used)
    return HAPN_BAD_ARGUMENTS;
  uint32_t fmt_id = format_id_for_constant(texture_format);
  if (fmt_id == 0) return HAPN_BAD_ARGUMENTS;
  if (out_cap < max_encoded_length_single(input_bytes, texture_format,
                                          compressor_snappy, chunk_count))
    return HAPN_BUFFER_TOO_SMALL;

  size_t top_hdr = input_bytes > kUint24Max ? 8 : 4;  // hap.c:398-405
  size_t top_len = 0;
  uint32_t stored_compressor = COMP_NONE;
  bool store_raw = !compressor_snappy;

  if (compressor_snappy) {
    chunk_count = limited_chunk_count(input_bytes, texture_format, chunk_count);
    size_t dil = decode_instructions_length(chunk_count);
    if (input_bytes + dil + 4 > kUint24Max) top_hdr = 8;  // hap.c:425-428
    size_t chunk_size = input_bytes / chunk_count;

    uint8_t* comp_table = out + top_hdr + 4 + 4;
    uint8_t* size_table = out + top_hdr + 4 + 4 + chunk_count + 4;
    uint8_t* data_base = out + top_hdr + 4 + dil;

    write_section_header(out + top_hdr, 4, (uint32_t)dil,
                         SEC_DECODE_INSTRUCTIONS);
    write_section_header(out + top_hdr + 4, 4, chunk_count,
                         SEC_COMPRESSOR_TABLE);
    write_section_header(out + top_hdr + 4 + 4 + chunk_count, 4,
                         chunk_count * 4, SEC_SIZE_TABLE);

    // Chunk-parallel compress into per-chunk scratch at max-bound spacing,
    // then compact. (The reference's loop is serial, hap.c:448-476; the
    // byte result is identical because compaction preserves order.)
    size_t bound = hapn_snappy_max_compressed_length(chunk_size);
    std::vector<uint8_t> scratch(bound * chunk_count);
    std::vector<size_t> sizes(chunk_count);
    std::vector<uint8_t> kinds(chunk_count);
    std::atomic<int> err(HAPN_OK);

    parallel_for(chunk_count, n_threads, [&](uint32_t i) {
      size_t packed = bound;
      int r = hapn_snappy_compress(input + chunk_size * i, chunk_size,
                                   scratch.data() + bound * i, &packed);
      if (r != HAPN_OK) {
        err.store(HAPN_INTERNAL_ERROR);
        return;
      }
      if (packed >= chunk_size) {  // raw fallback (hap.c:460-466)
        std::memcpy(scratch.data() + bound * i, input + chunk_size * i,
                    chunk_size);
        packed = chunk_size;
        kinds[i] = COMP_NONE;
      } else {
        kinds[i] = COMP_SNAPPY;
      }
      sizes[i] = packed;
    });
    if (err.load() != HAPN_OK) return err.load();

    uint8_t* wp = data_base;
    for (uint32_t i = 0; i < chunk_count; i++) {
      comp_table[i] = kinds[i];
      write4(size_table + 4 * i, (uint32_t)sizes[i]);
      std::memcpy(wp, scratch.data() + bound * i, sizes[i]);
      wp += sizes[i];
    }
    top_len = 4 + dil + (size_t)(wp - data_base);

    if (top_len < input_bytes + top_hdr) {  // hap.c:478-482
      stored_compressor = COMP_COMPLEX;
    } else {
      store_raw = true;  // whole-frame fallback (hap.c:483-487)
    }
  }

  if (store_raw) {
    std::memmove(out + top_hdr, input, input_bytes);
    top_len = input_bytes;
    stored_compressor = COMP_NONE;
  }

  write_section_header(out, top_hdr, (uint32_t)top_len,
                       (stored_compressor << 4) | fmt_id);
  *out_used = top_len + top_hdr;
  return HAPN_OK;
}

extern "C" int hapn_encode(unsigned int count, const uint8_t** inputs,
                           const unsigned long* input_sizes,
                           const unsigned int* formats,
                           const unsigned int* compressors,
                           const unsigned int* chunk_counts, uint8_t* out,
                           unsigned long out_cap, unsigned long* out_used,
                           int n_threads) {
  if (count == 0 || count > 2 || !inputs || !input_sizes || !formats ||
      !compressors || !chunk_counts || !out || out_cap == 0 || !out_used)
    return HAPN_BAD_ARGUMENTS;
  for (unsigned int i = 0; i < count; i++)
    if (chunk_counts[i] == 0) return HAPN_BAD_ARGUMENTS;

  if (count == 1) {
    size_t used = 0;
    int r = encode_texture(inputs[0], input_sizes[0], formats[0],
                           compressors[0] == 1, chunk_counts[0], out, out_cap,
                           &used, n_threads);
    *out_used = used;
    return r;
  }
  // Two textures: reference requires at least one YCoCg OR at least one
  // RGTC1 (hap.c:551-559) — reproduced verbatim (looser than the spec).
  if ((formats[0] != FMT_YCOCG_DXT5 && formats[1] != FMT_YCOCG_DXT5) &&
      (formats[0] != FMT_A_RGTC1 && formats[1] != FMT_A_RGTC1))
    return HAPN_BAD_ARGUMENTS;

  size_t worst = 0;  // hap.c:562-576
  for (unsigned int i = 0; i < count; i++)
    worst += input_sizes[i] + decode_instructions_length(chunk_counts[i]) + 4;
  size_t top_hdr = worst > kUint24Max ? 8 : 4;

  size_t top_len = 0;
  for (unsigned int i = 0; i < count; i++) {
    size_t used = 0;
    int r = encode_texture(inputs[i], input_sizes[i], formats[i],
                           compressors[i] == 1, chunk_counts[i],
                           out + top_hdr + top_len,
                           out_cap - (top_hdr + top_len), &used, n_threads);
    if (r != HAPN_OK) return r;
    top_len += used;
  }
  write_section_header(out, top_hdr, (uint32_t)top_len, SEC_MULTI);
  *out_used = top_len + top_hdr;
  return HAPN_OK;
}

// --- decode -----------------------------------------------------------------

// Locate texture section at index (hap_get_section_at_index, hap.c:932-991).
static int get_section_at_index(const uint8_t* buf, size_t buf_len,
                                uint32_t index, const uint8_t** section,
                                uint32_t* sec_len, uint32_t* sec_type) {
  uint32_t hdr_len;
  int r = read_section_header(buf, buf_len, &hdr_len, sec_len, sec_type);
  if (r != HAPN_OK) return r;
  if (*sec_type == SEC_MULTI) {
    size_t offset = 0;
    size_t top_len = *sec_len;
    buf += hdr_len;
    hdr_len = 0;
    *sec_len = 0;
    for (uint32_t i = 0; i <= index; i++) {
      offset += hdr_len + *sec_len;
      if (offset >= top_len) return HAPN_BAD_ARGUMENTS;
      r = read_section_header(buf + offset, top_len - offset, &hdr_len, sec_len,
                              sec_type);
      if (r != HAPN_OK) return r;
    }
    *section = buf + offset + hdr_len;
    return HAPN_OK;
  }
  if (index == 0) {
    *section = buf + hdr_len;
    return HAPN_OK;
  }
  return HAPN_BAD_ARGUMENTS;
}

// Parse Decode Instructions Container (hap.c:644-730).
static int parse_decode_instructions(const uint8_t* section, uint32_t sec_len,
                                     uint32_t* chunk_count,
                                     const uint8_t** compressors,
                                     const uint8_t** chunk_sizes,
                                     const uint8_t** chunk_offsets,
                                     const uint8_t** frame_data) {
  *compressors = nullptr;
  *chunk_sizes = nullptr;
  *chunk_offsets = nullptr;
  *chunk_count = 0;
  uint32_t hdr, len, type;
  int r = read_section_header(section, sec_len, &hdr, &len, &type);
  if (r != HAPN_OK) return r;
  if (type != SEC_DECODE_INSTRUCTIONS) return HAPN_BAD_FRAME;
  *frame_data = section + hdr + len;
  const uint8_t* p = section + hdr;
  size_t remaining = len;
  while (remaining > 0) {
    r = read_section_header(p, remaining, &hdr, &len, &type);
    if (r != HAPN_OK) return r;
    p += hdr;
    uint32_t section_cc = 0;
    switch (type) {
      case SEC_COMPRESSOR_TABLE:
        *compressors = p;
        section_cc = len;
        break;
      case SEC_SIZE_TABLE:
        *chunk_sizes = p;
        section_cc = len / 4;
        break;
      case SEC_OFFSET_TABLE:
        *chunk_offsets = p;
        section_cc = len / 4;
        break;
      default:
        break;  // skip unknown sections (spec HapVideoDRAFT.md:34)
    }
    if (section_cc != 0) {
      if (*chunk_count != 0 && section_cc != *chunk_count)
        return HAPN_BAD_FRAME;
      *chunk_count = section_cc;
    }
    p += len;
    remaining -= hdr + len;
  }
  if (!*compressors || !*chunk_sizes) return HAPN_BAD_FRAME;
  return HAPN_OK;
}

// buf_end = end of the WHOLE input frame buffer: chunk data is bounded by
// the input buffer, not the section length — the reference reads past the
// section end unchecked (and has no input bound at all: it segfaults when
// the size table points past the buffer, hap.c:800-838; see
// tests/test_oracle_fuzz.py). We accept everything it successfully
// decodes and return Bad_Frame exactly where it would read out of bounds.
static int decode_single_texture(const uint8_t* section, uint32_t sec_len,
                                 uint32_t sec_type, const uint8_t* buf_end,
                                 uint8_t* out,
                                 size_t out_cap, size_t* out_used,
                                 uint32_t* out_format, int n_threads) {
  uint32_t compressor = (sec_type & 0xF0) >> 4;
  uint32_t fmt_id = sec_type & 0x0F;
  *out_format = format_constant_for_id(fmt_id);
  if (*out_format == 0) return HAPN_BAD_FRAME;
  size_t bytes_used = 0;

  if (compressor == COMP_COMPLEX) {
    uint32_t chunk_count;
    const uint8_t *comps, *sizes, *offsets, *frame_data;
    int r = parse_decode_instructions(section, sec_len, &chunk_count, &comps,
                                      &sizes, &offsets, &frame_data);
    if (r != HAPN_OK) return r;
    if (chunk_count > 0) {
      std::vector<const uint8_t*> src(chunk_count);
      std::vector<size_t> src_size(chunk_count), dst_off(chunk_count),
          dst_size(chunk_count);
      size_t running_comp = 0, running_uncomp = 0;
      const uint8_t* frame_end = buf_end;
      for (uint32_t i = 0; i < chunk_count; i++) {
        src_size[i] = read4(sizes + 4 * i);
        src[i] = offsets ? frame_data + read4(offsets + 4 * i)
                         : frame_data + running_comp;
        running_comp += src_size[i];
        if (src[i] + src_size[i] > frame_end || src[i] < section)
          return HAPN_BAD_FRAME;
        if (comps[i] == COMP_SNAPPY) {
          size_t ul;
          if (hapn_snappy_uncompressed_length(src[i], src_size[i], &ul) !=
              HAPN_OK)
            return HAPN_BAD_FRAME;
          dst_size[i] = ul;
        } else {
          dst_size[i] = src_size[i];
        }
        dst_off[i] = running_uncomp;
        running_uncomp += dst_size[i];
      }
      if (running_uncomp > out_cap) return HAPN_BUFFER_TOO_SMALL;
      bytes_used = running_uncomp;
      std::atomic<int> err(HAPN_OK);
      parallel_for(chunk_count, n_threads, [&](uint32_t i) {
        if (comps[i] == COMP_SNAPPY) {
          size_t got = 0;
          int rr = hapn_snappy_uncompress(src[i], src_size[i],
                                          out + dst_off[i], dst_size[i], &got);
          if (rr != HAPN_OK || got != dst_size[i]) err.store(HAPN_BAD_FRAME);
        } else if (comps[i] == COMP_NONE) {
          std::memcpy(out + dst_off[i], src[i], dst_size[i]);
        } else {
          err.store(HAPN_BAD_FRAME);  // hap.c:637-640
        }
      });
      if (err.load() != HAPN_OK) return err.load();
    }
  } else if (compressor == COMP_SNAPPY) {
    size_t ul;
    if (hapn_snappy_uncompressed_length(section, sec_len, &ul) != HAPN_OK)
      return HAPN_INTERNAL_ERROR;
    if (ul > out_cap) return HAPN_BUFFER_TOO_SMALL;
    size_t got = 0;
    if (hapn_snappy_uncompress(section, sec_len, out, out_cap, &got) != HAPN_OK)
      return HAPN_INTERNAL_ERROR;
    bytes_used = got;
  } else if (compressor == COMP_NONE) {
    if (sec_len > out_cap) return HAPN_BUFFER_TOO_SMALL;
    std::memcpy(out, section, sec_len);
    bytes_used = sec_len;
  } else {
    return HAPN_BAD_FRAME;
  }
  if (out_used) *out_used = bytes_used;
  return HAPN_OK;
}

extern "C" int hapn_decode(const uint8_t* frame, unsigned long frame_len,
                           unsigned int index, uint8_t* out,
                           unsigned long out_cap, unsigned long* out_used,
                           unsigned int* out_format, int n_threads) {
  if (!frame || index > 1 || !out || !out_format) return HAPN_BAD_ARGUMENTS;
  const uint8_t* section;
  uint32_t sec_len, sec_type;
  int r = get_section_at_index(frame, frame_len, index, &section, &sec_len,
                               &sec_type);
  if (r != HAPN_OK) return r;
  size_t used = 0;
  uint32_t fmt = 0;
  r = decode_single_texture(section, sec_len, sec_type, frame + frame_len,
                            out, out_cap, &used, &fmt, n_threads);
  if (out_used) *out_used = used;
  *out_format = fmt;
  return r;
}

// --- introspection (hap.c:1042-1188) ---------------------------------------

extern "C" int hapn_get_texture_count(const uint8_t* frame,
                                      unsigned long frame_len,
                                      unsigned int* count) {
  uint32_t hdr, len, type;
  int r = read_section_header(frame, frame_len, &hdr, &len, &type);
  if (r != HAPN_OK) return r;
  if (type == SEC_MULTI) {
    uint32_t offset = hdr;
    uint32_t top_len = len;
    *count = 0;
    while (offset < top_len) {
      r = read_section_header(frame + offset, frame_len - offset, &hdr, &len,
                              &type);
      if (r != HAPN_OK) return r;
      offset += hdr + len;
      (*count)++;
    }
    return HAPN_OK;
  }
  *count = 1;
  return HAPN_OK;
}

extern "C" int hapn_get_texture_format(const uint8_t* frame,
                                       unsigned long frame_len,
                                       unsigned int index,
                                       unsigned int* out_format) {
  if (!frame || index > 1 || !out_format) return HAPN_BAD_ARGUMENTS;
  const uint8_t* section;
  uint32_t sec_len, sec_type;
  int r = get_section_at_index(frame, frame_len, index, &section, &sec_len,
                               &sec_type);
  if (r != HAPN_OK) return r;
  *out_format = format_constant_for_id(sec_type & 0x0F);
  return *out_format == 0 ? HAPN_BAD_FRAME : HAPN_OK;
}

extern "C" int hapn_get_chunk_count(const uint8_t* frame,
                                    unsigned long frame_len, unsigned int index,
                                    int* chunk_count) {
  if (!frame || index > 1) return HAPN_BAD_ARGUMENTS;
  *chunk_count = 0;
  const uint8_t* section;
  uint32_t sec_len, sec_type;
  int r = get_section_at_index(frame, frame_len, index, &section, &sec_len,
                               &sec_type);
  if (r != HAPN_OK) return r;
  uint32_t compressor = (sec_type & 0xF0) >> 4;
  if (compressor == COMP_COMPLEX) {
    uint32_t cc;
    const uint8_t *a, *b, *c, *d;
    r = parse_decode_instructions(section, sec_len, &cc, &a, &b, &c, &d);
    if (r != HAPN_OK) return r;
    *chunk_count = (int)cc;
    return HAPN_OK;
  }
  if (compressor == COMP_SNAPPY || compressor == COMP_NONE) {
    *chunk_count = 1;
    return HAPN_OK;
  }
  return HAPN_BAD_FRAME;
}

// Chunk-parallel batch snappy: compress/decompress many independent buffers
// (used by the pipeline to run the byte plane while the TPU runs the block
// plane). Arrays are flat with per-item offsets.
extern "C" int hapn_snappy_compress_batch(const uint8_t* src,
                                          const unsigned long* src_offsets,
                                          const unsigned long* src_sizes,
                                          uint8_t* dst,
                                          const unsigned long* dst_offsets,
                                          unsigned long* dst_sizes,
                                          unsigned int count, int n_threads) {
  std::atomic<int> err(HAPN_OK);
  parallel_for(count, n_threads, [&](uint32_t i) {
    size_t out_len = dst_sizes[i];
    int r = hapn_snappy_compress(src + src_offsets[i], src_sizes[i],
                                 dst + dst_offsets[i], &out_len);
    if (r != HAPN_OK) err.store(r);
    dst_sizes[i] = out_len;
  });
  return err.load();
}

extern "C" int hapn_snappy_uncompress_batch(const uint8_t* src,
                                            const unsigned long* src_offsets,
                                            const unsigned long* src_sizes,
                                            uint8_t* dst,
                                            const unsigned long* dst_offsets,
                                            unsigned long* dst_sizes,
                                            unsigned int count, int n_threads) {
  std::atomic<int> err(HAPN_OK);
  parallel_for(count, n_threads, [&](uint32_t i) {
    size_t got = 0;
    int r = hapn_snappy_uncompress(src + src_offsets[i], src_sizes[i],
                                   dst + dst_offsets[i], dst_sizes[i], &got);
    if (r != HAPN_OK) err.store(r);
    dst_sizes[i] = got;
  });
  return err.load();
}

// ===========================================================================
// Snappy op-table compiler (the host half of the TPU parse/execute split;
// semantics mirror hap_tpu/snappy/optable.py op-for-op).
//
// Per stream: validate + walk elements, merge consecutive same-offset
// copies / consecutive literals, expand overlapping copies (off <
// min(m, 128)) into non-overlap doubling sequences, and compact literal
// bytes into a dense plane. Emitted invariant: every op has m >= 1 and
// off == 0 (literal) or min(m, 128) <= off <= bytes-produced.
// ===========================================================================

namespace {

struct OpSink {
  int32_t* ops;        // interleaved [m | end<<8, off] piece pairs
  size_t cap;          // max piece count
  size_t n = 0;
  size_t overflow = 0; // pieces that did not fit (still counted)
  int64_t pos = 0;     // output position (for 128-block splitting)

  // split op at 128-byte output-block boundaries, flag block ends
  // (mirrors optable.py's final pass)
  inline void push(int64_t m, int64_t off) {
    while (m > 0) {
      int64_t pa = pos & 127;
      int64_t take = 128 - pa < m ? 128 - pa : m;
      int32_t end = (pa + take) == 128 ? 1 : 0;
      if (n < cap) {
        ops[2 * n] = (int32_t)take | (end << 8);
        ops[2 * n + 1] = (int32_t)off;
      } else {
        overflow++;
      }
      n++;
      pos += take;
      m -= take;
    }
  }
};

// expansion of one MERGED op into the sink (after merging is final for it)
inline void emit_expanded(OpSink& sink, int64_t m, int64_t off) {
  if (off == 0 || off >= (m < 128 ? m : 128)) {
    sink.push(m, off);
    return;
  }
  int64_t cur = off, rem = m;
  while (rem > 0 && cur < 128) {
    int64_t take = cur < rem ? cur : rem;
    sink.push(take, cur);
    rem -= take;
    cur *= 2;
  }
  if (rem > 0) sink.push(rem, cur);
}

}  // namespace

// Compile one stream. Returns HAPN_OK, HAPN_BAD_FRAME (malformed),
// or HAPN_BUFFER_TOO_SMALL (caps too small; *n_ops / *n_lit report the
// required sizes so the caller can retry). The walk DECODES as it parses
// (it touches every byte anyway): copies shorter than promote_max are
// promoted to literals and merge with their neighbors — trading
// literal-plane bytes for executor pieces (the device walk is
// latency-bound per piece; the literal stream is bandwidth-cheap).
static int snappy_optable_one(const uint8_t* src, size_t n,
                              uint64_t expected_len, int32_t* ops,
                              size_t ops_cap, uint8_t* lit, size_t lit_cap,
                              int32_t* n_ops, int32_t* n_lit,
                              int32_t* out_len, int promote_max) {
  // varint preamble, <= 5 bytes, < 2^32 (mirrors optable._read_varint)
  uint64_t ulen = 0;
  size_t pos = 0;
  {
    int shift = 0;
    for (int i = 0;; i++) {
      if (i >= 5 || pos >= n) return HAPN_BAD_FRAME;
      uint8_t b = src[pos++];
      ulen |= (uint64_t)(b & 0x7F) << shift;
      if (!(b & 0x80)) break;
      shift += 7;
    }
    if (ulen >= (1ull << 32) || ulen != expected_len) return HAPN_BAD_FRAME;
  }

  // Pass 1: walk raw elements, decoding and merging consecutive same-off
  // runs (literals merge as off == 0).
  std::vector<uint8_t> dec((size_t)ulen);
  std::vector<std::pair<int64_t, int64_t>> merged;  // (m, off)
  merged.reserve(n / 8 + 4);
  uint64_t op = 0;
  while (pos < n) {
    uint8_t tag = src[pos++];
    int kind = tag & 3;
    int64_t m, off;
    if (kind == 0) {
      int64_t len = (tag >> 2) + 1;
      if (len > 60) {
        int extra = (int)(len - 60);
        if (pos + extra > n) return HAPN_BAD_FRAME;
        uint64_t v = 0;
        for (int k = 0; k < extra; k++) v |= (uint64_t)src[pos + k] << (8 * k);
        len = (int64_t)v + 1;
        pos += extra;
      }
      if (pos + (uint64_t)len > n || op + (uint64_t)len > ulen)
        return HAPN_BAD_FRAME;
      std::memcpy(dec.data() + op, src + pos, (size_t)len);
      pos += (size_t)len;
      m = len;
      off = 0;
    } else {
      if (kind == 1) {
        if (pos + 1 > n) return HAPN_BAD_FRAME;
        m = ((tag >> 2) & 7) + 4;
        off = ((int64_t)(tag >> 5) << 8) | src[pos];
        pos += 1;
      } else if (kind == 2) {
        if (pos + 2 > n) return HAPN_BAD_FRAME;
        m = (tag >> 2) + 1;
        off = (int64_t)src[pos] | ((int64_t)src[pos + 1] << 8);
        pos += 2;
      } else {
        if (pos + 4 > n) return HAPN_BAD_FRAME;
        m = (tag >> 2) + 1;
        off = (int64_t)src[pos] | ((int64_t)src[pos + 1] << 8) |
              ((int64_t)src[pos + 2] << 16) | ((int64_t)src[pos + 3] << 24);
        pos += 4;
      }
      if (off < 1 || (uint64_t)off > op || op + (uint64_t)m > ulen)
        return HAPN_BAD_FRAME;
      for (int64_t k = 0; k < m; k++)  // sequential: overlap-correct
        dec[op + k] = dec[op + k - off];
    }
    op += (uint64_t)m;
    if (!merged.empty() && merged.back().second == off)
      merged.back().first += m;
    else
      merged.emplace_back(m, off);
  }
  if (op != ulen) return HAPN_BAD_FRAME;

  // Pass 2: promote short copies to literals, re-merging neighbors.
  if (promote_max > 0) {
    std::vector<std::pair<int64_t, int64_t>> promoted;
    promoted.reserve(merged.size());
    for (auto [m, off] : merged) {
      if (off > 0 && m < promote_max) off = 0;
      if (!promoted.empty() && promoted.back().second == 0 && off == 0)
        promoted.back().first += m;
      else
        promoted.emplace_back(m, off);
    }
    merged.swap(promoted);
  }

  // Pass 3: expand overlaps + block-split into the sink; literal plane
  // bytes come from the decoded buffer in op order.
  OpSink sink{ops, ops_cap};
  size_t lit_n = 0, lit_over = 0;
  int64_t outpos = 0;
  for (auto [m, off] : merged) {
    if (off == 0) {
      if (lit_n + (size_t)m <= lit_cap)
        std::memcpy(lit + lit_n, dec.data() + outpos, (size_t)m);
      else
        lit_over += (size_t)m;
      lit_n += (size_t)m;
    }
    emit_expanded(sink, m, off);
    outpos += m;
  }

  *n_ops = (int32_t)sink.n;
  *n_lit = (int32_t)lit_n;
  *out_len = (int32_t)ulen;
  if (sink.overflow || lit_over) return HAPN_BUFFER_TOO_SMALL;
  return HAPN_OK;
}

extern "C" int hapn_snappy_optable_batch(
    const uint8_t* src, const unsigned long* src_offsets,
    const unsigned long* src_sizes, const unsigned long* expected_lens,
    int32_t* ops, unsigned long ops_cap, uint8_t* lit, unsigned long lit_cap,
    int32_t* n_ops, int32_t* n_lit, int32_t* out_lens, int32_t* status,
    unsigned int count, int n_threads, int promote_max) {
  parallel_for(count, n_threads, [&](uint32_t i) {
    n_ops[i] = 0;
    n_lit[i] = 0;
    out_lens[i] = 0;
    if (src_sizes[i] == 0) {
      status[i] = HAPN_BAD_FRAME;
      return;
    }
    status[i] = snappy_optable_one(
        src + src_offsets[i], src_sizes[i], expected_lens[i],
        ops + (size_t)i * ops_cap * 2, ops_cap, lit + (size_t)i * lit_cap,
        lit_cap, &n_ops[i], &n_lit[i], &out_lens[i], promote_max);
  });
  return HAPN_OK;
}
