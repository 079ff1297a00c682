// Fast GGUF v3 loader: mmap parse + parallel Q8_0/Q4_0/F16 dequantization.
//
// The Python GGUFReader (magpie_tts_tpu/io/gguf.py) is the always-available
// fallback; this library accelerates the load of the ~858 MB f32 checkpoint by
// parsing the tensor table natively and dequantizing blocks with OpenMP-less
// threads. Exposed via a minimal C ABI consumed through ctypes
// (magpie_tts_tpu/io/native.py).
//
// GGUF layout per the reference converter (scripts/convert_magpie_to_gguf.py):
// "GGUF" magic, u32 version=3, i64 n_tensors, i64 n_kv, KV pairs, tensor infos
// (u64-len name, u32 n_dims, i64 dims (innermost first), i32 type, u64 offset),
// data section aligned to 32 bytes.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <functional>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x46554747;  // "GGUF" little-endian
constexpr int kAlignment = 32;

enum GgmlType : int32_t {
  GGML_F32 = 0,
  GGML_F16 = 1,
  GGML_Q4_0 = 2,
  GGML_Q8_0 = 8,
  GGML_I32 = 26,
};

enum GgufValueType : int32_t {
  T_UINT8 = 0, T_INT8 = 1, T_UINT16 = 2, T_INT16 = 3,
  T_UINT32 = 4, T_INT32 = 5, T_FLOAT32 = 6, T_BOOL = 7,
  T_STRING = 8, T_ARRAY = 9, T_UINT64 = 10, T_INT64 = 11, T_FLOAT64 = 12,
};

struct TensorInfo {
  std::string name;
  int32_t n_dims = 0;
  int64_t dims[4] = {1, 1, 1, 1};  // numpy order (outermost first)
  int32_t type = GGML_F32;
  uint64_t offset = 0;  // relative to data section
  int64_t n_elements = 1;
};

struct KvEntry {
  std::string key;
  int32_t type;
  // scalars stored in raw; strings in str
  double num = 0.0;
  std::string str;
};

struct Reader {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  size_t data_start = 0;
  std::vector<TensorInfo> tensors;
  std::vector<KvEntry> kv;
  std::string error;
};

float f16_to_f32(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t mant = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;
    } else {
      // subnormal: normalize
      int shift = 0;
      while (!(mant & 0x400)) { mant <<= 1; shift++; }
      mant &= 0x3FF;
      bits = sign | ((127 - 15 - shift) << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000 | (mant << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float out;
  std::memcpy(&out, &bits, sizeof(out));
  return out;
}

class Cursor {
 public:
  Cursor(const uint8_t* base, size_t size) : base_(base), size_(size) {}
  bool ok() const { return ok_; }
  size_t pos() const { return pos_; }

  template <typename T>
  T read() {
    T v{};
    if (pos_ + sizeof(T) > size_) { ok_ = false; return v; }
    std::memcpy(&v, base_ + pos_, sizeof(T));
    pos_ += sizeof(T);
    return v;
  }

  std::string read_string() {
    uint64_t n = read<uint64_t>();
    if (!ok_ || pos_ + n > size_) { ok_ = false; return {}; }
    std::string s(reinterpret_cast<const char*>(base_ + pos_), n);
    pos_ += n;
    return s;
  }

  void skip(size_t n) {
    if (pos_ + n > size_) { ok_ = false; return; }
    pos_ += n;
  }

 private:
  const uint8_t* base_;
  size_t size_;
  size_t pos_ = 0;
  bool ok_ = true;
};

bool read_value(Cursor& c, int32_t type, KvEntry* out) {
  switch (type) {
    case T_UINT8: out->num = c.read<uint8_t>(); return c.ok();
    case T_INT8: out->num = c.read<int8_t>(); return c.ok();
    case T_UINT16: out->num = c.read<uint16_t>(); return c.ok();
    case T_INT16: out->num = c.read<int16_t>(); return c.ok();
    case T_UINT32: out->num = c.read<uint32_t>(); return c.ok();
    case T_INT32: out->num = c.read<int32_t>(); return c.ok();
    case T_FLOAT32: out->num = c.read<float>(); return c.ok();
    case T_BOOL: out->num = c.read<uint8_t>() != 0; return c.ok();
    case T_UINT64: out->num = (double)c.read<uint64_t>(); return c.ok();
    case T_INT64: out->num = (double)c.read<int64_t>(); return c.ok();
    case T_FLOAT64: out->num = c.read<double>(); return c.ok();
    case T_STRING: out->str = c.read_string(); return c.ok();
    case T_ARRAY: {
      int32_t elem_type = c.read<int32_t>();
      uint64_t count = c.read<uint64_t>();
      KvEntry scratch;
      for (uint64_t i = 0; i < count && c.ok(); i++) {
        if (!read_value(c, elem_type, &scratch)) return false;
      }
      return c.ok();  // arrays parsed but not surfaced (unused by our models)
    }
    default:
      return false;
  }
}

int64_t type_nbytes(int32_t type, int64_t n_elements) {
  switch (type) {
    case GGML_F32: case GGML_I32: return n_elements * 4;
    case GGML_F16: return n_elements * 2;
    case GGML_Q8_0: return (n_elements / 32) * 34;
    case GGML_Q4_0: return (n_elements / 32) * 18;
    default: return -1;
  }
}

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int n_threads = (int)std::min<int64_t>(hw ? hw : 4, std::max<int64_t>(1, n / 4096));
  if (n_threads <= 1) { fn(0, n); return; }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([&fn, lo, hi] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Open + parse a GGUF file. Returns an opaque handle or nullptr.
void* gguf_open(const char* path) {
  auto r = new Reader();
  r->fd = ::open(path, O_RDONLY);
  if (r->fd < 0) { delete r; return nullptr; }
  struct stat st;
  if (fstat(r->fd, &st) != 0) { ::close(r->fd); delete r; return nullptr; }
  r->size = (size_t)st.st_size;
  void* mapped = mmap(nullptr, r->size, PROT_READ, MAP_PRIVATE, r->fd, 0);
  if (mapped == MAP_FAILED) { ::close(r->fd); delete r; return nullptr; }
  r->base = static_cast<const uint8_t*>(mapped);

  Cursor c(r->base, r->size);
  if (c.read<uint32_t>() != kMagic || c.read<uint32_t>() != 3) {
    munmap((void*)r->base, r->size); ::close(r->fd); delete r; return nullptr;
  }
  int64_t n_tensors = c.read<int64_t>();
  int64_t n_kv = c.read<int64_t>();

  for (int64_t i = 0; i < n_kv && c.ok(); i++) {
    KvEntry e;
    e.key = c.read_string();
    e.type = c.read<int32_t>();
    if (!read_value(c, e.type, &e)) { c = Cursor(r->base, 0); break; }
    r->kv.push_back(std::move(e));
  }

  for (int64_t i = 0; i < n_tensors && c.ok(); i++) {
    TensorInfo info;
    info.name = c.read_string();
    info.n_dims = (int32_t)c.read<uint32_t>();
    if (info.n_dims > 4) { c = Cursor(r->base, 0); break; }
    int64_t rev[4] = {1, 1, 1, 1};
    for (int d = 0; d < info.n_dims; d++) rev[d] = c.read<int64_t>();
    for (int d = 0; d < info.n_dims; d++) info.dims[d] = rev[info.n_dims - 1 - d];
    info.type = c.read<int32_t>();
    info.offset = c.read<uint64_t>();
    info.n_elements = 1;
    for (int d = 0; d < info.n_dims; d++) info.n_elements *= info.dims[d];
    r->tensors.push_back(std::move(info));
  }

  if (!c.ok()) {
    munmap((void*)r->base, r->size); ::close(r->fd); delete r; return nullptr;
  }
  r->data_start = (c.pos() + kAlignment - 1) / kAlignment * kAlignment;
  return r;
}

void gguf_close(void* handle) {
  auto r = static_cast<Reader*>(handle);
  if (!r) return;
  if (r->base) munmap((void*)r->base, r->size);
  if (r->fd >= 0) ::close(r->fd);
  delete r;
}

int64_t gguf_n_tensors(void* handle) {
  return static_cast<Reader*>(handle)->tensors.size();
}

// Tensor metadata accessors (index-based).
const char* gguf_tensor_name(void* handle, int64_t idx) {
  return static_cast<Reader*>(handle)->tensors[idx].name.c_str();
}
int32_t gguf_tensor_ndims(void* handle, int64_t idx) {
  return static_cast<Reader*>(handle)->tensors[idx].n_dims;
}
void gguf_tensor_dims(void* handle, int64_t idx, int64_t* out4) {
  auto& t = static_cast<Reader*>(handle)->tensors[idx];
  for (int d = 0; d < 4; d++) out4[d] = t.dims[d];
}
int32_t gguf_tensor_type(void* handle, int64_t idx) {
  return static_cast<Reader*>(handle)->tensors[idx].type;
}
int64_t gguf_tensor_nelements(void* handle, int64_t idx) {
  return static_cast<Reader*>(handle)->tensors[idx].n_elements;
}

// Metadata accessors.
int64_t gguf_n_kv(void* handle) {
  return static_cast<Reader*>(handle)->kv.size();
}
const char* gguf_kv_key(void* handle, int64_t idx) {
  return static_cast<Reader*>(handle)->kv[idx].key.c_str();
}
int32_t gguf_kv_type(void* handle, int64_t idx) {
  return static_cast<Reader*>(handle)->kv[idx].type;
}
double gguf_kv_num(void* handle, int64_t idx) {
  return static_cast<Reader*>(handle)->kv[idx].num;
}
const char* gguf_kv_str(void* handle, int64_t idx) {
  return static_cast<Reader*>(handle)->kv[idx].str.c_str();
}

// Stored byte size of tensor `idx` (quantized tensors: the block payload
// size), or -1 on bad index/type.
int64_t gguf_tensor_nbytes(void* handle, int64_t idx) {
  auto r = static_cast<Reader*>(handle);
  if (idx < 0 || idx >= (int64_t)r->tensors.size()) return -1;
  auto& t = r->tensors[idx];
  return type_nbytes(t.type, t.n_elements);
}

// Copy tensor `idx`'s RAW stored bytes (no dequant — Q8_0 blocks stay
// blocks) into `out` (caller allocates gguf_tensor_nbytes). Returns 0 on
// success. Used by the Q8_0-native serving path, which streams the file's
// own blocks to the device instead of dequantizing at load.
int gguf_tensor_read_raw(void* handle, int64_t idx, uint8_t* out) {
  auto r = static_cast<Reader*>(handle);
  if (idx < 0 || idx >= (int64_t)r->tensors.size()) return 1;
  auto& t = r->tensors[idx];
  int64_t nbytes = type_nbytes(t.type, t.n_elements);
  if (nbytes < 0) return 2;
  if (r->data_start + t.offset + nbytes > r->size) return 3;
  std::memcpy(out, r->base + r->data_start + t.offset, nbytes);
  return 0;
}

// Copy tensor `idx` into `out` as float32 (dequantizing), or int32 for I32
// tensors (caller allocates n_elements * 4 bytes). Returns 0 on success.
int gguf_tensor_read_f32(void* handle, int64_t idx, float* out) {
  auto r = static_cast<Reader*>(handle);
  if (idx < 0 || idx >= (int64_t)r->tensors.size()) return 1;
  auto& t = r->tensors[idx];
  int64_t nbytes = type_nbytes(t.type, t.n_elements);
  if (nbytes < 0) return 2;
  if (r->data_start + t.offset + nbytes > r->size) return 3;
  const uint8_t* src = r->base + r->data_start + t.offset;

  switch (t.type) {
    case GGML_F32:
    case GGML_I32:
      std::memcpy(out, src, t.n_elements * 4);
      return 0;
    case GGML_F16: {
      const uint16_t* h = reinterpret_cast<const uint16_t*>(src);
      parallel_for(t.n_elements, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) out[i] = f16_to_f32(h[i]);
      });
      return 0;
    }
    case GGML_Q8_0: {
      int64_t n_blocks = t.n_elements / 32;
      parallel_for(n_blocks, [&](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; b++) {
          const uint8_t* blk = src + b * 34;
          uint16_t h;
          std::memcpy(&h, blk, 2);
          float scale = f16_to_f32(h);
          const int8_t* q = reinterpret_cast<const int8_t*>(blk + 2);
          float* dst = out + b * 32;
          for (int i = 0; i < 32; i++) dst[i] = q[i] * scale;
        }
      });
      return 0;
    }
    case GGML_Q4_0: {
      int64_t n_blocks = t.n_elements / 32;
      parallel_for(n_blocks, [&](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; b++) {
          const uint8_t* blk = src + b * 18;
          uint16_t h;
          std::memcpy(&h, blk, 2);
          float scale = f16_to_f32(h);
          const uint8_t* q = blk + 2;
          float* dst = out + b * 32;
          for (int i = 0; i < 16; i++) {
            dst[i] = ((int)(q[i] & 0x0F) - 8) * scale;
            dst[i + 16] = ((int)(q[i] >> 4) - 8) * scale;
          }
        }
      });
      return 0;
    }
    default:
      return 2;
  }
}

}  // extern "C"
