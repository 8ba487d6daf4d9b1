// Native TFRecord reader: framing, CRC32C verification, and Example-proto
// field extraction, exposed through a C ABI for ctypes.
//
// This is the runtime analog of the reference's data path, which leans on
// TensorFlow's C++ TFRecordDataset kernels (reference:
// datasets/codes/dataset.py:126-135 parallel_interleave over
// TFRecordDataset).  The Python codec in data/tfrecord.py stays as the
// portable fallback and the writer; this reader is the hot path for
// training-time ingestion (thousands of single-record files per epoch).
//
// Build: see native/Makefile (produces libtfrecord_reader.so).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ----------------------------------------------------------------- crc32c
uint32_t kCrcTable[256];
bool InitTables() {
  const uint32_t poly = 0x82F63B78u;
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int k = 0; k < 8; ++k) crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    kCrcTable[i] = crc;
  }
  return true;
}
const bool kInit = InitTables();

uint32_t Crc32c(const uint8_t* data, size_t n) {
  uint32_t crc = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i)
    crc = kCrcTable[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

uint32_t MaskedCrc(const uint8_t* data, size_t n) {
  uint32_t crc = Crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

// --------------------------------------------------------------- protobuf
bool ReadVarint(const uint8_t* buf, size_t len, size_t* pos, uint64_t* out) {
  uint64_t result = 0;
  int shift = 0;
  while (*pos < len && shift < 64) {
    uint8_t b = buf[(*pos)++];
    result |= static_cast<uint64_t>(b & 0x7F) << shift;
    if (!(b & 0x80)) {
      *out = result;
      return true;
    }
    shift += 7;
  }
  return false;
}

struct Field {
  std::string name;
  int kind;  // 0 bytes, 1 float, 2 int64
  std::vector<std::string> bytes_values;
  std::vector<float> float_values;
  std::vector<int64_t> int64_values;
};

bool ParseFeature(const uint8_t* buf, size_t len, Field* field) {
  size_t pos = 0;
  while (pos < len) {
    uint64_t tag;
    if (!ReadVarint(buf, len, &pos, &tag)) return false;
    if ((tag & 7) != 2) return false;
    uint64_t sub_len;
    if (!ReadVarint(buf, len, &pos, &sub_len)) return false;
    const uint8_t* inner = buf + pos;
    size_t ilen = sub_len;
    pos += sub_len;
    int f = static_cast<int>(tag >> 3);
    size_t ipos = 0;
    if (f == 1) {  // BytesList
      field->kind = 0;
      while (ipos < ilen) {
        uint64_t itag, blen;
        if (!ReadVarint(inner, ilen, &ipos, &itag)) return false;
        if (!ReadVarint(inner, ilen, &ipos, &blen)) return false;
        field->bytes_values.emplace_back(
            reinterpret_cast<const char*>(inner + ipos), blen);
        ipos += blen;
      }
    } else if (f == 2) {  // FloatList
      field->kind = 1;
      while (ipos < ilen) {
        uint64_t itag;
        if (!ReadVarint(inner, ilen, &ipos, &itag)) return false;
        if ((itag & 7) == 2) {  // packed
          uint64_t plen;
          if (!ReadVarint(inner, ilen, &ipos, &plen)) return false;
          for (size_t j = 0; j + 4 <= plen; j += 4) {
            float v;
            memcpy(&v, inner + ipos + j, 4);
            field->float_values.push_back(v);
          }
          ipos += plen;
        } else {
          float v;
          memcpy(&v, inner + ipos, 4);
          field->float_values.push_back(v);
          ipos += 4;
        }
      }
    } else if (f == 3) {  // Int64List
      field->kind = 2;
      while (ipos < ilen) {
        uint64_t itag;
        if (!ReadVarint(inner, ilen, &ipos, &itag)) return false;
        if ((itag & 7) == 2) {  // packed
          uint64_t plen;
          if (!ReadVarint(inner, ilen, &ipos, &plen)) return false;
          size_t end = ipos + plen;
          while (ipos < end) {
            uint64_t v;
            if (!ReadVarint(inner, ilen, &ipos, &v)) return false;
            field->int64_values.push_back(static_cast<int64_t>(v));
          }
        } else {
          uint64_t v;
          if (!ReadVarint(inner, ilen, &ipos, &v)) return false;
          field->int64_values.push_back(static_cast<int64_t>(v));
        }
      }
    }
  }
  return true;
}

struct Example {
  std::vector<Field> fields;
};

bool ParseExample(const uint8_t* buf, size_t len, Example* example) {
  size_t pos = 0;
  while (pos < len) {
    uint64_t tag;
    if (!ReadVarint(buf, len, &pos, &tag)) return false;
    if ((tag & 7) != 2) return false;
    uint64_t mlen;
    if (!ReadVarint(buf, len, &pos, &mlen)) return false;
    const uint8_t* msg = buf + pos;
    size_t msize = mlen;
    pos += mlen;
    if ((tag >> 3) != 1) continue;  // not Example.features
    size_t mpos = 0;
    while (mpos < msize) {
      uint64_t mtag, elen;
      if (!ReadVarint(msg, msize, &mpos, &mtag)) return false;
      if (!ReadVarint(msg, msize, &mpos, &elen)) return false;
      const uint8_t* entry = msg + mpos;
      size_t esize = elen;
      mpos += elen;
      Field field;
      size_t epos = 0;
      while (epos < esize) {
        uint64_t etag, dlen;
        if (!ReadVarint(entry, esize, &epos, &etag)) return false;
        if (!ReadVarint(entry, esize, &epos, &dlen)) return false;
        const uint8_t* data = entry + epos;
        epos += dlen;
        if ((etag >> 3) == 1) {
          field.name.assign(reinterpret_cast<const char*>(data), dlen);
        } else if ((etag >> 3) == 2) {
          if (!ParseFeature(data, dlen, &field)) return false;
        }
      }
      example->fields.push_back(std::move(field));
    }
  }
  return true;
}

struct Reader {
  std::vector<Example> examples;
  std::string error;
};

}  // namespace

extern "C" {

// Opens a TFRecord file, verifies CRCs, parses every Example.
// Returns an opaque handle or nullptr on failure.
void* tfr_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* reader = new Reader();
  std::vector<uint8_t> payload;
  for (;;) {
    uint8_t header[8];
    size_t n = fread(header, 1, 8, f);
    if (n == 0) break;
    if (n < 8) {
      reader->error = "truncated header";
      break;
    }
    uint32_t hcrc;
    if (fread(&hcrc, 1, 4, f) != 4 || MaskedCrc(header, 8) != hcrc) {
      reader->error = "bad header crc";
      break;
    }
    uint64_t length;
    memcpy(&length, header, 8);
    payload.resize(length);
    if (fread(payload.data(), 1, length, f) != length) {
      reader->error = "truncated payload";
      break;
    }
    uint32_t pcrc;
    if (fread(&pcrc, 1, 4, f) != 4 ||
        MaskedCrc(payload.data(), length) != pcrc) {
      reader->error = "bad payload crc";
      break;
    }
    Example example;
    if (!ParseExample(payload.data(), length, &example)) {
      reader->error = "bad example proto";
      break;
    }
    reader->examples.push_back(std::move(example));
  }
  fclose(f);
  if (!reader->error.empty()) {
    delete reader;
    return nullptr;
  }
  return reader;
}

void tfr_close(void* handle) { delete static_cast<Reader*>(handle); }

int tfr_num_examples(void* handle) {
  return static_cast<int>(static_cast<Reader*>(handle)->examples.size());
}

int tfr_num_fields(void* handle, int example) {
  auto* r = static_cast<Reader*>(handle);
  return static_cast<int>(r->examples[example].fields.size());
}

const char* tfr_field_name(void* handle, int example, int field) {
  auto* r = static_cast<Reader*>(handle);
  return r->examples[example].fields[field].name.c_str();
}

// 0 bytes, 1 float, 2 int64
int tfr_field_kind(void* handle, int example, int field) {
  auto* r = static_cast<Reader*>(handle);
  return r->examples[example].fields[field].kind;
}

int tfr_field_count(void* handle, int example, int field) {
  auto* r = static_cast<Reader*>(handle);
  const Field& fl = r->examples[example].fields[field];
  switch (fl.kind) {
    case 0: return static_cast<int>(fl.bytes_values.size());
    case 1: return static_cast<int>(fl.float_values.size());
    default: return static_cast<int>(fl.int64_values.size());
  }
}

// bytes value accessors (per index)
int64_t tfr_bytes_len(void* handle, int example, int field, int idx) {
  auto* r = static_cast<Reader*>(handle);
  return static_cast<int64_t>(
      r->examples[example].fields[field].bytes_values[idx].size());
}

const uint8_t* tfr_bytes_data(void* handle, int example, int field, int idx) {
  auto* r = static_cast<Reader*>(handle);
  return reinterpret_cast<const uint8_t*>(
      r->examples[example].fields[field].bytes_values[idx].data());
}

const float* tfr_float_data(void* handle, int example, int field) {
  auto* r = static_cast<Reader*>(handle);
  return r->examples[example].fields[field].float_values.data();
}

const int64_t* tfr_int64_data(void* handle, int example, int field) {
  auto* r = static_cast<Reader*>(handle);
  return r->examples[example].fields[field].int64_values.data();
}

// Convenience: crc32c for testing the table against the Python impl.
uint32_t tfr_crc32c(const uint8_t* data, int64_t n) {
  return Crc32c(data, static_cast<size_t>(n));
}

}  // extern "C"
