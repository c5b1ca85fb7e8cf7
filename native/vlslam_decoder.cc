// Native vlslam wire-format decoder.
//
// C++ fast path for bulk sequence ingest (reference parity:
// src/dataloader.cpp uses protobuf-generated C++ parsing; here the proto2
// wire format for protocols/vlslam.proto is decoded directly — no protobuf
// dependency — straight into packed struct-of-arrays buffers shaped for
// jax.device_put). Exposed as a C ABI for ctypes.
//
// Two-phase API (caller allocates):
//   vlslam_dataset_dims(buf, len, &num_packets, &max_features)
//   vlslam_decode_dataset(buf, len, F, ts, gwc, wg, ids, status, xp, xw,
//                         feat_count)
//   vlslam_edgemap_dims(buf, len, &rows, &cols)
//   vlslam_decode_edgemap(buf, len, out, capacity)
//
// Build: make -C native  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint64_t varint() {
    uint64_t v = 0;
    int shift = 0;
    while (p < end && shift < 70) {
      uint8_t b = *p++;
      v |= static_cast<uint64_t>(b & 0x7F) << shift;
      if (!(b & 0x80)) return v;
      shift += 7;
    }
    ok = false;
    return 0;
  }

  double f64() {
    if (end - p < 8) { ok = false; return 0.0; }
    double v;
    std::memcpy(&v, p, 8);
    p += 8;
    return v;
  }

  float f32() {
    if (end - p < 4) { ok = false; return 0.0f; }
    float v;
    std::memcpy(&v, p, 4);
    p += 4;
    return v;
  }

  Cursor sub() {
    uint64_t len = varint();
    if (!ok || static_cast<uint64_t>(end - p) < len) {
      ok = false;
      return {p, p};
    }
    Cursor c{p, p + len};
    p += len;
    return c;
  }

  void skip(int wiretype) {
    switch (wiretype) {
      case 0: varint(); break;
      case 1: p += 8; break;
      case 2: { uint64_t n = varint(); p += n; break; }
      case 5: p += 4; break;
      default: ok = false;
    }
    if (p > end) ok = false;
  }
};

// Count features in one packet submessage without materializing.
int count_features(Cursor c) {
  int n = 0;
  while (c.ok && c.p < c.end) {
    uint64_t key = c.varint();
    int field = static_cast<int>(key >> 3), wt = static_cast<int>(key & 7);
    if (field == 3 && wt == 2) { c.sub(); ++n; }
    else c.skip(wt);
  }
  return n;
}

struct FeatureOut {
  int64_t id = -1;
  int32_t status = 0;
  double xp[2] = {0, 0};
  double xw[3] = {0, 0, 0};
};

void decode_feature(Cursor c, FeatureOut* f) {
  int nxp = 0, nxw = 0;
  while (c.ok && c.p < c.end) {
    uint64_t key = c.varint();
    int field = static_cast<int>(key >> 3), wt = static_cast<int>(key & 7);
    if (field == 1 && wt == 0) f->id = static_cast<int64_t>(c.varint());
    else if (field == 2 && wt == 0) f->status = static_cast<int32_t>(c.varint());
    else if (field == 3 && wt == 1) { double v = c.f64(); if (nxp < 2) f->xp[nxp++] = v; }
    else if (field == 4 && wt == 1) { double v = c.f64(); if (nxw < 3) f->xw[nxw++] = v; }
    else c.skip(wt);
  }
}

}  // namespace

extern "C" {

// Returns 0 on success.
int vlslam_dataset_dims(const uint8_t* buf, uint64_t len,
                        int64_t* num_packets, int64_t* max_features) {
  Cursor c{buf, buf + len};
  int64_t n = 0, maxf = 0;
  while (c.ok && c.p < c.end) {
    uint64_t key = c.varint();
    int field = static_cast<int>(key >> 3), wt = static_cast<int>(key & 7);
    if (field == 3 && wt == 2) {
      Cursor pc = c.sub();
      ++n;
      int f = count_features(pc);
      if (f > maxf) maxf = f;
    } else {
      c.skip(wt);
    }
  }
  if (!c.ok) return 1;
  *num_packets = n;
  *max_features = maxf;
  return 0;
}

// Arrays: ts (N), gwc (N*12), wg (N*2), ids (N*F), status (N*F),
// xp (N*F*2), xw (N*F*3), feat_count (N). ids prefilled handled here (-1).
int vlslam_decode_dataset(const uint8_t* buf, uint64_t len, int64_t F,
                          double* ts, float* gwc, float* wg, int64_t* ids,
                          int32_t* status, float* xp, float* xw,
                          int32_t* feat_count) {
  Cursor c{buf, buf + len};
  int64_t pi = 0;
  while (c.ok && c.p < c.end) {
    uint64_t key = c.varint();
    int field = static_cast<int>(key >> 3), wt = static_cast<int>(key & 7);
    if (field == 3 && wt == 2) {
      Cursor pc = c.sub();
      double* g = nullptr;  // packet-local
      int ngwc = 0, nwg = 0;
      int64_t fi = 0;
      for (int64_t k = 0; k < F; ++k) ids[pi * F + k] = -1;
      while (pc.ok && pc.p < pc.end) {
        uint64_t k2 = pc.varint();
        int f2 = static_cast<int>(k2 >> 3), w2 = static_cast<int>(k2 & 7);
        if (f2 == 1 && w2 == 1) ts[pi] = pc.f64();
        else if (f2 == 2 && w2 == 1) {
          double v = pc.f64();
          if (ngwc < 12) gwc[pi * 12 + ngwc++] = static_cast<float>(v);
        } else if (f2 == 4 && w2 == 1) {
          double v = pc.f64();
          if (nwg < 2) wg[pi * 2 + nwg++] = static_cast<float>(v);
        } else if (f2 == 3 && w2 == 2) {
          Cursor fc = pc.sub();
          if (fi < F) {
            FeatureOut fo;
            decode_feature(fc, &fo);
            ids[pi * F + fi] = fo.id;
            status[pi * F + fi] = fo.status;
            xp[(pi * F + fi) * 2 + 0] = static_cast<float>(fo.xp[0]);
            xp[(pi * F + fi) * 2 + 1] = static_cast<float>(fo.xp[1]);
            xw[(pi * F + fi) * 3 + 0] = static_cast<float>(fo.xw[0]);
            xw[(pi * F + fi) * 3 + 1] = static_cast<float>(fo.xw[1]);
            xw[(pi * F + fi) * 3 + 2] = static_cast<float>(fo.xw[2]);
            ++fi;
          }
        } else {
          pc.skip(w2);
        }
      }
      feat_count[pi] = static_cast<int32_t>(fi);
      (void)g;
      ++pi;
    } else {
      c.skip(wt);
    }
  }
  return c.ok ? 0 : 1;
}

int vlslam_edgemap_dims(const uint8_t* buf, uint64_t len, int64_t* rows,
                        int64_t* cols) {
  Cursor c{buf, buf + len};
  *rows = 0;
  *cols = 0;
  while (c.ok && c.p < c.end) {
    uint64_t key = c.varint();
    int field = static_cast<int>(key >> 3), wt = static_cast<int>(key & 7);
    if (field == 2 && wt == 0) *rows = static_cast<int64_t>(c.varint());
    else if (field == 3 && wt == 0) *cols = static_cast<int64_t>(c.varint());
    else c.skip(wt);
  }
  return c.ok ? 0 : 1;
}

int vlslam_decode_edgemap(const uint8_t* buf, uint64_t len, float* out,
                          int64_t capacity) {
  Cursor c{buf, buf + len};
  int64_t n = 0;
  while (c.ok && c.p < c.end) {
    uint64_t key = c.varint();
    int field = static_cast<int>(key >> 3), wt = static_cast<int>(key & 7);
    if (field == 4 && wt == 5) {
      // unpacked float run: decode this one + peek-loop the rest
      if (n < capacity) out[n++] = c.f32(); else c.skip(5);
      while (c.p < c.end && *c.p == static_cast<uint8_t>(key) && key < 0x80) {
        ++c.p;
        if (n < capacity) out[n++] = c.f32(); else c.skip(5);
      }
    } else if (field == 4 && wt == 2) {
      // packed floats
      Cursor pc = c.sub();
      while (pc.ok && pc.p + 4 <= pc.end && n < capacity) out[n++] = pc.f32();
    } else {
      c.skip(wt);
    }
  }
  return c.ok ? 0 : 1;
}

}  // extern "C"
