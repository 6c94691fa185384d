// Native NIfTI-1 decode + fused host-side preprocessing.
//
// TPU-native counterpart of the reference's C++-backed data path (torch
// DataLoader workers + nibabel/SimpleITK C extensions).  The training
// host overlaps these with device compute (data/loader.py); on the weak
// single-core hosts that front TPU slices, gzip inflate + voxel remap in
// Python is the bottleneck, so the hot path lives here:
//
//   * jig_read_nifti     — .nii/.nii.gz -> float32 voxels with
//                          scl_slope/inter applied.  The file's Fortran
//                          (x-fastest) buffer IS the C-order (z, y, x)
//                          array the framework indexes, so no transpose
//   * jig_window_norm    — CT HU windowing into [0,1], in place
//   * jig_remap_labels   — TotalSegmentator id -> class id remap + tumor
//                          override (ccdm/datasets/ruijin.py:31-38,176)
//   * jig_one_hot        — label volume -> channels-last one-hot
//
// Exposed over a plain C ABI for ctypes (no pybind11 in this image).
// Python fallback: jointimagegeneration_tpu/data/nifti.py.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <zlib.h>

struct JigNiftiInfo {
  int32_t ndim;
  int64_t shape[8];     // header order (nx, ny, nz, ...); callers reverse
                        // for the C-order (z, y, x) array view
  float spacing[8];
  int32_t datatype;     // original NIfTI datatype code
  int32_t error;        // 0 ok, else error code
};

// ---------------------------------------------------------------------------
// IO helpers
// ---------------------------------------------------------------------------

static bool read_all_gz(const char* path, std::vector<uint8_t>& out) {
  gzFile f = gzopen(path, "rb");
  if (!f) return false;
  // large decode buffer: volumes are tens to hundreds of MB
  const size_t chunk = 8u << 20;
  size_t used = 0;
  for (;;) {
    out.resize(used + chunk);
    int n = gzread(f, out.data() + used, (unsigned)chunk);
    if (n < 0) { gzclose(f); return false; }
    used += (size_t)n;
    if ((size_t)n < chunk) break;
  }
  out.resize(used);
  gzclose(f);
  return true;
}

template <typename T>
static void convert_to_f32(const uint8_t* src, float* dst, int64_t n, float slope, float inter) {
  const T* s = reinterpret_cast<const T*>(src);
  if (slope == 1.0f && inter == 0.0f) {
    for (int64_t i = 0; i < n; ++i) dst[i] = (float)s[i];
  } else {
    for (int64_t i = 0; i < n; ++i) dst[i] = (float)s[i] * slope + inter;
  }
}

// ---------------------------------------------------------------------------
// jig_read_nifti: parse header, inflate, convert to f32.  The Fortran voxel
// stream is emitted as-is: reshaped C-order to the reversed dims it is the
// (z, y, x) array the Python side expects.  Caller provides `out` sized to
// the voxel count (query first with out == nullptr: fills info only).
// ---------------------------------------------------------------------------

extern "C" int32_t jig_read_nifti(const char* path, JigNiftiInfo* info, float* out) {
  std::vector<uint8_t> buf;
  if (!read_all_gz(path, buf)) { info->error = 1; return 1; }
  if (buf.size() < 352) { info->error = 2; return 2; }
  const uint8_t* h = buf.data();

  int32_t sizeof_hdr;
  memcpy(&sizeof_hdr, h, 4);
  if (sizeof_hdr != 348) { info->error = 3; return 3; }  // big-endian unsupported here

  int16_t dim[8];
  memcpy(dim, h + 40, 16);
  int ndim = dim[0];
  if (ndim < 1 || ndim > 7) { info->error = 4; return 4; }

  int16_t datatype;
  memcpy(&datatype, h + 70, 2);
  float pixdim[8];
  memcpy(pixdim, h + 76, 32);
  float vox_offset_f, scl_slope, scl_inter;
  memcpy(&vox_offset_f, h + 108, 4);
  memcpy(&scl_slope, h + 112, 4);
  memcpy(&scl_inter, h + 116, 4);
  if (scl_slope == 0.0f) scl_slope = 1.0f;
  size_t vox_offset = (size_t)vox_offset_f;

  int64_t n = 1;
  // expose shape/spacing in header order (nx, ny, nz); the ctypes wrapper
  // reverses shape so the buffer below views as the C-order (z, y, x) array
  for (int i = 0; i < ndim; ++i) {
    info->shape[i] = dim[1 + i];
    info->spacing[i] = pixdim[1 + i];
    n *= dim[1 + i];
  }
  info->ndim = ndim;
  info->datatype = datatype;
  info->error = 0;
  if (!out) return 0;  // header-only query

  if (buf.size() < vox_offset) { info->error = 5; return 5; }
  const uint8_t* data = h + vox_offset;

  // convert to f32 straight into `out`: the Fortran stream is already the
  // C-order buffer of the reversed-dims (z, y, x) array
  switch (datatype) {
    case 2:    convert_to_f32<uint8_t>(data, out, n, scl_slope, scl_inter); break;
    case 4:    convert_to_f32<int16_t>(data, out, n, scl_slope, scl_inter); break;
    case 8:    convert_to_f32<int32_t>(data, out, n, scl_slope, scl_inter); break;
    case 16:   convert_to_f32<float>(data, out, n, scl_slope, scl_inter); break;
    case 64:   convert_to_f32<double>(data, out, n, scl_slope, scl_inter); break;
    case 256:  convert_to_f32<int8_t>(data, out, n, scl_slope, scl_inter); break;
    case 512:  convert_to_f32<uint16_t>(data, out, n, scl_slope, scl_inter); break;
    case 768:  convert_to_f32<uint32_t>(data, out, n, scl_slope, scl_inter); break;
    case 1024: convert_to_f32<int64_t>(data, out, n, scl_slope, scl_inter); break;
    default: info->error = 6; return 6;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// fused preprocessing kernels
// ---------------------------------------------------------------------------

extern "C" void jig_window_norm(float* img, int64_t n, float window_pos, float window_width) {
  const float lo = window_pos - window_width * 0.5f;
  const float inv = 1.0f / window_width;
  for (int64_t i = 0; i < n; ++i) {
    float v = (img[i] - lo) * inv;
    img[i] = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
  }
}

// labels: float-decoded seg volume; designated: table of source ids
// mapped to 1..n_designated; tumor (optional, same length) overrides with
// tumor_class.  Writes int32 class ids.
extern "C" void jig_remap_labels(const float* seg, const float* tumor, int32_t* out, int64_t n,
                      const int32_t* designated, int32_t n_designated, int32_t tumor_class) {
  // build a small direct-lookup table (TotalSegmentator ids < 256)
  int32_t lut[256];
  memset(lut, 0, sizeof(lut));
  for (int32_t i = 0; i < n_designated; ++i) {
    int32_t id = designated[i];
    if (id >= 0 && id < 256) lut[id] = i + 1;
  }
  for (int64_t i = 0; i < n; ++i) {
    int32_t v = (int32_t)seg[i];
    out[i] = (v >= 0 && v < 256) ? lut[v] : 0;
  }
  if (tumor) {
    for (int64_t i = 0; i < n; ++i)
      if (tumor[i] > 0.f) out[i] = tumor_class;
  }
}

extern "C" void jig_one_hot(const int32_t* labels, float* out, int64_t n, int32_t num_classes) {
  memset(out, 0, sizeof(float) * (size_t)n * num_classes);
  for (int64_t i = 0; i < n; ++i) {
    int32_t c = labels[i];
    if (c < 0) c = 0;
    if (c >= num_classes) c = num_classes - 1;
    out[i * num_classes + c] = 1.0f;
  }
}

// ---------------------------------------------------------------------------
// jig_write_nifti: header build + gzip deflate, all native and GIL-free
// (ctypes releases the GIL for the call's duration, so the serving path's
// writer threads overlap volume writes with device compute).  Input is the
// C-order (..., z, y, x) array; its buffer is already the file's Fortran
// voxel order, so no transpose happens.  Mirrors the Python codec
// byte-for-byte
// (data/nifti.py:write_nifti): 348-byte header + 4-byte extension flag,
// vox_offset 352, scl 1/0, qform=sform=1 with diag(spacing) unless an
// explicit 3x4 sform is given.  Reference writes via SimpleITK
// (ccdm/ddpm/evaluator.py:141-148).
// ---------------------------------------------------------------------------

static int32_t jig_dtype_size(int32_t code) {
  switch (code) {
    case 2: case 256: return 1;
    case 4: case 512: return 2;
    case 8: case 16: case 768: return 4;
    case 64: case 1024: case 1280: return 8;
    default: return 0;
  }
}

// data: C-ordered voxels in the reader's (..., z, y, x) axis order (header
// dims are the reversed shape); affine12: row-major 3x4 sform rows or NULL;
// level: gzip 1..9 (.nii.gz only).
extern "C" int32_t jig_write_nifti(const char* path, const void* data,
                                   const int64_t* shape, int32_t ndim,
                                   int32_t datatype_code,
                                   const float* spacing, int32_t n_spacing,
                                   const float* affine12, int32_t level) {
  if (ndim < 1 || ndim > 7) return 1;
  const int32_t isz = jig_dtype_size(datatype_code);
  if (isz == 0) return 2;
  int64_t n = 1;
  for (int i = 0; i < ndim; ++i) n *= shape[i];
  if (n <= 0) return 3;

  // --- header (little-endian host assumed, as in jig_read_nifti) ---
  uint8_t hdr[352];
  memset(hdr, 0, sizeof(hdr));
  const int32_t sizeof_hdr = 348;
  memcpy(hdr, &sizeof_hdr, 4);
  int16_t dim[8] = {(int16_t)ndim, 1, 1, 1, 1, 1, 1, 1};
  // header dims are (nx, ny, nz, ...) = the reversed C shape
  for (int i = 0; i < ndim; ++i) dim[1 + i] = (int16_t)shape[ndim - 1 - i];
  memcpy(hdr + 40, dim, 16);
  const int16_t dt16 = (int16_t)datatype_code;
  memcpy(hdr + 70, &dt16, 2);
  const int16_t bitpix = (int16_t)(isz * 8);
  memcpy(hdr + 72, &bitpix, 2);
  float pixdim[8] = {1.f, 1.f, 1.f, 1.f, 1.f, 1.f, 1.f, 1.f};
  for (int i = 0; i < n_spacing && i < 7; ++i) pixdim[1 + i] = spacing[i];
  memcpy(hdr + 76, pixdim, 32);
  const float vox_offset = 352.f, slope = 1.f, inter = 0.f;
  memcpy(hdr + 108, &vox_offset, 4);
  memcpy(hdr + 112, &slope, 4);
  memcpy(hdr + 116, &inter, 4);
  const int16_t one16 = 1;
  memcpy(hdr + 252, &one16, 2);  // qform_code
  memcpy(hdr + 254, &one16, 2);  // sform_code
  float srow[12];
  if (affine12) {
    memcpy(srow, affine12, sizeof(srow));
  } else {
    memset(srow, 0, sizeof(srow));
    for (int i = 0; i < 3; ++i)
      srow[i * 4 + i] = (i < n_spacing && spacing) ? spacing[i] : 1.f;
  }
  memcpy(hdr + 280, srow, sizeof(srow));
  memcpy(hdr + 344, "n+1\x00", 4);

  // the C-order (..., z, y, x) buffer is the Fortran voxel stream verbatim
  const uint8_t* payload = (const uint8_t*)data;
  const size_t payload_size = (size_t)n * isz;

  // --- write (.gz by suffix) ---
  const size_t plen = strlen(path);
  const bool gz = plen > 3 && strcmp(path + plen - 3, ".gz") == 0;
  if (gz) {
    char mode[4] = {'w', 'b', (char)('0' + (level < 1 ? 1 : level > 9 ? 9 : level)), 0};
    gzFile f = gzopen(path, mode);
    if (!f) return 4;
    if (gzwrite(f, hdr, 352) != 352) { gzclose(f); return 5; }
    size_t off = 0;
    const size_t chunk = 8u << 20;
    while (off < payload_size) {
      unsigned m = (unsigned)(payload_size - off < chunk ? payload_size - off : chunk);
      if (gzwrite(f, payload + off, m) != (int)m) { gzclose(f); return 5; }
      off += m;
    }
    if (gzclose(f) != Z_OK) return 5;
  } else {
    FILE* f = fopen(path, "wb");
    if (!f) return 4;
    if (fwrite(hdr, 1, 352, f) != 352 ||
        fwrite(payload, 1, payload_size, f) != payload_size) {
      fclose(f);
      return 5;
    }
    if (fclose(f) != 0) return 5;
  }
  return 0;
}
