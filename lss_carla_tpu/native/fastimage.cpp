// Native host-side image pipeline: JPEG decode + crop + ImageNet normalize.
//
// The TPU step consumes 6 cameras x batch images per ~14ms step; the Python
// loader (PIL decode -> crop -> numpy normalize) is the throughput ceiling.
// This fuses the three passes into one: libjpeg scanline decode directly
// into the cropped region, normalized into a float32 CHW plane, no
// intermediate RGB buffer for the full image.
//
// Only the non-augmented path runs here (resize==1, no flip/rotate — the
// SimBEV default config, reference train_simbev.py:31-35); augmented
// samples fall back to PIL in Python. Pixel parity with the PIL path is
// exact: both use libjpeg's default IDCT, and crop+normalize is the same
// arithmetic.
//
// Build: g++ -O3 -march=native -shared -fPIC fastimage.cpp -ljpeg -o libfastimage.so

#include <csetjmp>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

}  // namespace

extern "C" {

// Decode a JPEG from memory, crop [crop_x, crop_x+out_w) x [crop_y,
// crop_y+out_h), normalize with (mean, std) per channel, write float32 CHW
// into out (3 * out_h * out_w floats).
// Returns 0 on success, nonzero on error (bad jpeg, crop out of bounds).
int decode_crop_normalize(const unsigned char* data, long len,
                          int crop_x, int crop_y, int out_w, int out_h,
                          const float* mean, const float* inv_std,
                          float* out) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int W = cinfo.output_width;
  const int H = cinfo.output_height;
  if (crop_x < 0 || crop_y < 0 || crop_x + out_w > W || crop_y + out_h > H ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }

  unsigned char* row = new unsigned char[static_cast<size_t>(W) * 3];
  const long plane = static_cast<long>(out_h) * out_w;
  // skip rows above the crop cheaply
  if (crop_y > 0) {
    jpeg_skip_scanlines(&cinfo, crop_y);
  }
  for (int y = 0; y < out_h; ++y) {
    JSAMPROW rowptr = row;
    jpeg_read_scanlines(&cinfo, &rowptr, 1);
    const unsigned char* src = row + static_cast<size_t>(crop_x) * 3;
    float* r = out + static_cast<long>(y) * out_w;
    float* g = r + plane;
    float* b = g + plane;
    for (int x = 0; x < out_w; ++x) {
      r[x] = (src[3 * x + 0] * (1.0f / 255.0f) - mean[0]) * inv_std[0];
      g[x] = (src[3 * x + 1] * (1.0f / 255.0f) - mean[1]) * inv_std[1];
      b[x] = (src[3 * x + 2] * (1.0f / 255.0f) - mean[2]) * inv_std[2];
    }
  }
  delete[] row;
  jpeg_abort_decompress(&cinfo);  // we may not have read all scanlines
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode + crop only, uint8 CHW out (3 * out_h * out_w bytes) — for the
// normalize-on-device path (4x smaller host->device transfer).
int decode_crop_u8(const unsigned char* data, long len,
                   int crop_x, int crop_y, int out_w, int out_h,
                   unsigned char* out) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int W = cinfo.output_width;
  const int H = cinfo.output_height;
  if (crop_x < 0 || crop_y < 0 || crop_x + out_w > W || crop_y + out_h > H ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  unsigned char* row = new unsigned char[static_cast<size_t>(W) * 3];
  const long plane = static_cast<long>(out_h) * out_w;
  if (crop_y > 0) {
    jpeg_skip_scanlines(&cinfo, crop_y);
  }
  for (int y = 0; y < out_h; ++y) {
    JSAMPROW rowptr = row;
    jpeg_read_scanlines(&cinfo, &rowptr, 1);
    const unsigned char* src = row + static_cast<size_t>(crop_x) * 3;
    unsigned char* r = out + static_cast<long>(y) * out_w;
    unsigned char* g = r + plane;
    unsigned char* b = g + plane;
    for (int x = 0; x < out_w; ++x) {
      r[x] = src[3 * x + 0];
      g[x] = src[3 * x + 1];
      b[x] = src[3 * x + 2];
    }
  }
  delete[] row;
  jpeg_abort_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Probe the dimensions of a JPEG without full decode.
int jpeg_dims(const unsigned char* data, long len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
