// yolodata: native host-side data pipeline kernels for the YOLOv4-TPU
// framework.
//
// The reference delegates its host hot loops to OpenCV's C++ resize
// (reference utils.py:195) and runs GT label encoding as a Python double
// loop over batch x boxes (reference utils.py:256-294 — its slowest host
// code).  On a TPU host the input pipeline must feed thousands of images
// per second (SURVEY hard part #4), so both live here as native code:
//
//   - resize_bilinear_batch: u8 HWC -> f32 stretch-resize + /255 normalise,
//     OpenMP-parallel across the batch;
//   - encode_labels_batch: boxes -> 3 anchor-assigned label grids + xywh,
//     byte-identical to the numpy/python reference semantics;
//   - assemble_batch: fused resize + normalise + box-rescale for a whole
//     batch in one call (one GIL release per batch from Python).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Bilinear stretch-resize u8 -> f32 (+ /255), cv2-compatible sampling:
// src_x = (dst_x + 0.5) * (src_w / dst_w) - 0.5, edge-clamped.
// src: (sh, sw, 3) uint8; dst: (dh, dw, 3) float32.
// ---------------------------------------------------------------------------
static void resize_one(const uint8_t* src, int sh, int sw, float* dst, int dh,
                       int dw) {
  const float sx = (float)sw / (float)dw;
  const float sy = (float)sh / (float)dh;
  for (int y = 0; y < dh; ++y) {
    float fy = ((float)y + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - (float)y0;
    int y1 = y0 + 1;
    y0 = std::min(std::max(y0, 0), sh - 1);
    y1 = std::min(std::max(y1, 0), sh - 1);
    const uint8_t* row0 = src + (size_t)y0 * sw * 3;
    const uint8_t* row1 = src + (size_t)y1 * sw * 3;
    float* out = dst + (size_t)y * dw * 3;
    for (int x = 0; x < dw; ++x) {
      float fx = ((float)x + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - (float)x0;
      int x1 = x0 + 1;
      x0 = std::min(std::max(x0, 0), sw - 1);
      x1 = std::min(std::max(x1, 0), sw - 1);
      const float w00 = (1.0f - wy) * (1.0f - wx);
      const float w01 = (1.0f - wy) * wx;
      const float w10 = wy * (1.0f - wx);
      const float w11 = wy * wx;
      for (int c = 0; c < 3; ++c) {
        float v = w00 * row0[x0 * 3 + c] + w01 * row0[x1 * 3 + c] +
                  w10 * row1[x0 * 3 + c] + w11 * row1[x1 * 3 + c];
        out[x * 3 + c] = v * (1.0f / 255.0f);
      }
    }
  }
}

void resize_bilinear_batch(const uint8_t* const* srcs, const int* src_hw,
                           float* dst, int batch, int dh, int dw) {
#pragma omp parallel for schedule(dynamic)
  for (int b = 0; b < batch; ++b) {
    resize_one(srcs[b], src_hw[2 * b], src_hw[2 * b + 1],
               dst + (size_t)b * dh * dw * 3, dh, dw);
  }
}

// ---------------------------------------------------------------------------
// GT label encoding (parity with data/encode.preprocess_true_boxes, which in
// turn matches reference utils.py:210-303):
//   - centers via floor((x1+x2)/2) (the reference's float floor-division);
//   - best of 9 origin-centred anchors by IoU; anchor // 3 selects the scale;
//   - grids store absolute-pixel xy/wh, conf 1, one-hot class (accumulating);
//   - later boxes overwrite earlier ones in the same (cell, anchor);
//   - out-of-range cells are clipped (reference would crash).
//
// boxes:  (bs, max_boxes, 5) f32 [x1,y1,x2,y2,cls]; zero rows are padding.
// anchors: (9, 2) f32. grids: 3 pointers to zeroed
// (bs, h/stride, w/stride, 3, 5+nc) f32. xywh_out: (bs, max_boxes, 4) f32.
// ---------------------------------------------------------------------------
void encode_labels_batch(const float* boxes, int bs, int max_boxes, int img_h,
                         int img_w, const float* anchors, int num_classes,
                         const int* strides, float* const* grids,
                         float* xywh_out) {
  const int nf = 5 + num_classes;
  int gh[3], gw[3];
  size_t gstride_b[3];
  for (int s = 0; s < 3; ++s) {
    gh[s] = img_h / strides[s];
    gw[s] = img_w / strides[s];
    gstride_b[s] = (size_t)gh[s] * gw[s] * 3 * nf;
  }
#pragma omp parallel for schedule(static)
  for (int b = 0; b < bs; ++b) {
    for (int m = 0; m < max_boxes; ++m) {
      const float* bx = boxes + ((size_t)b * max_boxes + m) * 5;
      const float cx = std::floor((bx[0] + bx[2]) * 0.5f);
      const float cy = std::floor((bx[1] + bx[3]) * 0.5f);
      const float w = bx[2] - bx[0];
      const float h = bx[3] - bx[1];
      float* xo = xywh_out + ((size_t)b * max_boxes + m) * 4;
      xo[0] = cx;
      xo[1] = cy;
      xo[2] = w;
      xo[3] = h;
      if (!(w > 0.0f)) continue;

      // Best anchor by IoU of origin-centred rectangles.
      int best = 0;
      float best_iou = -1.0f;
      for (int a = 0; a < 9; ++a) {
        const float aw = anchors[2 * a], ah = anchors[2 * a + 1];
        const float iw = std::max(
            0.0f, std::min(w * 0.5f, aw * 0.5f) - std::max(-w * 0.5f, -aw * 0.5f));
        const float ih = std::max(
            0.0f, std::min(h * 0.5f, ah * 0.5f) - std::max(-h * 0.5f, -ah * 0.5f));
        const float inter = iw * ih;
        const float iou = inter / (w * h + aw * ah - inter);
        if (iou > best_iou) {
          best_iou = iou;
          best = a;
        }
      }
      const int stage = best / 3;
      const int aidx = best % 3;
      // Cell index must match the numpy reference bit-for-bit: an f64
      // divide rounded to f32 (the reference stores into a float32 array),
      // then an f64 multiply before the floor.  Centers are integers, so
      // cx/img_w*grid == cx/stride hits exact integers for 1-in-stride
      // boxes — the rounding path decides which cell those land in.
      const float nx = (float)((double)cx / (double)img_w);
      const float ny = (float)((double)cy / (double)img_h);
      int col = (int)std::floor((double)nx * (double)gw[stage]);
      int row = (int)std::floor((double)ny * (double)gh[stage]);
      col = std::min(std::max(col, 0), gw[stage] - 1);
      row = std::min(std::max(row, 0), gh[stage] - 1);
      const int cls = (int)bx[4];

      float* cell = grids[stage] + (size_t)b * gstride_b[stage] +
                    (((size_t)row * gw[stage] + col) * 3 + aidx) * nf;
      cell[0] = cx;
      cell[1] = cy;
      cell[2] = w;
      cell[3] = h;
      cell[4] = 1.0f;
      if (cls >= 0 && cls < num_classes) cell[5 + cls] = 1.0f;
    }
  }
}

// ---------------------------------------------------------------------------
// Fused batch assembly: per-sample resize+normalise AND box rescale to the
// target size.  boxes are (max_boxes, 5) per sample, rescaled in place by
// (dw/sw, dh/sh) — matching reference utils.py:199-204 stretch semantics.
// ---------------------------------------------------------------------------
void assemble_batch(const uint8_t* const* srcs, const int* src_hw,
                    float* imgs_out, float* boxes_inout, int batch,
                    int max_boxes, int dh, int dw) {
#pragma omp parallel for schedule(dynamic)
  for (int b = 0; b < batch; ++b) {
    const int sh = src_hw[2 * b], sw = src_hw[2 * b + 1];
    resize_one(srcs[b], sh, sw, imgs_out + (size_t)b * dh * dw * 3, dh, dw);
    const float fx = (float)dw / (float)sw;
    const float fy = (float)dh / (float)sh;
    float* bx = boxes_inout + (size_t)b * max_boxes * 5;
    for (int m = 0; m < max_boxes; ++m) {
      bx[m * 5 + 0] *= fx;
      bx[m * 5 + 2] *= fx;
      bx[m * 5 + 1] *= fy;
      bx[m * 5 + 3] *= fy;
    }
  }
}

int yolodata_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
