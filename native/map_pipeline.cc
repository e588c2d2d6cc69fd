// Fused semantic-map augmentation kernel (C++/OpenMP).
//
// The training pipeline's hot host path is the augmentation chain
// Pad(1.25x) -> RandomCrop -> RandomFlip -> RandomRotate over a
// (H, W, 14) float input and (H, W, 6) target (reference recipe,
// nav/pred_model_cfg.py:47-56).  cv2 needs per-channel calls above 4
// channels and materialises each intermediate; this kernel composes the
// whole chain into ONE inverse-mapped resampling pass per output pixel,
// parallelised over rows with OpenMP.
//
// Geometry matches the python pipeline exactly: the output pixel (y, x)
// is first inverse-rotated about the crop centre ((W-1)/2, (H-1)/2) —
// cv2.getRotationMatrix2D convention — then inverse-flipped, then offset
// by the crop origin into the padded frame; reads outside the original
// (unpadded) image return pad_val.  img uses bilinear taps, gt nearest
// (cv2.INTER_LINEAR / INTER_NEAREST respectively).
//
// Build: cc -O3 -fopenmp -shared -fPIC map_pipeline.cc -o libmap_pipeline.so
// Binding: ctypes (peanut_tpu/prediction/native.py).

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// img_in:  (in_h, in_w, c_img) float32 (unpadded original)
// gt_in:   (in_h, in_w, c_gt) float32
// outputs: (crop, crop, c) float32
// flip: 1 = horizontal flip (x -> crop-1-x in the crop frame)
// angle_deg: rotation angle (cv2 convention, counter-clockwise positive)
// crop_y/crop_x: crop origin in the padded frame
void augment_sample(const float* img_in, const float* gt_in,
                    int in_h, int in_w, int c_img, int c_gt,
                    int crop, int crop_y, int crop_x,
                    int flip, float angle_deg, float pad_val,
                    float* img_out, float* gt_out) {
  const double a = angle_deg * M_PI / 180.0;  // cv2-convention inverse map
  const double ca = std::cos(a), sa = std::sin(a);
  const double cx = (crop - 1) * 0.5, cy = (crop - 1) * 0.5;

#pragma omp parallel for schedule(static)
  for (int y = 0; y < crop; ++y) {
    for (int x = 0; x < crop; ++x) {
      // inverse rotate about the crop centre (crop-frame coordinates)
      double xr = ca * (x - cx) - sa * (y - cy) + cx;
      double yr = sa * (x - cx) + ca * (y - cy) + cy;
      // inverse flip (also in the crop frame)
      double xf = flip ? (crop - 1 - xr) : xr;

      float* img_px = img_out + ((size_t)y * crop + x) * c_img;
      float* gt_px = gt_out + ((size_t)y * crop + x) * c_gt;

      // a crop-frame tap is valid only inside the crop rectangle (the
      // python chain rotates the already-cropped image: out-of-crop reads
      // are border pad_val); valid taps then read the padded original,
      // where out-of-original reads are also pad_val (zero bottom/right pad)
      auto img_tap = [&](long cyy, long cxx) -> const float* {
        if (cyy < 0 || cyy >= crop || cxx < 0 || cxx >= crop) return nullptr;
        long syy = cyy + crop_y, sxx = cxx + crop_x;
        if (syy < 0 || syy >= in_h || sxx < 0 || sxx >= in_w) return nullptr;
        return img_in + ((size_t)syy * in_w + sxx) * c_img;
      };

      // nearest tap for gt
      long nx = std::lround(xf), ny = std::lround(yr);
      const float* gsrc = nullptr;
      if (ny >= 0 && ny < crop && nx >= 0 && nx < crop) {
        long syy = ny + crop_y, sxx = nx + crop_x;
        if (syy >= 0 && syy < in_h && sxx >= 0 && sxx < in_w)
          gsrc = gt_in + ((size_t)syy * in_w + sxx) * c_gt;
      }
      if (gsrc) std::memcpy(gt_px, gsrc, sizeof(float) * c_gt);
      else for (int ch = 0; ch < c_gt; ++ch) gt_px[ch] = pad_val;

      // bilinear taps for img
      double fx = std::floor(xf), fy = std::floor(yr);
      long x0 = (long)fx, y0 = (long)fy;
      double wx = xf - fx, wy = yr - fy;
      const double w00 = (1 - wy) * (1 - wx), w01 = (1 - wy) * wx;
      const double w10 = wy * (1 - wx), w11 = wy * wx;

      const float* p00 = img_tap(y0, x0);
      const float* p01 = img_tap(y0, x0 + 1);
      const float* p10 = img_tap(y0 + 1, x0);
      const float* p11 = img_tap(y0 + 1, x0 + 1);
      for (int ch = 0; ch < c_img; ++ch) {
        double v = w00 * (p00 ? p00[ch] : pad_val)
                 + w01 * (p01 ? p01[ch] : pad_val)
                 + w10 * (p10 ? p10[ch] : pad_val)
                 + w11 * (p11 ? p11[ch] : pad_val);
        img_px[ch] = (float)v;
      }
    }
  }
}

// Batched uint8 (T, C, H, W) -> one timestep's float32 HWC /255 plus the
// masked GT construction (LoadMapFromFile semantics,
// train_prediction_model.py:67-89): gt = final_map[goal_channels] masked to
// cells unexplored at timestep t.  One pass, OpenMP over rows.
void extract_timestep(const uint8_t* maps, int t_steps, int c, int h, int w,
                      int t_idx, int goal_lo, int goal_hi,
                      float* img_out /* (h, w, c) */,
                      float* gt_out /* (h, w, goal_hi-goal_lo) */) {
  const size_t plane = (size_t)h * w;
  const uint8_t* mt = maps + (size_t)t_idx * c * plane;
  const uint8_t* mlast = maps + (size_t)(t_steps - 1) * c * plane;
  const int n_goal = goal_hi - goal_lo;

#pragma omp parallel for schedule(static)
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const size_t px = (size_t)y * w + x;
      float* ip = img_out + px * c;
      for (int ch = 0; ch < c; ++ch)
        ip[ch] = mt[(size_t)ch * plane + px] * (1.0f / 255.0f);
      const bool explored = mt[plane + px] > 0;  // channel 1
      float* gp = gt_out + px * n_goal;
      for (int g = 0; g < n_goal; ++g)
        gp[g] = explored ? 0.0f
                         : (float)mlast[(size_t)(goal_lo + g) * plane + px];
    }
  }
}

}  // extern "C"
