// Native data-plane for the training pipeline: fused random-crop +
// dihedral augmentation + uint8->float32 [0,1] normalization on paired
// images, multi-threaded across a batch.
//
// The reference feeds its trainers through torch DataLoader workers doing
// PIL/np crops and 8 dihedral ops in Python (dataset/dataset_denoise.py:
// 59-71, utils/dataset_utils.py:5-30). Here the whole per-sample transform
// is one C++ pass over the pixels: exactly one read of the cropped region
// and one write per output element, for gt and noisy simultaneously so
// the pair stays aligned.
//
// C ABI (ctypes-friendly):
//   augment_pair_batch(
//     const uint8_t** gt_imgs, const uint8_t** noisy_imgs,
//     const int32_t* heights, const int32_t* widths, int32_t channels,
//     int32_t batch, int32_t ps,
//     const int32_t* rows, const int32_t* cols, const int32_t* ks,
//     float* gt_out, float* noisy_out, int32_t num_threads)
//
// rows/cols are crop origins, ks in [0,8) selects the dihedral op with
// the reference's indexing: 0 identity, 1..3 rot90*k, 4 flip-H (vertical
// flip of rows), 5..7 rot90*k then flip.

#include <cstdint>
#include <thread>
#include <vector>

namespace {

// map output coordinate (r, c) in the ps x ps patch to the source
// coordinate inside the crop for dihedral op k (inverse transform).
inline void src_coord(int k, int ps, int r, int c, int &sr, int &sc) {
  // forward ops (numpy semantics): rot90(m, k) then optional flipud.
  // We need the inverse map: out[r][c] = in[sr][sc].
  int rr = r, cc = c;
  if (k >= 4) {
    // output was flipped vertically last -> unflip first
    rr = ps - 1 - rr;
  }
  switch (k & 3) {
    case 0: sr = rr;           sc = cc;           break;
    // rot90 once (counter-clockwise, numpy): out[r][c] = in[c][ps-1-r]
    case 1: sr = cc;           sc = ps - 1 - rr;  break;
    case 2: sr = ps - 1 - rr;  sc = ps - 1 - cc;  break;
    case 3: sr = ps - 1 - cc;  sc = rr;           break;
  }
}

void process_one(const uint8_t *gt, const uint8_t *noisy, int H, int W,
                 int C, int ps, int row, int col, int k, float *gt_out,
                 float *noisy_out) {
  (void)H;
  const float inv = 1.0f / 255.0f;
  for (int r = 0; r < ps; ++r) {
    for (int c = 0; c < ps; ++c) {
      int sr, sc;
      src_coord(k, ps, r, c, sr, sc);
      const uint8_t *g = gt + (((int64_t)(row + sr) * W) + (col + sc)) * C;
      const uint8_t *n = noisy + (((int64_t)(row + sr) * W) + (col + sc)) * C;
      float *go = gt_out + (((int64_t)r * ps) + c) * C;
      float *no = noisy_out + (((int64_t)r * ps) + c) * C;
      for (int ch = 0; ch < C; ++ch) {
        go[ch] = g[ch] * inv;
        no[ch] = n[ch] * inv;
      }
    }
  }
}

}  // namespace

extern "C" {

void augment_pair_batch(const uint8_t **gt_imgs, const uint8_t **noisy_imgs,
                        const int32_t *heights, const int32_t *widths,
                        int32_t channels, int32_t batch, int32_t ps,
                        const int32_t *rows, const int32_t *cols,
                        const int32_t *ks, float *gt_out, float *noisy_out,
                        int32_t num_threads) {
  const int64_t sample = (int64_t)ps * ps * channels;
  auto work = [&](int begin, int end) {
    for (int i = begin; i < end; ++i) {
      process_one(gt_imgs[i], noisy_imgs[i], heights[i], widths[i], channels,
                  ps, rows[i], cols[i], ks[i], gt_out + i * sample,
                  noisy_out + i * sample);
    }
  };
  if (num_threads <= 1 || batch <= 1) {
    work(0, batch);
    return;
  }
  int nt = std::min<int32_t>(num_threads, batch);
  std::vector<std::thread> threads;
  int per = (batch + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int b = t * per, e = std::min<int>(batch, b + per);
    if (b >= e) break;
    threads.emplace_back(work, b, e);
  }
  for (auto &th : threads) th.join();
}

// single-pair convenience (used by tests)
void augment_pair(const uint8_t *gt, const uint8_t *noisy, int32_t H,
                  int32_t W, int32_t C, int32_t ps, int32_t row, int32_t col,
                  int32_t k, float *gt_out, float *noisy_out) {
  process_one(gt, noisy, H, W, C, ps, row, col, k, gt_out, noisy_out);
}

}  // extern "C"
